package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types._

import scala.collection.mutable.ArrayBuffer

/** Mutable t-digest state: centroids (mean, weight) plus an unmerged
  * tail that is folded in by `compress()`.
  */
final class TDigestBuffer(val compression: Int) {
  val centroids: ArrayBuffer[(Double, Long)] = ArrayBuffer.empty
  var dirty: Boolean = false

  def add(mean: Double, weight: Long): Unit = {
    centroids += ((mean, weight))
    dirty = true
    if (centroids.length > compression * 8) compress()
  }

  /** Dunning's merging compression: sort by mean, then greedily merge
    * neighbors while the merged centroid's weight stays under the
    * k1-style size bound 4·W·q(1−q)/δ — tight centroids at the tails
    * (q→0, q→1), coarse in the middle, which is what gives t-digest
    * its accurate extreme quantiles.
    */
  def compress(): Unit = {
    if (!dirty || centroids.length <= 1) { dirty = false; return }
    val sorted = centroids.sortBy(_._1)
    val totalW = sorted.iterator.map(_._2).sum.toDouble
    centroids.clear()
    var curMean = sorted.head._1
    var curW = sorted.head._2
    var cumW = 0.0 // weight fully to the left of the current centroid
    var i = 1
    while (i < sorted.length) {
      val (m, w) = sorted(i)
      val q = (cumW + (curW + w) / 2.0) / totalW
      val limit = math.max(1.0, 4.0 * totalW * q * (1.0 - q) / compression)
      if (curW + w <= limit) {
        curMean = (curMean * curW + m * w) / (curW + w)
        curW += w
      } else {
        centroids += ((curMean, curW))
        cumW += curW
        curMean = m
        curW = w
      }
      i += 1
    }
    centroids += ((curMean, curW))
    dirty = false
  }

  /** Interpolated quantile over centroid midpoints. */
  def quantile(q: Double): Double = {
    compress()
    if (centroids.isEmpty) return Double.NaN
    if (centroids.length == 1) return centroids.head._1
    val totalW = centroids.iterator.map(_._2).sum.toDouble
    val target = q * totalW
    var cum = 0.0
    var prevMid = 0.0
    var prevMean = centroids.head._1
    var i = 0
    while (i < centroids.length) {
      val (m, w) = centroids(i)
      val mid = cum + w / 2.0
      if (target <= mid) {
        if (i == 0) return m
        val frac = (target - prevMid) / (mid - prevMid)
        return prevMean + frac * (m - prevMean)
      }
      cum += w
      prevMid = mid
      prevMean = m
      i += 1
    }
    centroids.last._1
  }

  def serialize(): Array[Byte] = {
    compress()
    val bb = ByteBuffer.allocate(8 + centroids.length * 16)
    bb.putInt(compression)
    bb.putInt(centroids.length)
    centroids.foreach { case (m, w) => bb.putDouble(m); bb.putLong(w) }
    bb.array()
  }
}

object TDigestBuffer {
  def deserialize(bytes: Array[Byte]): TDigestBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TDigestBuffer(bb.getInt)
    val n = bb.getInt
    var i = 0
    while (i < n) { buf.centroids += ((bb.getDouble, bb.getLong)); i += 1 }
    buf
  }
}

/** t-digest quantile sketch as a native TypedImperativeAggregate —
  * the second mergeable sketch next to [[HllSketch]] (same
  * buffer/update/merge/eval contract). Shuffle traffic per group is
  * ≤ compression·16 bytes regardless of row count; partials combine
  * map-side; relative error scales with q(1−q)/δ, so p99/p999 stay
  * tight at δ=100 — the quantile counterpart of the HLL shape a
  * 100 TB pipeline needs (exact percentiles are a full sort).
  */
case class TDigestQuantile(
    child: Expression,
    q: Double,
    compression: Int = 100,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigestBuffer] {

  require(q >= 0.0 && q <= 1.0, "quantile must be in [0, 1]")

  override def children: Seq[Expression] = Seq(child)
  // A group with no non-null input yields NULL (not NaN), matching
  // percentile / percentile_approx semantics.
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "tdigest_quantile"

  override def createAggregationBuffer(): TDigestBuffer =
    new TDigestBuffer(compression)

  override def update(buf: TDigestBuffer, input: InternalRow): TDigestBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val d = v match {
        case d: Double => d
        case f: Float => f.toDouble
        case l: Long => l.toDouble
        case i: Int => i.toDouble
        case n: Number => n.doubleValue()
        case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
        case _ => return buf
      }
      buf.add(d, 1L)
    }
    buf
  }

  override def merge(a: TDigestBuffer, b: TDigestBuffer): TDigestBuffer = {
    b.compress()
    b.centroids.foreach { case (m, w) => a.add(m, w) }
    a
  }

  override def eval(buf: TDigestBuffer): Any = {
    buf.compress()
    if (buf.centroids.isEmpty) null else buf.quantile(q)
  }

  override def serialize(buf: TDigestBuffer): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): TDigestBuffer =
    TDigestBuffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): TDigestQuantile =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TDigestQuantile =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TDigestQuantile =
    copy(child = c.head)
}

object TDigest {
  /** Column-API aggregate: approximate q-quantile of `c`. */
  def tdigestQuantile(c: Column, q: Double, compression: Int = 100): Column =
    GraftBridge.column(
      TDigestQuantile(GraftBridge.expression(c), q, compression).toAggregateExpression())

  /** SQL: tdigest_quantile(col, q) with q a foldable double literal. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "tdigest_quantile",
      exprs => TDigestQuantile(
        exprs.head,
        exprs(1).eval(null) match {
          case d: Double => d
          case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
          case other => other.toString.toDouble
        }).toAggregateExpression(),
      "built-in")
}
