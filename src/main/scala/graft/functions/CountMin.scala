package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-min sketch: fixed-size frequency summary of a key column —
  * the third mergeable sketch next to [[HllSketch]] (distincts) and
  * [[TDigestQuantile]] (quantiles), completing the trio a 100 TB
  * profiling pass needs (how many / how distributed / how often).
  *
  * Buffer: `depth` rows of `width` long counters (d=4, w=8192 →
  * 256 KiB). update increments one counter per row; merge is
  * elementwise add, so partials combine map-side and shuffle traffic
  * per group is the sketch size regardless of row count. Estimates
  * (via [[CmsLookup]]) are min over rows — NEVER an undercount, and
  * over by at most ≈ e·N/width with probability 1 − e^−depth
  * (Cormode & Muthukrishnan 2005), the bound the
  * `cms_heavy_hitters` oracle checks.
  *
  * Hashing: the key folds to a 64-bit value exactly like
  * [[HllSketch]], then row i uses fmix64(keyHash + i·GOLDEN) —
  * deterministic, seedless, identical across partitionings.
  */
object CountMin {
  val Golden = -7046029254386353131L // 2^64 / golden ratio (odd)

  def keyHash(v: Any): Long = v match {
    case l: Long => VectorExpressions.fmix64(l)
    case i: Int => VectorExpressions.fmix64(i.toLong)
    case s: UTF8String =>
      val bytes = s.getBytes
      var h = 0L
      var i = 0
      while (i < bytes.length) { h = h * 31L + bytes(i); i += 1 }
      VectorExpressions.fmix64(h)
    case d: Double => VectorExpressions.fmix64(java.lang.Double.doubleToLongBits(d))
    case other => VectorExpressions.fmix64(other.hashCode().toLong)
  }

  def bucket(kh: Long, row: Int, width: Int): Int = {
    val h = VectorExpressions.fmix64(kh + row.toLong * Golden)
    // width is a power of two; mask keeps it branch-free
    (h & (width - 1L)).toInt
  }

  /** Column-API aggregate: serialized count-min sketch of `c`. */
  def countMinSketch(c: Column, depth: Int = 4, width: Int = 8192): Column =
    GraftBridge.column(
      CountMinAgg(GraftBridge.expression(c), depth, width).toAggregateExpression())

  /** Column-API scalar: estimated frequency of `key` in `sketch`. */
  def cmsEstimate(sketch: Column, key: Column): Column =
    GraftBridge.column(
      CmsLookup(GraftBridge.expression(sketch), GraftBridge.expression(key)))

  /** Column-API scalar: estimated INNER PRODUCT of two sketches —
    * Σ_k f_A(k)·f_B(k), i.e. the equi-join SIZE of the two sketched
    * key columns (Cormode & Muthukrishnan 2005 §4.2). Never an
    * undercount; over by ≤ e·N_A·N_B/width w.h.p. The estimator the
    * optimizer-support pass uses to size a join without running it.
    */
  def cmsInnerProduct(a: Column, b: Column): Column =
    GraftBridge.column(
      CmsInnerProduct(GraftBridge.expression(a), GraftBridge.expression(b)))
}

case class CountMinAgg(
    child: Expression,
    depth: Int = 4,
    width: Int = 8192,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(depth >= 1 && depth <= 16, "depth in [1, 16]")
  require(width >= 16 && (width & (width - 1)) == 0, "width must be a power of two")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "count_min"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val kh = CountMin.keyHash(v)
      var r = 0
      while (r < depth) {
        buf(r * width + CountMin.bucket(kh, r, width)) += 1L
        r += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  /** Serialized image: [depth: int][width: int][counters: long…]. */
  override def eval(buf: Array[Long]): Any = serialize(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + buf.length * 8)
    bb.putInt(depth)
    bb.putInt(width)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val d = bb.getInt
    val w = bb.getInt
    val out = new Array[Long](d * w)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong; i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(offset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CountMinAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): CountMinAgg =
    copy(child = c.head)
}

/** Point estimate from a serialized [[CountMinAgg]] sketch: min of
  * the key's `depth` counters. Evaluated per lookup row (the key
  * list — output-sized), not per corpus row, so CodegenFallback
  * costs nothing on the hot path.
  */
case class CmsLookup(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_lookup"

  override protected def nullSafeEval(sketchBytes: Any, key: Any): Any = {
    val bb = ByteBuffer.wrap(sketchBytes.asInstanceOf[Array[Byte]])
    val depth = bb.getInt
    val width = bb.getInt
    val kh = CountMin.keyHash(key)
    var est = Long.MaxValue
    var r = 0
    while (r < depth) {
      val idx = 8 + (r * width + CountMin.bucket(kh, r, width)) * 8
      val c = bb.getLong(idx)
      if (c < est) est = c
      r += 1
    }
    java.lang.Long.valueOf(est)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsLookup =
    copy(left = newLeft, right = newRight)
}

/** Join-size estimate from two serialized [[CountMinAgg]] sketches:
  * min over rows of the counter-wise dot product. Requires matching
  * (depth, width). Evaluated once per sketch pair (output-sized).
  * Counter products are exact in Long while N_A·N_B < 2⁶³ — at
  * larger scale widen the sketch or sample one side first.
  */
case class CmsInnerProduct(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_inner_product"

  override protected def nullSafeEval(aBytes: Any, bBytes: Any): Any = {
    val a = ByteBuffer.wrap(aBytes.asInstanceOf[Array[Byte]])
    val b = ByteBuffer.wrap(bBytes.asInstanceOf[Array[Byte]])
    val depth = a.getInt; val width = a.getInt
    val bd = b.getInt; val bw = b.getInt
    require(bd == depth && bw == width,
      s"sketch shapes differ: ($depth,$width) vs ($bd,$bw)")
    var est = Long.MaxValue
    var r = 0
    while (r < depth) {
      var s = 0L
      var w = 0
      while (w < width) {
        val idx = 8 + (r * width + w) * 8
        s += a.getLong(idx) * b.getLong(idx)
        w += 1
      }
      if (s < est) est = s
      r += 1
    }
    java.lang.Long.valueOf(est)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsInnerProduct =
    copy(left = newLeft, right = newRight)
}
