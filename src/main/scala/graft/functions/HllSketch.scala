package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HyperLogLog distinct-count sketch as a native
  * TypedImperativeAggregate.
  *
  * The mergeable-sketch shape every 100 TB pipeline needs: the
  * buffer is 2^p one-byte registers, partial aggregation happens
  * map-side, merge is an elementwise max — shuffle traffic per
  * group is 4 KiB (p=12) regardless of cardinality. Standard HLL
  * estimator with linear-counting small-range correction; ~1.04/√m
  * relative error (≈1.6% at p=12).
  *
  * (Spark ships approx_count_distinct (HLL++); this is the
  * from-scratch sketch path, also a template for other mergeable
  * sketches — the buffer/update/merge/eval contract is identical.)
  */
case class HllSketch(
    child: Expression,
    p: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  private val m: Int = 1 << p

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "hll_distinct"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  private def hashValue(v: Any): Long = v match {
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

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = hashValue(v)
      val idx = (h >>> (64 - p)).toInt
      val rest = h << p
      val rank = (if (rest == 0L) 64 - p else java.lang.Long.numberOfLeadingZeros(rest)) + 1
      if (rank > buf(idx)) buf(idx) = rank.toByte
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any = {
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      sum += java.lang.Math.pow(2.0, -buf(i).toDouble)
      if (buf(i) == 0) zeros += 1
      i += 1
    }
    var e = alpha * m * m / sum
    if (e <= 2.5 * m && zeros > 0) e = m * math.log(m.toDouble / zeros)
    java.lang.Long.valueOf(math.round(e))
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(offset: Int): HllSketch =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HllSketch =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): HllSketch =
    copy(child = c.head)
}

object HllSketch {
  /** Column-API aggregate: estimated distinct count of `c`. */
  def hllDistinct(c: Column, p: Int = 12): Column =
    GraftBridge.column(
      HllSketch(GraftBridge.expression(c), p).toAggregateExpression())

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hll_distinct", exprs => HllSketch(exprs.head).toAggregateExpression(), "built-in")
}
