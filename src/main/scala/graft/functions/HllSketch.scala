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

  override def eval(buf: Array[Byte]): Any =
    java.lang.Long.valueOf(HllSketch.estimateRegisters(buf))

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(offset: Int): HllSketch =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HllSketch =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): HllSketch =
    copy(child = c.head)
}

/** The SKETCH-AS-A-COLUMN half of the HLL surface: emit the register
  * buffer itself (BinaryType) so sketches can be MATERIALIZED at a
  * fine grain (per day/partition) and rolled up later without
  * rescanning the fact data — the Druid/BigQuery `HLL_COUNT.INIT` /
  * `MERGE` pattern. At 100 TB this is the difference between one scan
  * per reporting grain and one scan total: day-level sketches are
  * 4 KiB rows; every coarser grain is an agg over those rows.
  */
case class HllSketchBin(
    child: Expression,
    p: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  private val inner = HllSketch(child, p)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "hll_sketch_bin"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](1 << p)
  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] =
    inner.update(buf, input)
  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = inner.merge(a, b)
  override def eval(buf: Array[Byte]): Any = buf.clone()
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(offset: Int): HllSketchBin =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HllSketchBin =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): HllSketchBin =
    copy(child = c.head)
}

/** Union of materialized HLL register buffers (elementwise max) →
  * distinct estimate. Register union IS the sketch of the union, so
  * `HllUnionEstimate(day_sketches)` is bit-identical to running
  * [[HllSketch]] directly over the union of the days' raw data —
  * a property the `hll_union_rollup` oracle gates exactly.
  */
case class HllUnionEstimate(
    child: Expression,
    p: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  private val m: Int = 1 << p

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "hll_union_estimate"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    child.eval(input) match {
      case null => buf
      case regs: Array[Byte] =>
        require(regs.length == m,
          s"hll_union_estimate: sketch has ${regs.length} registers, expected $m (mismatched p)")
        merge(buf, regs)
      case other =>
        throw new IllegalArgumentException(
          s"hll_union_estimate requires a binary sketch column, got ${other.getClass}")
    }
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any =
    java.lang.Long.valueOf(HllSketch.estimateRegisters(buf))

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(offset: Int): HllUnionEstimate =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HllUnionEstimate =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): HllUnionEstimate =
    copy(child = c.head)
}

object HllSketch {
  /** Standard HLL estimator with the linear-counting small-range
    * correction, over a register buffer. Deterministic in the
    * register contents — shared by the direct aggregate and the
    * union-of-sketches aggregate so `direct == merged` exactly.
    */
  def estimateRegisters(buf: Array[Byte]): Long = {
    val m = buf.length
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
    math.round(e)
  }

  /** Column-API aggregate: estimated distinct count of `c`. */
  def hllDistinct(c: Column, p: Int = 12): Column =
    GraftBridge.column(
      HllSketch(GraftBridge.expression(c), p).toAggregateExpression())

  /** Column-API aggregate: the register buffer itself (materialize
    * per-grain sketches for later rollup).
    */
  def hllSketchBin(c: Column, p: Int = 12): Column =
    GraftBridge.column(
      HllSketchBin(GraftBridge.expression(c), p).toAggregateExpression())

  /** Column-API aggregate: union materialized sketches → estimate. */
  def hllUnionEstimate(c: Column, p: Int = 12): Column =
    GraftBridge.column(
      HllUnionEstimate(GraftBridge.expression(c), p).toAggregateExpression())

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hll_distinct", exprs => HllSketch(exprs.head).toAggregateExpression(), "built-in")
}
