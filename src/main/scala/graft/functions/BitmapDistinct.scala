package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types._

/** EXACT distinct counting over a bounded dense integer domain via a
  * fixed-size bitset aggregate — the Druid/ClickHouse bitmap-index
  * trick re-expressed as a mergeable Spark aggregate.
  *
  * Where `count(DISTINCT x)` plans an Expand + full re-shuffle of the
  * distinct values (every distinct value crosses the wire), the bitmap
  * buffer is `numBits/8` bytes per group REGARDLESS of cardinality,
  * partials combine map-side, and merge is a word-wise OR — at 100 TB
  * the exchange carries one fixed-size buffer per (group, task), same
  * contract as the HLL sketch but EXACT. The price is the domain
  * contract: values must be dense integers in `[0, numBits)`; ids
  * outside the domain fail LOUDLY (silent masking would undercount),
  * which is the right behavior for surrogate-keyed users/items where
  * the domain is known at plan time.
  *
  * 2^24 bits = 2 MiB covers 16.7M keys; for sparse/unbounded domains
  * use [[HllSketch]] (approximate) or plain distinct instead.
  */
case class BitmapDistinct(
    child: Expression,
    numBits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(numBits > 0 && numBits % 64 == 0, "numBits must be a positive multiple of 64")

  private val words: Int = numBits / 64

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "bitmap_distinct"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](words)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val id = v match {
        case l: Long => l
        case i: Int => i.toLong
        case other =>
          throw new IllegalArgumentException(
            s"bitmap_distinct requires an integer column, got ${other.getClass}")
      }
      if (id < 0 || id >= numBits)
        throw new IllegalArgumentException(
          s"bitmap_distinct domain violation: id $id outside [0, $numBits) — " +
            "widen numBits or use hll_distinct for unbounded domains")
      buf((id >>> 6).toInt) |= 1L << (id & 63)
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < words) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    var n = 0L
    var i = 0
    while (i < words) { n += java.lang.Long.bitCount(buf(i)); i += 1 }
    java.lang.Long.valueOf(n)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(words * 8).order(ByteOrder.LITTLE_ENDIAN)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](words)
    ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(offset: Int): BitmapDistinct =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BitmapDistinct =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BitmapDistinct =
    copy(child = c.head)
}

object BitmapDistinct {
  /** Column-API aggregate: EXACT distinct count of dense integer ids
    * in `[0, numBits)`.
    */
  def bitmapDistinct(c: Column, numBits: Int): Column =
    GraftBridge.column(
      BitmapDistinct(GraftBridge.expression(c), numBits).toAggregateExpression())

  /** Register `bitmap_distinct` for spark.sql use — delegates to the
    * central GraftFunctions builder so arity/literal validation is
    * identical on every registration path.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    GraftFunctions.injections
      .filter { case (id, _, _) => id.funcName == "bitmap_distinct" }
      .foreach { case (id, _, builder) =>
        spark.sessionState.functionRegistry
          .createOrReplaceTempFunction(id.funcName, builder, "built-in") }
}
