package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types._

/** Bloom filter as a mergeable aggregate + a CODEGEN membership
  * probe — the runtime-filter (semi-join pushdown) primitive: build
  * the filter over a selective dimension's join keys (one small agg),
  * broadcast the single row, and drop fact rows BEFORE the join
  * exchange. At 100 TB the shuffle is the join's dominant cost, so a
  * 1% false-positive filter at ~10 bits/key turns a 5×-selective
  * dim filter into a ~5× smaller fact shuffle for ~1 MiB of
  * broadcast. False positives are removed by the exact join that
  * follows; false negatives cannot happen, so the rewrite is
  * result-identical (`bloom_pruned_join` pins it against the plain
  * join oracle).
  *
  * Layout: [numHashes: int][bit array: long…]; bit count is a power
  * of two. Hashing: double hashing from the same seedless fmix64
  * family as [[CountMin]]/[[HllSketch]] — position_i =
  * (h1 + i·h2) & (bits − 1). Unlike [[CmsLookup]] (output-sized
  * lookups), the probe runs per FACT row, so [[BloomMightContain]]
  * implements `doGenCode` and stays inside whole-stage codegen.
  */
object BloomFilter {
  val Golden: Long = CountMin.Golden

  /** Mergeable aggregate: serialized bloom filter of `c`'s values
    * (`numBits` must be a power of two; default 2^20 bits = 128 KiB,
    * ~1% fpp at 10^5 keys with 7 hashes).
    */
  def bloomAgg(c: Column, numBits: Int = 1 << 20, numHashes: Int = 7): Column =
    GraftBridge.column(
      BloomAgg(GraftBridge.expression(c), numBits, numHashes).toAggregateExpression())

  /** Membership probe (codegen): true if `key` may be in the filter,
    * false only if it is DEFINITELY absent.
    */
  def mightContain(bloom: Column, key: Column): Column =
    GraftBridge.column(
      BloomMightContain(GraftBridge.expression(bloom), GraftBridge.expression(key)))

  /** Prune `fact` to rows whose `factKey` MAY appear among `dim`'s
    * `dimKey` values (never dropping a true match) — the runtime-
    * filter pattern end to end.
    *
    * The filter image is materialized on the driver ONCE and probed
    * as a LITERAL. That one value is O(numBits) — data-size
    * independent — the same contract as Spark's own runtime subquery
    * filters (DPP / InSubqueryExec): a bounded summary crosses the
    * driver, never data-scale rows. Do NOT spell this as
    * `fact.join(broadcast(bloomDf))` + filter: that copies the image
    * into EVERY fact row's buffer (measured 35× slower at 600k rows
    * — tens of GB of memcpy).
    */
  def pruned(fact: org.apache.spark.sql.DataFrame, factKey: String,
      dim: org.apache.spark.sql.DataFrame, dimKey: String,
      numBits: Int = 1 << 20, numHashes: Int = 7): org.apache.spark.sql.DataFrame = {
    val image = dim.select(org.apache.spark.sql.functions.col(dimKey))
      .agg(bloomAgg(org.apache.spark.sql.functions.col(dimKey), numBits, numHashes))
      .head().getAs[Array[Byte]](0)
    fact.filter(mightContain(
      org.apache.spark.sql.functions.lit(image),
      org.apache.spark.sql.functions.col(factKey)))
  }

  /** Probe body, also called from generated Java (static forwarder). */
  def mightContainBytes(bf: Array[Byte], key: Long): Boolean = {
    val numHashes = ((bf(0) & 0xff) << 24) | ((bf(1) & 0xff) << 16) |
      ((bf(2) & 0xff) << 8) | (bf(3) & 0xff)
    val bits = (bf.length - 4).toLong * 8L
    val mask = bits - 1L
    val h1 = VectorExpressions.fmix64(key)
    val h2 = VectorExpressions.fmix64(key + Golden) | 1L
    var i = 0
    while (i < numHashes) {
      val pos = (h1 + i.toLong * h2) & mask
      // the bit array is long[] serialized BIG-endian: byte 0 of each
      // 8-byte group holds bits 63-56 of that long
      val longIdx = (pos >>> 6).toInt
      val byteInLong = 7 - (((pos & 63L) >>> 3)).toInt
      val b = bf(4 + (longIdx << 3) + byteInLong)
      if (((b >>> (pos & 7L).toInt) & 1) == 0) return false
      i += 1
    }
    true
  }

  private[functions] def setBit(buf: Array[Long], pos: Long): Unit =
    buf((pos >>> 6).toInt) |= (1L << (pos & 63L).toInt)
}

case class BloomAgg(
    child: Expression,
    numBits: Int = 1 << 20,
    numHashes: Int = 7,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(numBits >= 64 && (numBits & (numBits - 1)) == 0,
    "numBits must be a power of two >= 64")
  require(numHashes >= 1 && numHashes <= 16, "numHashes in [1, 16]")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bloom_filter"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      // integral keys enter the double-hash family raw — the same
      // value the probe side passes to mightContainBytes; other
      // types fold through keyHash first (a probe on those would
      // have to fold identically).
      val raw = v match {
        case l: Long => l
        case i: Int => i.toLong
        case other => CountMin.keyHash(other)
      }
      val h1 = VectorExpressions.fmix64(raw)
      val h2 = VectorExpressions.fmix64(raw + BloomFilter.Golden) | 1L
      val mask = numBits.toLong - 1L
      var i = 0
      while (i < numHashes) {
        BloomFilter.setBit(buf, (h1 + i.toLong * h2) & mask)
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = serialize(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.length * 8)
    bb.putInt(numHashes)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    bb.getInt // numHashes — fixed by the operator instance
    val out = new Array[Long]((bytes.length - 4) / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong; i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(offset: Int): BloomAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BloomAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BloomAgg =
    copy(child = c.head)
}

/** Per-fact-row membership probe — participates in whole-stage
  * codegen (the pruning filter sits on the corpus-sized scan).
  * Key must be an integral column.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == BinaryType &&
        (right.dataType == LongType || right.dataType == IntegerType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs (binary, integral), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  override protected def nullSafeEval(bf: Any, key: Any): Any = {
    val k = key match {
      case l: Long => l
      case i: Int => i.toLong
    }
    BloomFilter.mightContainBytes(bf.asInstanceOf[Array[Byte]], k)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (bf, key) => {
      s"${ev.value} = graft.functions.BloomFilter.mightContainBytes($bf, (long) $key);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}
