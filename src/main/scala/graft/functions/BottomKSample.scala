package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types._

/** Deterministic bottom-k sample of a LONG key column.
  *
  * Keeps the k values whose fmix64 hash is smallest — a mergeable,
  * order-independent, DETERMINISTIC uniform sample (the same rows
  * are sampled on every run and on any cluster layout, unlike
  * rand()-based sampling). Buffer is at most k (hash, value) pairs;
  * merge is a k-way min-merge — shuffle cost O(k) per group
  * regardless of input size. Bottom-k sketches double as distinct
  * count estimators (k-th smallest hash ≈ k/|D| of the hash space).
  *
  * Output: array<bigint> of the sampled values, ordered by hash
  * (i.e. in "random" but reproducible order).
  */
case class BottomKSample(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeMap[java.lang.Long, java.lang.Long]] {

  type Buf = java.util.TreeMap[java.lang.Long, java.lang.Long]

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bottomk_sample"

  override def createAggregationBuffer(): Buf = new Buf()

  private def insert(buf: Buf, h: Long, v: Long): Unit = {
    if (!buf.containsKey(h)) {
      buf.put(h, v)
      if (buf.size() > k) buf.remove(buf.lastKey())
    }
  }

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      val l = v.asInstanceOf[Long]
      insert(buf, VectorExpressions.fmix64(l), l)
    }
    buf
  }

  override def merge(a: Buf, b: Buf): Buf = {
    val it = b.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      insert(a, e.getKey, e.getValue)
    }
    a
  }

  override def eval(buf: Buf): Any = {
    val out = new Array[Long](buf.size())
    val it = buf.values().iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size() * 16)
    bb.putInt(buf.size())
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.getKey); bb.putLong(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new Buf()
    var i = 0
    while (i < n) { buf.put(bb.getLong, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): BottomKSample =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BottomKSample =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BottomKSample =
    copy(child = c.head)
}

object BottomKSample {
  def bottomkSample(c: Column, k: Int): Column =
    GraftBridge.column(
      BottomKSample(GraftBridge.expression(c), k).toAggregateExpression())
}
