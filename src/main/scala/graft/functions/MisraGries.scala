package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.{GraftBridge, GraftExpectsTypes}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries / SpaceSaving frequent-items summary — the fourth
  * mergeable sketch next to [[HllSketch]] (how many distinct),
  * [[TDigestQuantile]] (how distributed) and [[CountMin]] (how often
  * is THIS key): "which keys dominate", the question a 100 TB
  * profiling pass asks before choosing a broadcast/salt/skew-join
  * strategy, and the one the other three can only answer with a
  * second pass over a key list.
  *
  * State is at most `2·capacity` (item, count) entries per group —
  * bounded regardless of key cardinality, so partials combine
  * map-side and shuffle traffic per group is the sketch size, never
  * the corpus's distinct-key count. Prune (batched at 2m for O(1)
  * amortized update) subtracts the (m+1)-th largest count from every
  * entry and drops the non-positive ones — exactly the merge
  * operation of Agarwal et al., "Mergeable Summaries" (PODS 2012),
  * so the classic guarantees hold under ANY prune/merge schedule,
  * which is what makes the oracle gates below deterministic even
  * though Spark's partial-merge order is not:
  *
  *  - never an overcount: est(x) ≤ true(x);
  *  - undercount ≤ Σ pruned s_i ≤ N/(m+1) (each prune removes ≥
  *    (m+1)·s mass and total mass is N);
  *  - hence any key with true(x) > N/(m+1) is guaranteed tracked.
  *
  * With capacity ≥ the stream's distinct-key count no prune ever
  * fires and the summary IS the exact count table (the bit-exact
  * oracle regime of `mg_heavy_hitters`); the eviction regime is
  * gated by the same query's m=16 sketch bounds and pinned
  * adversarially in MisraGriesSpec.
  *
  * Capability parallel: the reference's per-key running state
  * (TripAggregatorApplication.kt keyed aggregates) assumes keys fit
  * state; this is the bounded-memory answer when they don't.
  */
object MisraGries {

  /** Column-API aggregate: frequent-items summary of string column
    * `c`, returned as `array<struct<item string, cnt long>>` sorted
    * by (cnt desc, item) — directly explodable, no lookup expression
    * needed.
    */
  def sketch(c: Column, capacity: Int): Column =
    GraftBridge.column(
      MisraGriesAgg(GraftBridge.expression(c), capacity).toAggregateExpression())
}

case class MisraGriesAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with GraftExpectsTypes {

  require(capacity >= 1 && capacity <= (1 << 20), "capacity in [1, 2^20]")

  // STRING by declaration: the interpreted update casts to
  // UTF8String; without this a long key column would CCE there while
  // an implicit cast path behaved — same divergence class Fmix64 had.
  override def expectedTypes: Seq[DataType] = Seq(StringType)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "mg_sketch"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  /** Subtract the (capacity+1)-th largest count from every entry and
    * drop the non-positive ones — the Mergeable-Summaries prune. At
    * most `capacity` entries survive (only counts strictly above the
    * threshold do). No-op while the map still fits.
    */
  private def prune(buf: mutable.HashMap[String, Long]): Unit =
    if (buf.size > capacity) {
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val s = counts(counts.length - (capacity + 1)) // (m+1)-th largest
      buf.filterInPlace((_, c) => c > s)
      buf.mapValuesInPlace((_, c) => c - s)
    }

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String].toString
      buf.updateWith(key) { c => Some(c.getOrElse(0L) + 1L) }
      // batch the O(m log m) prune: ≥ capacity fresh inserts between
      // prunes → O(1) amortized per row even on all-distinct streams
      if (buf.size > 2 * capacity) prune(buf)
    }
    buf
  }

  override def merge(a: mutable.HashMap[String, Long],
      b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (k, c) =>
      a.updateWith(k) { old => Some(old.getOrElse(0L) + c) }
    }
    if (a.size > 2 * capacity) prune(a)
    a
  }

  /** Final value: prune to ≤ capacity entries, emit sorted by
    * (cnt desc, item) so the array order is a pure function of the
    * summary's content.
    */
  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    prune(buf)
    val entries = buf.toArray.sortBy { case (k, c) => (-c, k) }
    new GenericArrayData(entries.map { case (k, c) =>
      InternalRow(UTF8String.fromString(k), c): Any
    })
  }

  /** [capacity: int][n: int] then per entry [len: int][utf8 bytes][cnt: long]. */
  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val items = buf.toArray
    val byteArrays = items.map(_._1.getBytes(StandardCharsets.UTF_8))
    val size = 8 + byteArrays.map(_.length + 12).sum
    val bb = ByteBuffer.allocate(size)
    bb.putInt(capacity)
    bb.putInt(items.length)
    var i = 0
    while (i < items.length) {
      bb.putInt(byteArrays(i).length)
      bb.put(byteArrays(i))
      bb.putLong(items(i)._2)
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    bb.getInt // capacity (carried for self-description)
    val n = bb.getInt
    val out = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val strBytes = new Array[Byte](len)
      bb.get(strBytes)
      out.put(new String(strBytes, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    out
  }

  override def withNewMutableAggBufferOffset(offset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = c.head)
}
