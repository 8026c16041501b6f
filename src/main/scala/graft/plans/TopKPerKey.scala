package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, AttributeReference, AttributeSet, Descending,
  Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.IntegerType

/** Top-k rows per key WITHOUT a full per-partition sort — the
  * whole-operator tier of the custom-operator ladder (logical node +
  * planner `SparkStrategy` + physical `SparkPlan`s).
  *
  * The declarative spelling, `row_number().over(partitionBy(keys)
  * .orderBy(...)) <= k`, plans a WindowExec: shuffle by key, then
  * SORT EVERY PARTITION COMPLETELY, then rank and discard all but k
  * rows — at 100 TB the sort of discarded rows dominates. This
  * operator keeps a bounded heap of k rows per key instead:
  *
  *   1. `TopKPerKeyPartialExec` — map-side, no distribution
  *      requirement: each input partition reduces to ≤ k rows per
  *      key it sees (the combiner — candidate volume entering the
  *      exchange drops from |rows| to ≤ k·|keys|·|partitions|).
  *   2. `TopKPerKeyFinalExec` — requires `ClusteredDistribution`
  *      (EnsureRequirements inserts the hash exchange): merges the
  *      partials per key and emits each key's k rows in order with a
  *      1-based integer rank appended — exactly the rows and rank
  *      `row_number` would produce (the ordering must be total per
  *      key, e.g. include a unique id tie-break, for the two
  *      spellings to agree bit-for-bit).
  *
  * Work: O(n log k) comparisons, O(k·|keys|) memory — vs the
  * window's O(n log n) sort and full-partition buffering.
  */
case class TopKPerKey(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan,
    rankAttr: Attribute = AttributeReference("rnk", IntegerType, nullable = false)())
  extends UnaryNode {
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** Plans [[TopKPerKey]] as partial-then-final bounded heaps. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case t: TopKPerKey =>
      TopKPerKeyFinalExec(t.keys, t.order, t.k, t.rankAttr,
        TopKPerKeyPartialExec(t.keys, t.order, t.k, planLater(t.child))) :: Nil
    case _ => Nil
  }
}

/** Shared bounded-heap pass: reduce an iterator to ≤ k rows per key.
  * Returns (key unsafe row → rows kept), rows defensively copied.
  */
private[plans] object TopKHeap {
  val MaxKeysConf = "spark.graft.topk.maxKeysPerPartition"
  val MaxKeysDefault = 4000000

  def accumulate(
      iter: Iterator[InternalRow],
      keyProj: UnsafeProjection,
      ordering: Ordering[InternalRow],
      k: Int,
      maxKeys: Int): scala.collection.mutable.HashMap[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]] = {
    val heaps = scala.collection.mutable.HashMap
      .empty[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]
    while (iter.hasNext) {
      val row = iter.next()
      val key = keyProj(row)
      heaps.get(key) match {
        case None =>
          if (heaps.size >= maxKeys) {
            throw new IllegalStateException(
              s"TopKPerKey: more than $maxKeys distinct keys in one partition " +
                s"(heap memory is O(k*|keys-per-partition|), unspillable). " +
                s"Raise $MaxKeysConf, pre-aggregate the key space, or use the " +
                "row_number window spelling, which sorts but spills.")
          }
          val h = scala.collection.mutable.PriorityQueue.empty[InternalRow](ordering)
          h += row.copy()
          heaps.put(key.copy(), h)
        case Some(h) =>
          if (h.size < k) h += row.copy()
          else if (ordering.compare(row, h.head) < 0) { // beats the worst kept
            h.dequeue()
            h += row.copy()
          }
      }
    }
    heaps
  }
}

/** Map-side combiner: ≤ k rows per key per input partition, no rank
  * yet (ranks are only meaningful after the per-key merge).
  */
case class TopKPerKeyPartialExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan)
  extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output

  // Rows never move: per-partition reduction in place.
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    val childOutput = child.output
    val maxKeys = conf.getConfString(
      TopKHeap.MaxKeysConf, TopKHeap.MaxKeysDefault.toString).toInt
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ordering: Ordering[InternalRow] =
        new LazilyGeneratedOrdering(sortOrder, childOutput)
      TopKHeap.accumulate(iter, keyProj, ordering, limit, maxKeys)
        .valuesIterator.flatMap(_.iterator)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyPartialExec =
    copy(child = newChild)
}

/** Per-key merge + ordered emission with 1-based rank. Requires the
  * child clustered by the keys; EnsureRequirements inserts the
  * exchange (which now carries ≤ k·|keys| rows per upstream
  * partition, not the raw input).
  */
case class TopKPerKeyFinalExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: SparkPlan)
  extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr

  override def requiredChildDistribution: Seq[Distribution] =
    if (keys.isEmpty) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  // In-place per-partition merge: the key-clustered exchange below
  // survives this node, so a downstream groupBy on (a superset of)
  // the keys reuses it instead of planning a second shuffle.
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    val childOutput = child.output
    val outSchema = output
    val maxKeys = conf.getConfString(
      TopKHeap.MaxKeysConf, TopKHeap.MaxKeysDefault.toString).toInt
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ordering: Ordering[InternalRow] =
        new LazilyGeneratedOrdering(sortOrder, childOutput)
      val outProj = UnsafeProjection.create(
        childOutput :+ rankAttr, childOutput :+ rankAttr)
      val rankRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
      val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
      TopKHeap.accumulate(iter, keyProj, ordering, limit, maxKeys)
        .valuesIterator.flatMap { heap =>
          // dequeueAll yields worst-first; reverse for rank order
          val sorted = heap.dequeueAll.reverseIterator
          var rank = 0
          sorted.map { row =>
            rank += 1
            rankRow.update(0, rank)
            outProj(joined(row, rankRow)).copy()
          }
        }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyFinalExec =
    copy(child = newChild)
}

/** Column-level API + strategy registration. */
object TopK {

  /** Per-partition distinct-key ceiling for the bounded heaps (see
    * the memory contract on [[perKey]]).
    */
  val MaxKeysConf: String = TopKHeap.MaxKeysConf

  def enable(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy

  def disable(spark: SparkSession): Unit =
    spark.experimental.extraStrategies =
      spark.experimental.extraStrategies.filterNot(_ == TopKStrategy)

  /** Top `k` rows of `df` per `keyCols`, ordered by `orderCols`
    * (which should be a TOTAL order per key — include a unique
    * tie-break column — to make the result deterministic and equal
    * to the `row_number` spelling). Appends an IntegerType rank
    * column `rnk` (1-based).
    *
    * MEMORY CONTRACT: each task holds k rows per DISTINCT KEY it
    * sees, on-heap, with no spill — O(k·|keys-per-partition|). Right
    * for low-cardinality keys (languages, strata, query ids) where
    * WindowExec would instead sort the whole table in |keys| tasks;
    * wrong for wide key spaces (per-document, per-user), where the
    * window spelling spills and this would OOM. A guard throws past
    * `spark.graft.topk.maxKeysPerPartition` distinct keys per
    * partition (default 4e6) rather than dying on the heap.
    */
  def perKey(df: DataFrame, keyCols: Seq[String], orderCols: Seq[(String, Boolean)],
      k: Int): DataFrame = {
    val spark = df.sparkSession
    enable(spark)
    val plan = GraftBridge.analyzed(df)
    def attr(name: String): Attribute = plan.output
      .find(a => spark.sessionState.conf.resolver(a.name, name))
      .getOrElse(throw new IllegalArgumentException(
        s"column $name not in ${plan.output.map(_.name).mkString(", ")}"))
    val keys = keyCols.map(attr)
    val order = orderCols.map { case (name, asc) =>
      SortOrder(attr(name), if (asc) Ascending else Descending)
    }
    GraftBridge.ofRows(spark, TopKPerKey(keys, order, k, plan))
  }
}
