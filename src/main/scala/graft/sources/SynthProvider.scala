package graft.sources

import java.util
import graft.functions.VectorExpressions
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 connector: a deterministic synthetic table
  * (`id`, `h` = fmix64(id), `mod16` = id % 16) generated on the
  * executors — the connector-API surface of the engine, exercising
  * the three pushdowns a 100 TB source must honor:
  *
  *  - COLUMN PRUNING (`SupportsPushDownRequiredColumns`): only
  *    requested columns are materialized per row;
  *  - FILTER PUSHDOWN (`SupportsPushDownFilters`): comparisons on
  *    `id`/`mod16` evaluate inside the reader — rows failing them are
  *    never materialized into InternalRows (fmix64 not even computed
  *    when `h` is filtered out of the projection);
  *  - PARTITION PRUNING: `id` bounds eliminate whole input
  *    partitions at planning time (an executor never sees them) —
  *    the v2 analog of parquet row-group/partition skipping.
  *
  * Deterministic by construction (no RNG), so the DuckDB oracle
  * replays the full table closed-form (HUGEINT fmix64).
  *
  * Usage:
  * {{{
  * spark.read.format("graft.sources.SynthProvider")
  *   .option("rows", "100000").option("slices", "8").load()
  * }}}
  */
class SynthProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SynthProvider.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SynthTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("slices", "4").toInt)
  override def supportsExternalMetadata(): Boolean = false
}

object SynthProvider {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("h", LongType, nullable = false),
    StructField("mod16", IntegerType, nullable = false)))

  /** Partitions planned by the most recent scan (test observability
    * for partition pruning; set on the driver at planning time).
    */
  @volatile var lastPlannedPartitions: Int = -1
}

private[sources] class SynthTable(rows: Long, slices: Int)
    extends Table with SupportsRead {
  override def name(): String = s"graft_synth($rows)"
  override def schema(): StructType = SynthProvider.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SynthScanBuilder(rows, slices)
}

private[sources] class SynthScanBuilder(rows: Long, slices: Int)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = SynthProvider.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // Accept ONLY what idBounds/accept actually apply — attribute name
    // AND literal type. Spark trusts an accepted pushdown and never
    // re-evaluates it, so a filter matched here by name but skipped by
    // the reader's value-typed pattern (e.g. `id = 5` arriving as an
    // Int literal) would silently return unfiltered rows. Anything
    // rejected is re-evaluated above the scan — always safe.
    val (accepted, rejected) = filters.partition {
      case EqualTo("id", _: java.lang.Long) => true
      case EqualTo("mod16", _: java.lang.Integer) => true
      case GreaterThan("id", _: java.lang.Long) => true
      case GreaterThanOrEqual("id", _: java.lang.Long) => true
      case LessThan("id", _: java.lang.Long) => true
      case LessThanOrEqual("id", _: java.lang.Long) => true
      case _ => false
    }
    pushed = accepted
    rejected // Spark re-evaluates these above the scan
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new SynthScan(rows, slices, pushed, required)
}

private[sources] class SynthScan(rows: Long, slices: Int,
    filters: Array[Filter], required: StructType) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_synth rows=$rows slices=$slices " +
      s"PushedFilters: [${filters.mkString(", ")}], " +
      s"ReadSchema: ${required.simpleString}"

  // id bounds implied by the pushed filters (partition-pruning range)
  private def idBounds: (Long, Long) = {
    var lo = 0L
    var hi = rows // exclusive
    filters.foreach {
      case GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v)
      case GreaterThan("id", v: Long) => lo = math.max(lo, v + 1)
      case LessThan("id", v: Long) => hi = math.min(hi, v)
      case LessThanOrEqual("id", v: Long) => hi = math.min(hi, v + 1)
      case EqualTo("id", v: Long) => lo = math.max(lo, v); hi = math.min(hi, v + 1)
      case _ =>
    }
    (lo, hi)
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val (lo, hi) = idBounds
    val per = math.max(rows / slices, 1L)
    val parts = (0 until slices).iterator.map { i =>
      val s = i * per
      val e = if (i == slices - 1) rows else math.min((i + 1) * per, rows)
      SynthPartition(math.max(s, lo), math.min(e, hi))
    }.filter(p => p.start < p.end).toArray[InputPartition]
    SynthProvider.lastPlannedPartitions = parts.length
    parts
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SynthReaderFactory(filters, required)
}

private[sources] case class SynthPartition(start: Long, end: Long)
    extends InputPartition

private[sources] class SynthReaderFactory(filters: Array[Filter],
    required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SynthPartition]
    new PartitionReader[InternalRow] {
      private var id = p.start - 1
      // ALL pushed mod16 equalities, not collectFirst: two
      // conflicting equalities (x = 3 AND x = 5) must yield zero
      // rows, not whichever one happened to be listed first.
      private val mod16Eqs: Array[Int] = filters.collect {
        case EqualTo("mod16", v: java.lang.Integer) => v.intValue()
      }
      // column indices requested (pruned projection)
      private val cols = required.fieldNames

      private def accept(i: Long): Boolean =
        mod16Eqs.forall(m => (i % 16).toInt == m)

      override def next(): Boolean = {
        id += 1
        while (id < p.end && !accept(id)) id += 1
        id < p.end
      }
      override def get(): InternalRow = {
        val values = cols.map {
          case "id" => java.lang.Long.valueOf(id)
          case "h" => java.lang.Long.valueOf(VectorExpressions.fmix64(id))
          case "mod16" => java.lang.Integer.valueOf((id % 16).toInt)
        }
        InternalRow.fromSeq(values.toIndexedSeq)
      }
      override def close(): Unit = ()
    }
  }
}
