package graft.sources

import java.util
import graft.functions.VectorExpressions
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsTriggerAvailableNow}
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
      properties.getOrDefault("slices", "4").toInt,
      properties.getOrDefault("maxRowsPerBatch", "0").toLong)
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

private[sources] class SynthTable(rows: Long, slices: Int,
    maxRowsPerBatch: Long) extends Table with SupportsRead {
  override def name(): String = s"graft_synth($rows)"
  override def schema(): StructType = SynthProvider.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SynthScanBuilder(rows, slices, maxRowsPerBatch)
}

private[sources] class SynthScanBuilder(rows: Long, slices: Int,
    maxRowsPerBatch: Long = 0L)
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
  override def build(): Scan =
    new SynthScan(rows, slices, pushed, required, maxRowsPerBatch)
}

private[sources] class SynthScan(rows: Long, slices: Int,
    filters: Array[Filter], required: StructType,
    maxRowsPerBatch: Long = 0L) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new SynthMicroBatchStream(rows, slices, filters, required, maxRowsPerBatch)
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

/** Stream offset = number of ids emitted so far (exclusive upper
  * bound of everything committed) — the generator is deterministic,
  * so an offset IS a complete description of progress and replaying
  * [start, end) after a failure reproduces the batch bit-for-bit
  * (the exactly-once contract a deterministic source gets for free).
  */
private[sources] case class SynthOffset(id: Long) extends Offset {
  override def json(): String = s"""{"id":$id}"""
}

/** The streaming half of the connector (SURVEY §2 B102): the same
  * deterministic table surfaced as a micro-batch stream. Offsets are
  * id positions; `maxRowsPerBatch` (option, 0 = unbounded) is the
  * admission-control knob — under Trigger.AvailableNow the run
  * replays the whole table as ⌈rows/maxRowsPerBatch⌉ bounded
  * batches, exactly the shape a Kafka-backed deployment would have
  * (maxOffsetsPerTrigger), so batch-boundary bugs in downstream
  * stateful operators surface in tests without a broker.
  *
  * Column pruning and filter pushdown arrive through the SAME
  * ScanBuilder as the batch path (V2ScanRelationPushDown runs for
  * streaming relations too); each batch's id range additionally
  * prunes against pushed id bounds, so a filtered replay plans empty
  * ranges away entirely.
  */
private[sources] class SynthMicroBatchStream(rows: Long, slices: Int,
    filters: Array[Filter], required: StructType, maxRowsPerBatch: Long)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  // id bounds implied by pushed filters (same contract as SynthScan)
  private val (lo, hi) = {
    var lo = 0L
    var hi = rows
    filters.foreach {
      case GreaterThanOrEqual("id", v: java.lang.Long) => lo = math.max(lo, v)
      case GreaterThan("id", v: java.lang.Long) => lo = math.max(lo, v + 1)
      case LessThan("id", v: java.lang.Long) => hi = math.min(hi, v)
      case LessThanOrEqual("id", v: java.lang.Long) => hi = math.min(hi, v + 1)
      case EqualTo("id", v: java.lang.Long) =>
        lo = math.max(lo, v); hi = math.min(hi, v + 1)
      case _ =>
    }
    (lo, hi)
  }

  override def initialOffset(): Offset = SynthOffset(0L)

  override def deserializeOffset(json: String): Offset =
    SynthOffset(json.filter(c => c.isDigit || c == '-').toLong)

  override def getDefaultReadLimit: ReadLimit =
    if (maxRowsPerBatch > 0) ReadLimit.maxRows(maxRowsPerBatch)
    else ReadLimit.allAvailable()

  // Everything is always available (the generator has no tail to
  // wait for): AvailableNow preparation is a no-op and the latest
  // offset under a max-rows limit simply steps the id cursor.
  override def prepareForTriggerAvailableNow(): Unit = ()

  override def reportLatestOffset(): Offset = SynthOffset(rows)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead of this method")

  override def latestOffset(startOffset: Offset, limit: ReadLimit): Offset = {
    val start = startOffset.asInstanceOf[SynthOffset].id
    limit match {
      case mr: ReadMaxRows => SynthOffset(math.min(start + mr.maxRows(), rows))
      case _ => SynthOffset(rows)
    }
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = math.max(start.asInstanceOf[SynthOffset].id, lo)
    val e = math.min(end.asInstanceOf[SynthOffset].id, hi)
    if (s >= e) return Array.empty
    // Fixed per-slice width so a batch's parallelism tracks its size
    // (a small final batch doesn't fragment into `slices` slivers).
    val per = math.max((e - s) / slices, 1L)
    (0 until slices).iterator.map { i =>
      val ps = s + i * per
      val pe = if (i == slices - 1) e else math.min(ps + per, e)
      SynthPartition(ps, pe)
    }.filter(p => p.start < p.end).toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SynthReaderFactory(filters, required)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

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
