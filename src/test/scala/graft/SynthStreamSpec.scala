package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** SynthProvider's MicroBatchStream (the streaming half of the B102
  * connector): admission control, batch-union exactness, and the
  * pushdown type-safety contract of the shared ScanBuilder.
  */
class SynthStreamSpec extends SparkTestBase {

  private def loadStream(maxRowsPerBatch: Long) = spark.readStream
    .format("graft.sources.SynthProvider")
    .option("rows", "100000").option("slices", "8")
    .option("maxRowsPerBatch", maxRowsPerBatch.toString).load()

  test("AvailableNow replay = declared table, in bounded micro-batches") {
    val name = s"synth_stream_spec_${System.nanoTime()}"
    val q = loadStream(16384)
      .writeStream.outputMode("append").format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val out = spark.table(name)
    // union across batches is EXACTLY the table: every id once
    assert(out.count() === 100000L)
    assert(out.select(col("id")).distinct().count() === 100000L)
    // h really is fmix64(id) through the streaming path too
    val row = out.filter(col("id") === 12345L)
      .select(col("h"), graft.functions.Fingerprint64.fmix64(col("id")).as("e"))
      .head()
    assert(row.getLong(0) === row.getLong(1))
    // admission control actually bounded the batches: 100k ids at
    // 16384/batch ⇒ 7 data-carrying micro-batches
    val dataBatches = q.recentProgress.count(_.numInputRows > 0)
    assert(dataBatches === 7,
      s"expected 7 bounded micro-batches, saw $dataBatches")
    spark.catalog.dropTempView(name)
  }

  test("unbounded admission (maxRowsPerBatch=0) replays in one batch") {
    val name = s"synth_stream_one_${System.nanoTime()}"
    val q = loadStream(0)
      .writeStream.outputMode("append").format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.table(name).count() === 100000L)
    assert(q.recentProgress.count(_.numInputRows > 0) === 1)
    spark.catalog.dropTempView(name)
  }

  test("conflicting pushed mod16 equalities yield zero rows, not first-wins") {
    val df = spark.read.format("graft.sources.SynthProvider")
      .option("rows", "1000").option("slices", "2").load()
      .filter(col("mod16") === 3 && col("mod16") === 5)
    assert(df.count() === 0L)
  }

  test("rejected pushdown types are still filtered (above the scan)") {
    // a cast forces the comparison away from the reader's Long/Int
    // contract; pushFilters must reject it and Spark re-evaluates it
    // above the scan — either way the rows are right
    val df = spark.read.format("graft.sources.SynthProvider")
      .option("rows", "1000").option("slices", "2").load()
      .filter(col("id").cast("string") === "42")
    assert(df.select(col("id")).as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().toSeq === Seq(42L))
  }
}
