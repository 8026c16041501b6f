package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._

/** timeseries_subseq_match (C82) on a series with a PLANTED pattern:
  * the oracle proves Spark and DuckDB compute the same distances —
  * this spec pins that the distances mean what they claim: a window
  * containing the query shape (at any amplitude/offset — that is
  * what z-normalization buys) is the rank-1 match at its exact
  * offset with distance ~0, and a constant (flat) series produces no
  * matches at all.
  */
class SubseqMatchSpec extends SparkTestBase {
  import spark.implicits._

  private def eventsDir(rows: Seq[(Long, Long, Double, Long)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-subseq").toString
    rows.toDF("event_id", "user_id", "value", "sec")
      .withColumn("ts", col("sec").cast("timestamp"))
      .withColumn("event_type", lit("view"))
      .drop("sec")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("planted (scaled+shifted) pattern is the rank-1 match at its offset") {
    // base shape 1,2,3,4,4,3,2,1 planted at offset 5, scaled x10 and
    // shifted +100 — z-normalization must still see distance ~0
    val noise = Seq(7.0, -3.0, 12.0, 0.5, 9.0)
    val planted = Seq(1.0, 2.0, 3.0, 4.0, 4.0, 3.0, 2.0, 1.0).map(_ * 10 + 100)
    val tail = Seq(-5.0, 20.0, 3.0)
    val series = noise ++ planted ++ tail
    val rows = series.zipWithIndex.map { case (v, i) =>
      (i.toLong, 1L, v, 1000L + i * 60)
    }
    val out = SparkEntry.queries("timeseries_subseq_match")(spark, eventsDir(rows))
      .filter(col("user_id") === 1L && col("rnk") === 1)
      .select(col("start"), col("dist6"))
      .as[(Long, Double)].collect().toList
    assert(out.length === 1)
    val (start, dist) = out.head
    assert(start === 5L, s"planted offset not found: start=$start dist=$dist")
    assert(dist < 1e-9, s"planted pattern should match at ~0 distance, got $dist")
  }

  test("a flat series has no z-form and yields no matches") {
    val rows = (0 until 20).map(i => (i.toLong, 2L, 42.0, 1000L + i * 60))
    val n = SparkEntry.queries("timeseries_subseq_match")(spark, eventsDir(rows))
      .filter(col("user_id") === 2L).count()
    assert(n === 0L)
  }
}
