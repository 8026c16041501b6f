package graft

import org.apache.spark.sql.functions._

/** B129 zonemap_overlap_factor — planted zones with known extents:
  * every octile probe must count exactly the zones whose [min, max]
  * day extent covers it.
  */
class OverlapFactorSpec extends SparkTestBase {
  import spark.implicits._

  test("octile probes count exactly the covering zones") {
    val dir = java.nio.file.Files.createTempDirectory("ovf").toString
    // zone 0 (keys < 256): days 100..200; zone 1: days 150..300
    Seq((1L, 100L), (2L, 200L), (300L, 150L), (301L, 300L))
      .toDF("l_orderkey", "day")
      .select($"l_orderkey", lit(10.0).as("l_extendedprice"),
        timestamp_seconds($"day" * 86400L).as("l_shipdate"))
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = SparkEntry.queries("zonemap_overlap_factor")(spark, dir)
      .select($"k", $"probe_day", $"n_zones", $"n_zones_touched",
        $"overlap_factor")
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1)
    // d0=100, d1=300 → probes 100,125,150,175,200,225,250,275
    assert(got.map(_._2).toSeq ==
      Seq(100L, 125L, 150L, 175L, 200L, 225L, 250L, 275L), s"${got.toSeq}")
    assert(got.map(_._3).toSet == Set(2L))
    assert(got.map(_._4).toSeq == Seq(1L, 1L, 2L, 2L, 2L, 1L, 1L, 1L),
      s"touched ${got.map(_._4).toSeq}")
    assert(got.map(_._5).toSeq ==
      Seq(0.5, 0.5, 1.0, 1.0, 1.0, 0.5, 0.5, 0.5))
  }

  test("corpus run: factors in (0,1], orderkey clustering means wide day extents") {
    val got = SparkEntry.queries("zonemap_overlap_factor")(spark, sfDir)
      .select($"overlap_factor").as[Double].collect()
    assert(got.length == 8)
    assert(got.forall(f => f > 0.0 && f <= 1.0), s"${got.toSeq}")
  }
}
