package graft

import org.apache.spark.sql.functions._

/** Round-12 fifth-batch specs — effect sizes and preference pairs. */

/** B147 cramers_v — a perfectly associated 2×2 lands on V = 1; a
  * product-structure grid on V = 0.
  */
class CramersVSpec extends SparkTestBase {
  import spark.implicits._

  private def plant(custs: Seq[(Long, String, Long)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("cv").toString
    custs.toDF("c_custkey", "c_mktsegment", "c_nationkey")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((0L, 0L, "N0"), (1L, 1L, "N1"))
      .toDF("n_nationkey", "n_regionkey", "n_name")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    Seq((0L, "R1"), (1L, "R2")).toDF("r_regionkey", "r_name")
      .write.mode("overwrite").parquet(s"$dir/region.parquet")
    dir
  }

  test("perfect 2×2 association: chi2 = N, V = 1") {
    val custs = (1 to 10).map(i => (i.toLong, "A", 0L)) ++
      (11 to 20).map(i => (i.toLong, "B", 1L))
    val r = SparkEntry.queries("cramers_v")(spark, plant(custs))
      .collect().head
    assert(r.getAs[Long]("n") == 20L)
    assert(r.getAs[Double]("chi2") == 20.0)
    assert(r.getAs[Double]("cramers_v") == 1.0)
  }

  test("product-structure grid: chi2 = 0, V = 0") {
    val custs =
      (1 to 5).map(i => (i.toLong, "A", 0L)) ++
      (6 to 10).map(i => (i.toLong, "A", 1L)) ++
      (11 to 15).map(i => (i.toLong, "B", 0L)) ++
      (16 to 20).map(i => (i.toLong, "B", 1L))
    val r = SparkEntry.queries("cramers_v")(spark, plant(custs))
      .collect().head
    assert(r.getAs[Double]("chi2") == 0.0)
    assert(r.getAs[Double]("cramers_v") == 0.0)
  }

  test("corpus: V in [0, 1] and consistent with the B115 chi-square") {
    val r = SparkEntry.queries("cramers_v")(spark, sfDir).collect().head
    val v = r.getAs[Double]("cramers_v")
    assert(v >= 0.0 && v <= 1.0)
    val chi115 = SparkEntry.queries("chisq_segment_region")(spark, sfDir)
      .select(col("chi2_total")).distinct().collect().head.getDouble(0)
    assert(r.getAs[Double]("chi2") == chi115)
  }
}

/** B148 cohens_d — a hand-built equal-variance shift lands on
  * d = √3/2 exactly; Hedges' g follows the replicated correction.
  */
class CohensDSpec extends SparkTestBase {
  import spark.implicits._

  test("hand case: d = sqrt(3)/2, g = d·(1 − 3/23)") {
    val dir = java.nio.file.Files.createTempDirectory("cd").toString
    val t0 = 19723L * 86400
    val rows = Seq(("purchase", 10.0), ("purchase", 10.0),
      ("purchase", 14.0), ("purchase", 14.0),
      ("view", 8.0), ("view", 8.0), ("view", 12.0), ("view", 12.0))
    rows.zipWithIndex.map { case ((ty, v), i) =>
      (i.toLong, (t0 + i) * 1000000000L, 1L, ty, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = SparkEntry.queries("cohens_d")(spark, dir).collect().head
    // cents: p {1000,1000,1400,1400}, v {800,800,1200,1200}; pooled
    // s² = 160000/3 both; d = 200/√(160000/3) = √3/2
    val ssw = (5920000.0 - 4800.0 * 4800 / 4) + (4160000.0 - 4000.0 * 4000 / 4)
    val d = (4800.0 / 4 - 4000.0 / 4) / math.sqrt(ssw / 6)
    assert(r.getAs[Double]("cohens_d")
      == math.floor(d * 1000000 + 0.5) / 1000000)
    assert(r.getAs[Double]("hedges_g")
      == math.floor(d * (1 - 3.0 / 23) * 1000000 + 0.5) / 1000000)
  }

  test("corpus: d and g defined, |g| < |d|, signs agree") {
    val r = SparkEntry.queries("cohens_d")(spark, sfDir).collect().head
    val d = r.getAs[Double]("cohens_d")
    val g = r.getAs[Double]("hedges_g")
    assert(math.abs(g) < math.abs(d) || d == 0.0)
    assert(math.signum(g) == math.signum(d))
  }
}

/** C120 preference_pairs — an all-tied 8-doc source pins the tie
  * rule exactly: pairs (1,8), (2,7), (3,6), (4,5), margin 0.
  */
class PreferencePairsSpec extends SparkTestBase {
  import spark.implicits._

  test("all-tied 8-doc source: pairs by id from both ends, margin 0") {
    val dir = java.nio.file.Files.createTempDirectory("pp").toString
    val text = "the quick brown fox jumps over the lazy dog again"
    val docs = (1 to 8).map(i => (i.toLong, "web", text)) ++
      (9 to 12).map(i => (i.toLong, "tiny", text)) // < 8 docs: excluded
    docs.toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("preference_pairs")(spark, dir)
      .collect().sortBy(_.getAs[Long]("pair_rank"))
    assert(rows.length == 4)
    assert(rows.forall(_.getAs[String]("source") == "web"))
    val pairs = rows.map(r => (r.getAs[Long]("chosen_id"),
      r.getAs[Long]("rejected_id")))
    assert(pairs.sameElements(Seq((1L, 8L), (2L, 7L), (3L, 6L), (4L, 5L))))
    assert(rows.forall(_.getAs[Double]("margin") == 0.0))
  }

  test("corpus: 4 pairs per qualifying source, margins non-negative, " +
    "chosen never equals rejected") {
    val rows = SparkEntry.queries("preference_pairs")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val bySource = rows.groupBy(_.getAs[String]("source"))
    bySource.values.foreach(g => assert(g.length == 4))
    rows.foreach { r =>
      assert(r.getAs[Double]("margin") >= 0.0)
      assert(r.getAs[Long]("chosen_id") != r.getAs[Long]("rejected_id"))
    }
  }
}
