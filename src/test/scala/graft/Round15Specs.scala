package graft

import org.apache.spark.sql.functions._

/** Round-12 fourth-batch specs — Anderson-Darling, Jonckheere-
  * Terpstra, and T5 span corruption.
  */

/** B145 anderson_darling — disjoint singletons hand-solve to A² = 1;
  * fully tied samples degenerate to 0 (no non-terminal values).
  */
class AndersonDarlingSpec extends SparkTestBase {
  import spark.implicits._

  private def run(rows: Seq[(String, Double)]): org.apache.spark.sql.Row = {
    val dir = java.nio.file.Files.createTempDirectory("ad").toString
    val t0 = 19723L * 86400
    rows.zipWithIndex.map { case ((ty, v), i) =>
      (i.toLong, (t0 + i) * 1000000000L, 1L, ty, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    SparkEntry.queries("anderson_darling")(spark, dir).collect().head
  }

  test("disjoint singletons {1} vs {2}: A² = 1 exactly") {
    // one non-terminal value (B=1): t₁ = (2·1−1·1)²e6/(1·2·1·1) = 5e5,
    // t₂ = (2·0−1·1)²e6/(1·2·1·1) = 5e5; contrib = 1·1e6 → A² = 1
    val r = run(Seq(("purchase", 0.01), ("view", 0.02)))
    assert(r.getAs[Long]("n1") == 1L)
    assert(r.getAs[Long]("n2") == 1L)
    assert(r.getAs[Double]("ad_stat") == 1.0)
  }

  test("fully tied samples: no non-terminal value → A² = 0") {
    val r = run(Seq(("purchase", 0.01), ("view", 0.01)))
    assert(r.getAs[Double]("ad_stat") == 0.0)
  }

  test("corpus: A² non-negative and consistent with the KS direction") {
    val r = SparkEntry.queries("anderson_darling")(spark, sfDir)
      .collect().head
    assert(r.getAs[Long]("n1") > 0 && r.getAs[Long]("n2") > 0)
    assert(r.getAs[Double]("ad_stat") >= 0.0)
  }
}

/** B146 jonckheere_trend — a perfectly increasing ladder hand-solves
  * J and z; the reversed ladder lands on exactly −z.
  */
class JonckheereSpec extends SparkTestBase {
  import spark.implicits._

  private def run(rows: Seq[(String, Double)]): org.apache.spark.sql.Row = {
    val dir = java.nio.file.Files.createTempDirectory("jt").toString
    rows.toDF("o_orderpriority", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    SparkEntry.queries("jonckheere_trend")(spark, dir).collect().head
  }

  private val zLadder = {
    // J = 3 (all three ordered pairs concordant), μ = (9−3)/4 = 1.5,
    // σ² = (81 − 3·5)/72 = 66/72
    math.floor((3.0 - 1.5) / math.sqrt(66.0 / 72.0) * 1000000 + 0.5) / 1000000
  }

  test("increasing ladder A<B<C: J2 = 6, hand-solved z") {
    val r = run(Seq("A" -> 0.01, "B" -> 0.02, "C" -> 0.03))
    assert(r.getAs[Long]("n_rows") == 3L)
    assert(r.getAs[Long]("j2") == 6L)
    assert(r.getAs[Double]("z") == zLadder)
  }

  test("decreasing ladder: J2 = 0, z = −z_ladder") {
    val r = run(Seq("A" -> 0.03, "B" -> 0.02, "C" -> 0.01))
    assert(r.getAs[Long]("j2") == 0L)
    assert(r.getAs[Double]("z") == -zLadder)
  }

  test("corpus: J2 within its [0, N²] bound, z defined") {
    val r = SparkEntry.queries("jonckheere_trend")(spark, sfDir)
      .collect().head
    val n = r.getAs[Long]("n_rows")
    assert(r.getAs[Long]("j2") >= 0 && r.getAs[Long]("j2") <= 2 * n * n)
    assert(!r.isNullAt(r.fieldIndex("z")))
  }
}

/** C119 span_corruption — the doc_id = 1 mask ((30 + 4·pos) mod 97
  * < 15) marks exactly positions 17-20 of a 22-token doc: one
  * four-token span, hand-assembled inputs/targets.
  */
class SpanCorruptionSpec extends SparkTestBase {
  import spark.implicits._

  test("22-token doc: one 4-token span at positions 17-20, exact strings") {
    val dir = java.nio.file.Files.createTempDirectory("t5").toString
    val toks = (1 to 22).map(i => s"t$i")
    Seq((1L, toks.mkString(" ")))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("span_corruption")(spark, dir)
      .collect().head
    assert(r.getAs[Long]("n_tokens") == 22L)
    assert(r.getAs[Long]("n_corrupted") == 4L)
    assert(r.getAs[Long]("n_spans") == 1L)
    val expectedInput = ((1 to 16).map(i => s"t$i") ++ Seq("<extra_id_0>")
      ++ Seq("t21", "t22")).mkString(" ")
    assert(r.getAs[String]("input_text") == expectedInput)
    assert(r.getAs[String]("target_text")
      == "<extra_id_0> t17 t18 t19 t20")
  }

  test("corpus: noise density near 15/97, spans never exceed corruption") {
    val rows = SparkEntry.queries("span_corruption")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val tok = rows.map(_.getAs[Long]("n_tokens")).sum.toDouble
    val cor = rows.map(_.getAs[Long]("n_corrupted")).sum.toDouble
    assert(math.abs(cor / tok - 15.0 / 97) < 0.02)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_spans") <= r.getAs[Long]("n_corrupted"))
    }
  }
}
