package graft

import org.apache.spark.sql.functions._

/** Round-12 third-batch specs — Ljung-Box, the runs test, and the
  * SemDeDup epsilon sweep.
  */

/** B143 ljung_box — the alternating series' exact dyadic Q values:
  * Q₁ = 80·(49/64)/7 = 8.75, Q₂ = 8.75 + 80·(36/64)/6 = 16.25.
  */
class LjungBoxSpec extends SparkTestBase {
  import spark.implicits._

  test("alternating 8-day series: Q(1) = 8.75, Q(2) = 16.25 exactly") {
    val dir = java.nio.file.Files.createTempDirectory("lb").toString
    val rows = (0 until 8).map { i =>
      (i.toLong, java.sql.Date.valueOf(java.time.LocalDate
        .of(2024, 1, 1).plusDays(i.toLong)),
        if (i % 2 == 0) 20.0 else 10.0)
    }
    rows.toDF("o_orderkey", "o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = SparkEntry.queries("ljung_box")(spark, dir)
      .collect().map(r => r.getAs[Long]("lag") -> r).toMap
    assert(out.size == 7)
    assert(out(1L).getAs[Double]("acf") == -0.875)
    assert(out(1L).getAs[Double]("q_stat") == 8.75)
    assert(out(2L).getAs[Double]("q_stat") == 16.25)
    // Q is non-decreasing in the lag by construction
    val qs = (1L to 7L).map(out(_).getAs[Double]("q_stat"))
    assert(qs.zip(qs.tail).forall { case (a, b) => b >= a })
  }

  test("corpus: 7 lags, Q non-decreasing and non-negative") {
    val out = SparkEntry.queries("ljung_box")(spark, sfDir)
      .collect().sortBy(_.getAs[Long]("lag"))
    assert(out.length == 7)
    val qs = out.map(_.getAs[Double]("q_stat"))
    assert(qs.head >= 0.0)
    assert(qs.zip(qs.tail).forall { case (a, b) => b >= a })
  }
}

/** B144 runs_test_daily — the alternating series maximizes runs
  * (R = n, hand-solved z); a constant series degenerates to NULL.
  */
class RunsTestSpec extends SparkTestBase {
  import spark.implicits._

  private def run(vals: Seq[Double]): org.apache.spark.sql.Row = {
    val dir = java.nio.file.Files.createTempDirectory("runs").toString
    vals.zipWithIndex.map { case (v, i) =>
      (i.toLong, java.sql.Date.valueOf(java.time.LocalDate
        .of(2024, 1, 1).plusDays(i.toLong)), v)
    }.toDF("o_orderkey", "o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    SparkEntry.queries("runs_test_daily")(spark, dir).collect().head
  }

  test("alternating 8-day series: R = 8, hand-solved z") {
    val r = run((0 until 8).map(i => if (i % 2 == 0) 20.0 else 10.0))
    assert(r.getAs[Long]("n1") == 4L)
    assert(r.getAs[Long]("n2") == 4L)
    assert(r.getAs[Long]("n_runs") == 8L)
    // μ = 2·16/8 + 1 = 5; σ² = 2·16·(32−8)/(64·7) = 768/448
    val expected = math.floor((8.0 - 5.0) / math.sqrt(768.0 / 448.0)
      * 1000000 + 0.5) / 1000000
    assert(r.getAs[Double]("z") == expected)
  }

  test("constant series: one run, one-sided → NULL z") {
    val r = run(Seq.fill(6)(10.0))
    assert(r.getAs[Long]("n_runs") == 1L)
    assert(r.getAs[Long]("n1") == 0L)
    assert(r.isNullAt(r.fieldIndex("z")))
  }

  test("corpus: both sides populated, z defined") {
    val r = SparkEntry.queries("runs_test_daily")(spark, sfDir)
      .collect().head
    assert(r.getAs[Long]("n1") > 0 && r.getAs[Long]("n2") > 0)
    assert(!r.isNullAt(r.fieldIndex("z")))
  }
}

/** C118 semdedup_eps_sweep — retained fraction is monotone in ε, and
  * the ε = 0.45 point must agree exactly with semantic_dedup_sharded
  * (the production pass it calibrates).
  */
class SemDedupSweepSpec extends SparkTestBase {
  import spark.implicits._

  test("corpus sweep: monotone in ε; 0.45 point equals the C83 pass") {
    val rows = SparkEntry.queries("semdedup_eps_sweep")(spark, sfDir)
      .collect().sortBy(_.getAs[Double]("eps"))
    assert(rows.length == 4)
    assert(rows.map(_.getAs[Double]("eps"))
      .sameElements(Seq(0.45, 0.55, 0.65, 0.75)))
    val kept = rows.map(_.getAs[Long]("n_docs_kept"))
    // a looser ε drops MORE (mc >= eps is anti-monotone in eps)
    assert(kept.zip(kept.tail).forall { case (a, b) => b >= a })
    rows.foreach { r =>
      assert(r.getAs[Long]("n_dropped") <= r.getAs[Long]("n_reps"))
      val pct = r.getAs[Double]("pct_kept")
      assert(pct > 0.0 && pct <= 1.0)
    }
    // cross-query consistency: the production pass keeps exactly the
    // sweep's ε = 0.45 count
    val c83 = SparkEntry.queries("semantic_dedup_sharded")(spark, sfDir)
      .agg(sum(col("n_kept"))).collect().head.getLong(0)
    assert(rows.head.getAs[Long]("n_docs_kept") == c83)
  }
}
