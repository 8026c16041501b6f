package graft

import org.apache.spark.sql.functions._

/** B151 qq_shift_deciles — a planted uniform translation shows a
  * CONSTANT shift at every decile; corpus deciles are monotone.
  */
class QqShiftSpec extends SparkTestBase {
  import spark.implicits._

  test("uniform +5 translation: every decile shift exactly 5.0") {
    val dir = java.nio.file.Files.createTempDirectory("qq").toString
    val t0 = 19723L * 86400
    val base = (1 to 20).map(_.toDouble)
    val rows = base.map(v => ("view", v)) ++ base.map(v => ("purchase", v + 5))
    rows.zipWithIndex.map { case ((ty, v), i) =>
      (i.toLong, (t0 + i) * 1000000000L, 1L, ty, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows2 = SparkEntry.queries("qq_shift_deciles")(spark, dir)
      .collect().sortBy(_.getAs[Int]("decile"))
    assert(rows2.length == 9)
    rows2.foreach { r =>
      // shift is one IEEE subtraction of two 4dp-rounded doubles —
      // bit-identical cross-engine but it carries ulp dust, so the
      // spec asserts to 1e-9 (the ORACLE gate compares exact bits)
      assert(math.abs(r.getAs[Double]("shift") - 5.0) < 1e-9,
        s"decile ${r.getAs[Int]("decile")}")
      assert(math.abs(r.getAs[Double]("q_purchase")
        - r.getAs[Double]("q_view") - 5.0) < 1e-9)
    }
  }

  test("corpus: 9 deciles, both quantile columns monotone non-decreasing") {
    val rows = SparkEntry.queries("qq_shift_deciles")(spark, sfDir)
      .collect().sortBy(_.getAs[Int]("decile"))
    assert(rows.length == 9)
    for (c <- Seq("q_purchase", "q_view")) {
      val qs = rows.map(_.getAs[Double](c))
      assert(qs.zip(qs.tail).forall { case (a, b) => b >= a }, c)
    }
  }
}
