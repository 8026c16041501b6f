package graft

import org.apache.spark.sql.functions._

/** Round-12 sixth-batch specs — Friedman and shot segmentation. */

/** B149 friedman_test — a perfectly consistent daily ordering maxes
  * the statistic at the hand-solved χ² = 6; identical columns pin
  * the all-tied NULL.
  */
class FriedmanSpec extends SparkTestBase {
  import spark.implicits._

  private def plant(rows: Seq[(Long, String, Double)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("fr").toString
    val t0 = 19723L * 86400
    rows.zipWithIndex.map { case ((daySec, ty, v), i) =>
      (i.toLong, (t0 + daySec * 86400 + i % 10) * 1000000000L, 1L, ty, v,
        "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("consistent A<B<C over 3 days: chi2 = 6 exactly") {
    val rows = for (d <- 0L to 2L; (ty, v) <- Seq(("A", 1.0), ("B", 2.0),
      ("C", 3.0))) yield (d, ty, v)
    val r = SparkEntry.queries("friedman_test")(spark, plant(rows))
      .collect().head
    assert(r.getAs[Long]("n_days") == 3L)
    assert(r.getAs[Long]("n_types") == 3L)
    // R2 = (6,12,18), n(k+1) = 12 → num = 72; Σr2² = 3·56 = 168,
    // nk(k+1)² = 144 → chi2 = 2·72/24 = 6
    assert(r.getAs[Double]("chi2_friedman") == 6.0)
  }

  test("identical columns every day: tie denominator 0 → NULL") {
    val rows = for (d <- 0L to 2L; ty <- Seq("A", "B", "C"))
      yield (d, ty, 5.0)
    val r = SparkEntry.queries("friedman_test")(spark, plant(rows))
      .collect().head
    assert(r.isNullAt(r.fieldIndex("chi2_friedman")))
  }

  test("corpus: 5 types ranked per day, chi2 defined and non-negative") {
    val r = SparkEntry.queries("friedman_test")(spark, sfDir)
      .collect().head
    assert(r.getAs[Long]("n_types") == 5L)
    assert(r.getAs[Double]("chi2_friedman") >= 0.0)
  }
}

/** C121 mm_shot_segments — shots partition each doc's frames exactly,
  * and per-shot energies re-add to the doc total (dyadic-exact).
  */
class ShotSegmentsSpec extends SparkTestBase {
  import spark.implicits._

  test("corpus: shots partition frames; cuts + 1 = shots; energy re-adds") {
    val shots = SparkEntry.queries("mm_shot_segments")(spark, sfDir)
      .collect()
    val cuts = SparkEntry.queries("mm_scene_cuts")(spark, sfDir)
      .collect()
    val framesPerDoc = cuts.groupBy(_.getAs[Long]("id"))
      .map { case (id, rs) => id -> (rs.length + 1) } // transitions + 1
    val shotsByDoc = shots.groupBy(_.getAs[Long]("id"))
    // per doc: shot frame counts sum to the doc's frame count
    shotsByDoc.foreach { case (id, ss) =>
      framesPerDoc.get(id).foreach { nf =>
        assert(ss.map(_.getAs[Long]("n_frames")).sum == nf.toLong, s"doc $id")
      }
      // shots tile the frame range without overlap
      val sorted = ss.sortBy(_.getAs[Long]("shot_id"))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Int]("last_frame") < b.getAs[Int]("first_frame"))
        case _ =>
      }
    }
    // cut count per doc = shots − 1
    val cutCount = cuts.filter(_.getAs[Int]("is_cut") == 1)
      .groupBy(_.getAs[Long]("id")).map { case (id, rs) => id -> rs.length }
    shotsByDoc.foreach { case (id, ss) =>
      assert(cutCount.getOrElse(id, 0) == ss.length - 1, s"doc $id")
    }
  }
}
