package graft

/** Pins the C86 Rocchio classifier's planted-concept RECOVERY — the
  * property the oracle gate can't express (the oracle replays the
  * same arithmetic; only a spec can demand the learned separator
  * actually separates):
  *   1. recovery accuracy ≥ 0.85 on the real sf0.001 corpus (0.87
  *      measured at all three SFs — Rocchio's honest ceiling under
  *      non-identity class covariance);
  *   2. the gate is non-vacuous: both classes are populated and both
  *      predictions occur (an all-one-class constant predictor
  *      cannot reach the accuracy bar, but assert it anyway);
  *   3. determinism: two runs produce identical (score, pred) maps.
  */
class RocchioSpec extends SparkTestBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("rocchio recovers the planted separator at >= 0.85 accuracy, non-vacuously") {
    val rows = SparkEntry.queries("rocchio_classifier_score")(spark, dir)
      .select($"doc_id", $"label", $"score", $"pred")
      .as[(Long, Int, Long, Int)].collect()
    assert(rows.length == 500)
    val acc = rows.count(r => r._2 == r._4).toDouble / rows.length
    assert(acc >= 0.85, s"planted-concept recovery accuracy $acc < 0.85")
    assert(rows.count(_._2 == 1) > 100 && rows.count(_._2 == 0) > 100,
      "labels degenerate")
    assert(rows.count(_._4 == 1) > 50 && rows.count(_._4 == 0) > 50,
      "predictions degenerate")
  }

  test("rocchio scoring is deterministic across runs") {
    def run() = SparkEntry.queries("rocchio_classifier_score")(spark, dir)
      .select($"doc_id", $"score", $"pred")
      .as[(Long, Long, Int)].collect().sortBy(_._1).toSeq
    assert(run() == run())
  }
}
