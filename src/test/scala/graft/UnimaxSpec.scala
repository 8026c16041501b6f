package graft

import org.apache.spark.sql.functions._

/** Pins the C87 UniMax water-filling allocator's invariants — the
  * properties the per-SF oracle gate shares arithmetic with and so
  * cannot independently certify:
  *   1. Σ alloc = T exactly (the MOD remainder is fully distributed);
  *   2. alloc_l ≤ cap_l everywhere (the epoch bound is never broken);
  *   3. capped languages take FULL epochs (partial = 0, n_full = E);
  *   4. on a corpus where no cap binds, the allocation is uniform to
  *      within 1 token (max-min fairness with slack caps).
  */
class UnimaxSpec extends SparkTestBase {
  import spark.implicits._

  private def allocs(dir: String) =
    SparkEntry.queries("corpus_unimax_mix")(spark, dir)
      .select($"lang", $"n_toks", $"cap", $"alloc", $"n_full_epochs",
        $"partial_tokens")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq

  test("unimax invariants on the real corpus: sum=T, alloc<=cap, capped langs full") {
    val rows = allocs("/root/testdata/sf0.001")
    val tot = rows.map(_._2).sum
    assert(rows.map(_._4).sum == Math.floorDiv(3 * tot, 2))
    rows.foreach { case (lang, _, cap, alloc, nFull, partial) =>
      assert(alloc <= cap, s"$lang alloc $alloc > cap $cap")
      if (alloc == cap) {
        assert(partial == 0 && nFull == 2, s"$lang capped but not full epochs")
      }
    }
    // the gate corpus must exercise BOTH branches
    assert(rows.exists(_._4 == rows.find(r => r._4 == r._3).map(_._3).getOrElse(-1L)),
      "no language hits its cap")
    assert(rows.exists(r => r._4 < r._3), "every language capped — water level unexercised")
  }

  test("unimax with slack caps allocates uniformly within 1 token") {
    // balanced synthetic corpus: every language the same token mass,
    // so caps (2 epochs) never bind against T = 1.5x corpus
    val docs = (0 until 40).map { i =>
      (i.toLong, Seq.fill(10)("tok").mkString(" "), s"l${i % 4}", "s", 40L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft-um").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = allocs(dir)
    val tot = rows.map(_._2).sum
    assert(rows.map(_._4).sum == Math.floorDiv(3 * tot, 2))
    assert(rows.map(_._4).max - rows.map(_._4).min <= 1,
      s"slack-cap allocation not uniform: $rows")
    assert(rows.forall(r => r._4 < r._3), "cap bound in the slack case")
  }
}
