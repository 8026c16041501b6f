package graft

import org.apache.spark.sql.functions._

/** Hand-computed pins for the round-8 additions: Kneser-Ney bigram
  * scoring (C78) and the token-budget greedy cut (C79).
  */
class KnBudgetSpec extends SparkTestBase {
  import spark.implicits._

  private def docsDir(rows: Seq[(Long, String, String, String, Long)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-knb").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("text_kn_score matches a hand-computed Kneser-Ney value") {
    // corpus = one doc "a b a b": bigrams (a,b)x2, (b,a)x1
    //   cb(a,b)=2 cu(a)=2 N1+(a·)=1 ; cb(b,a)=1 cu(b)=1 N1+(b·)=1
    //   N1+(·b)=1 N1+(·a)=1 N1+(··)=2, D=0.75
    //   P(b|a) = (2−.75)/2 + (.75·1/2)(1/2) = 0.8125
    //   P(a|b) = (1−.75)/1 + (.75·1/1)(1/2) = 0.625
    //   avg ln = (2·ln .8125 + ln .625)/3 = −0.2951 (4dp)
    val dir = docsDir(Seq((1L, "a b a b", "en", "s", 7L)))
    val out = SparkEntry.queries("text_kn_score")(spark, dir)
      .as[(Long, Long, Double)].collect().toList
    assert(out === List((1L, 3L, -0.2951)))
  }

  test("text_kn_score gives a repeated bigram more mass than add-one does a rare one") {
    // sanity on the real corpus: scores are finite negatives and every
    // doc with >= 2 tokens appears exactly once
    val out = SparkEntry.queries("text_kn_score")(spark, sfDir)
      .as[(Long, Long, Double)].collect()
    assert(out.nonEmpty)
    assert(out.forall { case (_, nb, lp) => nb >= 1 && lp < 0.0 && !lp.isInfinite })
    assert(out.map(_._1).distinct.length === out.length)
  }

  test("corpus_budget_select keeps exactly the greedy prefix under the budget") {
    // 4 docs, 10 tokens each (total 40 => budget = 10): only the
    // densest doc fits. Density = 1000*n_chars div 10.
    val tokens10 = (1 to 10).map(i => s"t$i").mkString(" ")
    val dir = docsDir(Seq(
      (1L, tokens10, "en", "web", 300L), // density 30000
      (2L, tokens10, "en", "web", 200L), // 20000
      (3L, tokens10, "en", "book", 100L), // 10000
      (4L, tokens10, "en", "book", 50L))) // 5000
    val out = SparkEntry.queries("corpus_budget_select")(spark, dir)
      .select($"source", $"n_kept", $"kept_tokens", $"kept_id_sum")
      .as[(String, Long, Long, Long)].collect().toList
    assert(out === List(("web", 1L, 10L, 1L)),
      s"expected only doc 1 kept, got $out")
  }

  test("corpus_budget_select boundary doc is excluded, ties break by doc_id") {
    // 3 docs x 10 tokens (total 30 => budget 7): even the best doc
    // exceeds the budget alone -> nothing kept. Then 4 equal-score
    // docs (budget 10): the kept one is the LOWEST doc_id.
    val tokens10 = (1 to 10).map(i => s"t$i").mkString(" ")
    val none = SparkEntry.queries("corpus_budget_select")(
      spark, docsDir(Seq(
        (1L, tokens10, "en", "w", 300L),
        (2L, tokens10, "en", "w", 200L),
        (3L, tokens10, "en", "w", 100L))))
      .count()
    assert(none === 0L)
    val ties = SparkEntry.queries("corpus_budget_select")(
      spark, docsDir(Seq(
        (7L, tokens10, "en", "w", 100L),
        (3L, tokens10, "en", "w", 100L),
        (9L, tokens10, "en", "w", 100L),
        (5L, tokens10, "en", "w", 100L))))
      .select($"kept_id_sum").as[Long].collect().toList
    assert(ties === List(3L), s"tie-break should keep lowest doc_id, got $ties")
  }

  test("corpus_temperature_mix: targets sum to T exactly and favor low-resource langs") {
    // 90 'en' docs vs 10 'de' docs: proportional gives de 10% of the
    // budget; τ = 0.5 gives √90:√10 ≈ 3:1 → de gets ~25%.
    val rows = (0 until 90).map(i => (i.toLong, s"en doc $i", "en", "w", 10L)) ++
      (90 until 100).map(i => (i.toLong, s"de doc $i", "de", "w", 10L))
    val dir = docsDir(rows)
    val out = SparkEntry.queries("corpus_temperature_mix")(spark, dir)
      .select($"lang", $"n_docs", $"target", $"n_kept")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val t = 100L / 2
    assert(out.values.map(_._3).sum === t, "targets must sum to T exactly")
    out.values.foreach { case (_, n, tgt, kept) =>
      assert(kept === math.min(n, tgt)) }
    val deShare = out("de")._3.toDouble / t
    assert(deShare > 0.15 && deShare < 0.35,
      s"τ=0.5 should lift de from 10% toward ~25%, got $deShare")
  }
}
