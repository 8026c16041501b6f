package graft

import org.apache.spark.sql.functions._

/** Pins the C88 interval-merge semantics on a constructed corpus —
  * the branches the SF gate can't isolate (its dup docs are whole-doc
  * clones → always exactly one interval):
  *   1. two duplicated regions separated by >16 unique tokens → TWO
  *      maximal intervals;
  *   2. overlapping duplicated spans merge into ONE interval whose
  *      width exceeds a single span;
  *   3. span starts exactly 16 apart (touching, zero-overlap
  *      intervals) still merge — contiguous duplicated text is one
  *      region;
  *   4. clone multiplicity alone makes spans duplicated (two
  *      identical docs → their whole text is one covered interval).
  */
class SpanIntervalSpec extends SparkTestBase {
  import spark.implicits._

  private def toks(prefix: String, n: Int): String =
    (0 until n).map(i => s"$prefix$i").mkString(" ")

  private def run(docs: Seq[(Long, String)]) = {
    val dir = java.nio.file.Files.createTempDirectory("graft-iv").toString
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    SparkEntry.queries("span_dup_intervals")(spark, dir)
      .select($"doc_id", $"n_intervals", $"covered_tokens", $"max_interval_tokens")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
  }

  test("two separated dup regions yield two maximal intervals") {
    // doc 1: [dupA(16)] [uniq(20)] [dupB(16)]; docs 2/3 carry the dup
    // regions. gap between dupA end (pos 17..) and dupB start = 20+16
    // positions > 16 → two islands.
    val dupA = toks("a", 16); val dupB = toks("b", 16)
    val rows = run(Seq(
      (1L, s"$dupA ${toks("u", 20)} $dupB"),
      (2L, s"$dupA ${toks("x", 20)}"),
      (3L, s"${toks("y", 20)} $dupB")))
    val d1 = rows.find(_._1 == 1L).get
    assert(d1._2 == 2, s"expected 2 intervals, got $d1")
    assert(d1._3 == 32 && d1._4 == 16)
  }

  test("overlapping dup spans merge into one wide interval") {
    // 24 shared tokens → in doc 1 positions 1..9 all duplicated
    // (every 16-gram of the 24-token run) → one interval [1, 25)
    val shared = toks("s", 24)
    val rows = run(Seq(
      (1L, s"$shared ${toks("u", 5)}"),
      (2L, s"${toks("v", 5)} $shared")))
    val d1 = rows.find(_._1 == 1L).get
    assert(d1._2 == 1 && d1._3 == 24 && d1._4 == 24, s"got $d1")
  }

  test("touching spans (gap exactly 16) merge; gap 17 breaks") {
    // doc 1 = A(16) B(16) with both blocks duplicated but the
    // 16-grams STRADDLING the boundary unique → dup positions 1 and
    // 17, gap 16 → ONE interval of 32.
    val a = toks("a", 16); val b = toks("b", 16)
    val rows = run(Seq(
      (1L, s"$a $b"),
      (2L, s"$a ${toks("x", 16)}"),
      (3L, s"${toks("y", 16)} $b")))
    val d1 = rows.find(_._1 == 1L).get
    assert(d1._2 == 1 && d1._3 == 32, s"touching spans did not merge: $d1")
    // same but with one separator token: dup positions 1 and 18,
    // gap 17 → TWO intervals
    val rows2 = run(Seq(
      (1L, s"$a sep $b"),
      (2L, s"$a ${toks("x", 16)}"),
      (3L, s"${toks("y", 16)} $b")))
    val d2 = rows2.find(_._1 == 1L).get
    assert(d2._2 == 2 && d2._3 == 32, s"gap-17 spans merged: $d2")
  }

  test("exact clones are fully covered via multiplicity") {
    val t = toks("c", 20)
    val rows = run(Seq((1L, t), (2L, t)))
    assert(rows == Seq((1L, 1L, 20L, 20L), (2L, 1L, 20L, 20L)))
  }

  private def runRewrite(docs: Seq[(Long, String)]): Map[Long, (Long, Long, String)] = {
    val dir = java.nio.file.Files.createTempDirectory("graft-rw").toString
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    SparkEntry.queries("span_dedup_rewrite")(spark, dir)
      .select($"doc_id", $"n_tokens", $"n_kept", $"cleaned")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }

  test("the rewrite cuts exactly the dup intervals and keeps the rest") {
    // doc 1: dupA(16) uniq(20) dupB(16) → both dup regions removed,
    // the 20 unique middle tokens survive verbatim and in order
    val dupA = toks("a", 16); val dupB = toks("b", 16)
    val mid = toks("u", 20)
    val out = runRewrite(Seq(
      (1L, s"$dupA $mid $dupB"),
      (2L, s"$dupA ${toks("x", 20)}"),
      (3L, s"${toks("y", 20)} $dupB")))
    assert(out(1L) == ((52L, 20L, mid)), s"got ${out(1L)}")
    // doc 2: dupA removed, its 20 unique tokens kept
    assert(out(2L) == ((36L, 20L, toks("x", 20))))
  }

  test("docs without dup spans (or under 16 tokens) pass through verbatim") {
    val short = toks("s", 5)
    val long = toks("l", 30)
    val out = runRewrite(Seq((1L, short), (2L, long)))
    assert(out(1L) == ((5L, 5L, short)))
    assert(out(2L) == ((30L, 30L, long)))
  }

  test("a fully duplicated doc rewrites to the empty string") {
    val t = toks("c", 20)
    val out = runRewrite(Seq((1L, t), (2L, t)))
    assert(out(1L) == ((20L, 0L, "")) && out(2L) == ((20L, 0L, "")))
  }
}
