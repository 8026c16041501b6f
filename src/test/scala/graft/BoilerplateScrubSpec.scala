package graft

import org.apache.spark.sql.functions._

/** Pins line_boilerplate_scrub's semantic nuances on a constructed
  * corpus — the cases the sf oracle gate can't isolate:
  *   1. a line duplicated across docs of the SAME source is removed
  *      from EVERY doc, including its first occurrence (the contrast
  *      with line_dedup's keep-first);
  *   2. the same line appearing in two DIFFERENT sources (once each)
  *      is boilerplate for neither and survives in both;
  *   3. a line repeated twice WITHIN one doc only (df = 1 distinct
  *      docs) is NOT boilerplate — intra-doc repetition is C56's
  *      job, not a cross-doc df signal.
  */
class BoilerplateScrubSpec extends SparkTestBase {
  import spark.implicits._

  // 10 one-word tokens = exactly one segment-line per block
  private def line(w: String): String = Seq.fill(10)(w).mkString(" ")

  test("boilerplate removal: same-source df>=2 removed everywhere, cross-source kept") {
    val banner = line("banner")
    val docs = Seq(
      // source A: banner appears in docs 1 and 2 → removed from both
      (1L, "A", s"$banner ${line("uniq1")}"),
      (2L, "A", s"$banner ${line("uniq2")}"),
      // source B: same banner text, ONE doc → kept (df=1 within B)
      (3L, "B", s"$banner ${line("uniq3")}"),
      // source B: intra-doc repetition only → kept (1 distinct doc)
      (4L, "B", s"${line("rep")} ${line("rep")}")
    ).toDF("doc_id", "source", "text")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val dir = java.nio.file.Files.createTempDirectory("graft-bp").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val out = SparkEntry.queries("line_boilerplate_scrub")(spark, dir)
      .select($"doc_id", $"n_lines", $"n_kept", $"kept_text")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

    assert(out(1L) === ((2L, 1L, line("uniq1"))),
      "banner must be removed from doc 1 (its FIRST occurrence)")
    assert(out(2L) === ((2L, 1L, line("uniq2"))))
    assert(out(3L) === ((2L, 2L, s"$banner ${line("uniq3")}")),
      "cross-source single occurrence is not boilerplate")
    assert(out(4L) === ((2L, 2L, s"${line("rep")} ${line("rep")}")),
      "intra-doc repetition alone (df = 1) is not boilerplate")
  }
}
