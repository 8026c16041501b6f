package graft

import org.apache.spark.sql.functions._

/** bloom_dedup_index (C80) on a corpus with PLANTED true duplicates —
  * the sf tables have none across the historical/incoming split, so
  * the oracle gate's truth side (n_true_dup) is zero there; this spec
  * exercises it and pins the filter's no-false-negative guarantee.
  */
class BloomIndexSpec extends SparkTestBase {
  import spark.implicits._

  test("planted historical duplicate is a true dup AND bloom-flagged (no false negative)") {
    // ids 0..20: t = max/2 = 10, so 0..9 historical, 10..20 incoming;
    // doc 15 repeats historical doc 3's text verbatim, doc 16 repeats
    // it with different whitespace (normalization must catch it)
    val docs = (0 to 20).map { i =>
      val text = i match {
        case 15 => "the quick brown fox three"
        case 16 => "  the   quick brown fox three "
        case 3 => "the quick brown fox three"
        case _ => s"unique document number $i with filler words"
      }
      (i.toLong, text, "en", if (i < 10) "hist" else "inc", text.length.toLong)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-bloom").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val out = SparkEntry.queries("bloom_dedup_index")(spark, dir)
      .select($"source", $"n_incoming", $"n_flagged", $"n_true_dup", $"n_false_pos")
      .as[(String, Long, Long, Long, Long)].collect().toMap2

    val (nInc, nFlag, nDup, nFp) = out("inc")
    assert(nInc === 11L)
    assert(nDup === 2L, s"expected docs 15 and 16 as true dups, got $nDup")
    // no false negatives: every true dup is flagged, so flagged >= dups
    assert(nFlag >= nDup, s"false negative: flagged=$nFlag < dups=$nDup")
    assert(nFp === nFlag - nDup)
  }

  private implicit class Map2[A](rows: Array[(String, A, A, A, A)]) {
    def toMap2: Map[String, (A, A, A, A)] =
      rows.map { case (k, a, b, c, d) => k -> ((a, b, c, d)) }.toMap
  }
}
