package graft

import org.apache.spark.sql.functions._

/** streaming_minhash_sources' merge-schedule independence: the
  * streamed complete-mode snapshot must equal the BATCH MinHash
  * aggregate on the same table — each signature slot is a MIN over a
  * set (a lattice), so per-batch state merges cannot change the
  * result. The oracle gate pins the streamed rows against the fmix64
  * replay; this spec pins stream ≡ batch within the engine, and that
  * every source carries a complete 16-slot signature.
  */
class StreamingMinhashSpec extends SparkTestBase {
  import spark.implicits._

  test("streamed per-source minhash signatures equal the batch aggregate") {
    val streamed = SparkEntry.queries("streaming_minhash_sources")(spark, sfDir)
      .select($"source", $"sig_idx", $"min_hash")
      .as[(String, Int, Long)].collect().toSet

    val batch = GraftSession.table(spark, sfDir, "documents")
      .select($"source",
        explode(graft.functions.TextFunctions.wsTokens($"text")).as("tok"))
      .filter(length($"tok") > 0)
      .select($"source", explode(sequence(lit(0), lit(15))).as("sig_idx"),
        graft.functions.Fingerprint64.fingerprint64($"tok").as("th"))
      .groupBy($"source", $"sig_idx")
      .agg(min(graft.functions.Fingerprint64.fmix64(
        $"th".bitwiseXOR($"sig_idx".cast("long") * lit(2654435761L))))
        .as("min_hash"))
      .as[(String, Int, Long)].collect().toSet

    assert(streamed === batch)
    assert(streamed.groupBy(_._1).forall(_._2.size == 16),
      "every source must carry a complete 16-slot signature")
    assert(streamed.groupBy(_._1).size > 1, "gate needs multiple sources")
  }
}
