package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BPE-style merge-vocabulary training over word sequences — the
  * tokenizer-training step of an LLM data pipeline (Sennrich et al.
  * 2016, word-pair variant). Each round is one corpus-wide pass:
  * count adjacent token pairs (fused `TokenPairs` kernel — no
  * interpreted lambda, map-side-combined counts), take the most
  * frequent pair, and fuse every non-overlapping occurrence
  * left-to-right into a single merged token.
  *
  * The merge application is ONE literal string replace per round over
  * a sentinel-bracketed encoding: each token is wrapped
  * `<SOH>tok<STX>`, so the pattern `<SOH>w1<STX><SOH>w2<STX>`
  * can only match whole-token-adjacent occurrences (never inside a
  * token), and literal replace's left-to-right non-overlapping scan
  * IS the greedy BPE merge order — the same semantics in any engine
  * with a standard `replace`, which is what makes the training loop
  * closed-form replayable in an external SQL oracle (the
  * `kmeans_iterations` trick, applied to tokenization).
  *
  * Scale posture: each round is a pair-count aggregation (map-side
  * combine; the exchange carries distinct-pair partials, not tokens)
  * plus a map-only merge pass. Only the single top pair ever reaches
  * the driver (`limit(1)` — the "broadcast merge" is a literal in the
  * next round's expression). The re-tokenized corpus is
  * materialized per round (localCheckpoint here; a persisted table in
  * production) so round r is one pass, not a replay of rounds 1..r−1.
  */
object BpeMerge {

  private val TokStart = "\u0001"
  private val TokEnd = "\u0002"

  /** One learned merge: after `step` rounds the pair (w1, w2) —
    * occurring `nPairs` times adjacently — becomes token "w1 w2".
    */
  case class LearnedMerge(step: Int, w1: String, w2: String, nPairs: Long)

  /** Train `rounds` merges over `docs` (must carry an array column
    * `toks`); returns the learned merge table and the corpus
    * re-tokenized under all merges. Stops early if no adjacent pair
    * remains.
    *
    * The U+0001/U+0002 sentinels are reserved: a token containing
    * them would encode ambiguously (the single token "a<STX><SOH>b" is
    * byte-identical to the adjacent tokens ["a","b"]), so they are
    * stripped from every token up front — a map-only pass, and a
    * no-op on any normalized text corpus (control chars never
    * survive tokenization).
    */
  def train(docs: DataFrame, rounds: Int): (Seq[LearnedMerge], DataFrame) = {
    var cur = docs.withColumn("toks",
      transform(col("toks"), t => translate(t, TokStart + TokEnd, "")))
    val merges = Seq.newBuilder[LearnedMerge]
    var step = 1
    var exhausted = false
    while (step <= rounds && !exhausted) {
      val top = cur
        .filter(size(col("toks")) >= 2)
        .select(explode(
          graft.functions.VectorExpressions.tokenPairs(col("toks"))).as("p"))
        .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("w1"), col("w2"))
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val (w1, w2, n) =
          (top.head.getString(0), top.head.getString(1), top.head.getLong(2))
        merges += LearnedMerge(step, w1, w2, n)
        val pat = TokStart + w1 + TokEnd + TokStart + w2 + TokEnd
        val rep = TokStart + w1 + " " + w2 + TokEnd
        val enc = concat(
          lit(TokStart), array_join(col("toks"), TokEnd + TokStart),
          lit(TokEnd))
        val merged = split(
          expr("substring(_enc, 2, length(_enc) - 2)"), TokEnd + TokStart)
        // <2-token docs can't contain a pair: leave them untouched
        // rather than round-tripping through the encoding (an empty
        // array would come back as [""]).
        cur = cur
          .withColumn("_enc", replace(enc, lit(pat), lit(rep)))
          .withColumn("toks",
            when(size(col("toks")) >= 2, merged).otherwise(col("toks")))
          .drop("_enc")
          .localCheckpoint()
        step += 1
      }
    }
    (merges.result(), cur)
  }
}
