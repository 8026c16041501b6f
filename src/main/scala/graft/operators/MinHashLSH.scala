package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + banded LSH near-duplicate detection.
  *
  * Scale path for "find all document pairs with n-gram Jaccard ≥ τ"
  * without the O(n²) cross join:
  *   shingle → 64 minhash signatures → `Bands` bands of `RowsPerBand`
  *   → band-bucket self-join (only colliding docs pair up) → exact
  *   Jaccard verification on the candidates.
  *
  * With 16 bands × 4 rows, a pair with true Jaccard j collides with
  * probability 1 − (1 − j⁴)¹⁶ (≈ 1 − 3.5e-10 at j = 0.93), so for
  * near-dup thresholds the candidate set equals the true pair set and
  * the verify stage makes the result EXACT — the brute-force oracle
  * and this plan agree.
  *
  * Shuffle profile: one exchange to build buckets, one self-join on
  * (band, bucket) — both keyed, both AQE-skew-splittable. At 100 TB,
  * giant buckets (boilerplate docs) would be capped/salted; the
  * verify join touches only candidate pairs.
  *
  * All hashing is deterministic: xxhash64 on shingles, then 64 fixed
  * affine transforms (wraparound arithmetic — consistency is what
  * LSH needs, not modular-prime purity).
  */
object MinHashLSH {

  val NumHashes = 64
  val Bands = 16
  val RowsPerBand: Int = NumHashes / Bands

  /** Adds `grams` — distinct HASHED word n-gram shingles of `textCol`
    * (array<bigint>, sorted), tokens split on single spaces. Word
    * shingles (not char shingles) are the load-bearing choice: on a
    * corpus with a small shared vocabulary, char-3-gram Jaccard
    * between UNRELATED docs runs ~0.5 and every LSH band collides
    * (measured: 5M candidate pairs on 5k docs); word-trigram Jaccard
    * for the same corpus is ≤ 0.07 for non-dups vs ≥ 0.9 for dups.
    * Hashing shingles keeps every downstream payload at 8
    * bytes/shingle; set algebra on hashes equals set algebra on the
    * strings up to 64-bit collisions (~2⁻⁶⁵ per pair).
    */
  def withShingles(df: DataFrame, textCol: String, n: Int = 3): DataFrame =
    df.withColumn("grams",
      graft.functions.VectorExpressions.tokenNgramHashes(split(col(textCol), " "), n))

  /** Adds `minhashes: array<bigint>` (length NumHashes), all
    * signatures computed in one fused pass over the shingle hashes.
    */
  def withMinHashes(df: DataFrame): DataFrame =
    df.withColumn("minhashes",
      graft.functions.VectorExpressions.minHashSigs(col("grams"), NumHashes))

  /** Candidate pairs (id_a < id_b) from banded bucket collisions.
    *
    * @param bucketCap drop (band, bucket) groups larger than this
    *   before pairing — the 100 TB guardrail against boilerplate
    *   buckets whose |bucket|² pair blow-up would dominate the job.
    *   Capped buckets mean those docs collide in OTHER bands with
    *   near-certainty for true near-dups, so recall loss is
    *   negligible; None = no cap (exact candidate set). When the cap
    *   ENGAGES it is not silent: the number of pruned (doc, band)
    *   rows is published as the `graft_lsh_bucket_cap` observed
    *   metric (CollectMetrics — visible to QueryExecutionListeners
    *   and the Spark UI, zero plan-shape cost).
    */
  def candidatePairs(df: DataFrame, idCol: String,
      bucketCap: Option[Int] = None): DataFrame = {
    val bands = df.select(
      col(idCol),
      posexplode(expr(
        s"transform(sequence(0, ${Bands - 1}), b -> hash(slice(minhashes, b * $RowsPerBand + 1, $RowsPerBand)))"))
        .as(Seq("band", "bucket")))
    val pruned = bucketCap match {
      case Some(cap) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("band"), col("bucket"))
        bands.withColumn("_bsize", count(lit(1)).over(w))
          .observe("graft_lsh_bucket_cap",
            sum(when(col("_bsize") > cap, 1L).otherwise(0L)).as("dropped_rows"))
          .filter(col("_bsize") <= cap).drop("_bsize")
      case None => bands
    }
    pruned.as("x").join(pruned.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("id_a"), col(s"y.$idCol").as("id_b"))
      .distinct()
  }

  /** Full pipeline: near-dup pairs with Jaccard ≥ threshold —
    * EXACT BELOW THE CAP: while no (band, bucket) group exceeds
    * `bucketCap` the result is the exact brute-force pair set (the
    * banding argument in the object scaladoc); once the cap engages,
    * pairs whose every agreeing band is over-cap are dropped, and the
    * `graft_lsh_bucket_cap` observed metric reports the pruned rows.
    * Output: (id_a, id_b, jaccard) — jaccard as exact |∩| / |∪|
    * double.
    *
    * Exact-duplicate collapse (the web-corpus scale shape, same trick
    * as SimHash's distinct-signature pairing): docs with IDENTICAL
    * shingle sets — boilerplate and mirror pages come in clusters of
    * thousands — are collapsed to one min-id representative before
    * banding, so a clone cluster contributes ONE row to the quadratic
    * candidate stage instead of |cluster|² collisions in every band.
    * Pairs re-expand at output: within a cluster (Jaccard exactly 1)
    * and across paired clusters (Jaccard is a set function, so every
    * member pair inherits the representatives' value). Output is
    * identical to the uncollapsed pipeline.
    */
  def nearDupPairs(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, k: Int = 3,
      bucketCap: Option[Int] = Some(100000)): DataFrame = {
    val (verified, members, _) = collapsedCore(docs, idCol, textCol, threshold, k, bucketCap)
    // Re-expand: cross-cluster pairs inherit the representatives'
    // jaccard; within-cluster pairs are exact duplicates (jaccard 1).
    // Both joins are keyed on gkey — output-sized work.
    val cross = verified
      .join(members.select(col("gkey").as("gkey_a"), col(idCol).as("_ida")), "gkey_a")
      .join(members.select(col("gkey").as("gkey_b"), col(idCol).as("_idb")), "gkey_b")
      .select(
        least(col("_ida"), col("_idb")).as("id_a"),
        greatest(col("_ida"), col("_idb")).as("id_b"),
        col("jaccard"))
    val within = members.as("p").join(members.as("q"),
        col("p.gkey") === col("q.gkey") && col(s"p.$idCol") < col(s"q.$idCol"))
      .filter(lit(1.0) >= threshold)
      .select(col(s"p.$idCol").as("id_a"), col(s"q.$idCol").as("id_b"),
        lit(1.0).as("jaccard"))
    cross.unionByName(within)
  }

  /** The COLLAPSED near-dup graph — for graph-stage consumers
    * (connected components, canonical selection) that would otherwise
    * feed on the re-expanded pair set, where a clone cluster of c
    * docs contributes c²/2 within-pairs (24.7M edges on the ×100
    * probe corpus — the whole cost of `dedup_clusters` there).
    *
    * Returns:
    *   - repPairs (id_a, id_b, jaccard): verified near-dup pairs
    *     BETWEEN representatives (min-id doc of each distinct shingle
    *     set) — the quotient graph's edges;
    *   - groups (rep_id, member_id): every surviving doc mapped to
    *     its clone-group representative (reps map to themselves).
    *
    * Exactness: the expanded graph's components are exactly the
    * member-unions of the quotient graph's components (in-group pairs
    * connect members to their rep; a cross pair between groups
    * expands to all member pairs, adding no connectivity beyond the
    * rep edge). min-id labels agree too: each rep IS its group's min
    * id, so min over a quotient component's reps = min over the
    * expanded component's members.
    */
  def nearDupGraph(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, k: Int = 3,
      bucketCap: Option[Int] = Some(100000)): (DataFrame, DataFrame) = {
    val (verified, members, reps) = collapsedCore(docs, idCol, textCol, threshold, k, bucketCap)
    // reps is the checkpointed (gkey, min-id, grams) table the core
    // already built — no re-aggregation of members needed.
    val repId = reps.select(col("gkey"), col(idCol).as("rep_id"))
    val repPairs = verified
      .join(repId.select(col("gkey").as("gkey_a"), col("rep_id").as("id_a")), "gkey_a")
      .join(repId.select(col("gkey").as("gkey_b"), col("rep_id").as("id_b")), "gkey_b")
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"), col("jaccard"))
    val groups = members.join(repId, "gkey")
      .select(col("rep_id"), col(idCol).as("member_id"))
    (repPairs, groups)
  }

  /** Shared collapse + band + verify stages: returns
    * (verified rep-level pairs keyed by gkey, members (gkey, id),
    * reps (gkey, min-id, grams) — both checkpointed).
    *
    * Docs with fewer than k tokens have an empty shingle set: their
    * minhash signatures are all-identical sentinels (every such pair
    * collides in every band — a quadratic clique) and their Jaccard
    * is 0/0. Dropped before banding; the oracles mirror the filter.
    */
  private def collapsedCore(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, k: Int,
      bucketCap: Option[Int]): (DataFrame, DataFrame, DataFrame) = {
    val shingled = withShingles(docs.select(col(idCol), col(textCol)), textCol, k)
      .filter(size(col("grams")) > 0)
      // 64-bit key of the (sorted, distinct) shingle set; docs sharing
      // it have equal gram sets up to hash collision (~2⁻⁶⁴ per pair —
      // the same collision contract as the hashed shingles themselves).
      .withColumn("gkey", xxhash64(col("grams")))
    // Materialized once: members (2 longs/doc) is joined twice in the
    // expansion and once against itself; reps feeds banding + verify.
    // Without the checkpoint each reference would re-run the shingle
    // kernel over the corpus.
    val members = shingled.select(col("gkey"), col(idCol)).localCheckpoint(true)
    val reps = shingled
      .groupBy(col("gkey"))
      .agg(min_by(struct(col(idCol), col("grams")), col(idCol)).as("_r"))
      .select(col("gkey"), col(s"_r.$idCol").as(idCol), col("_r.grams").as("grams"))
      .localCheckpoint(true)

    val grams = withMinHashes(reps)
    val repPairs = candidatePairs(grams, idCol, bucketCap)
    val gOnly = grams.select(col(idCol), col("grams"), col("gkey"))
    val verified = repPairs
      .join(gOnly.select(col(idCol).as("id_a"), col("grams").as("grams_a"),
        col("gkey").as("gkey_a")), "id_a")
      .join(gOnly.select(col(idCol).as("id_b"), col("grams").as("grams_b"),
        col("gkey").as("gkey_b")), "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("grams_a"), col("grams_b"))).cast("double") /
          size(array_union(col("grams_a"), col("grams_b"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("gkey_a"), col("gkey_b"), col("jaccard"))
    (verified, members, reps)
  }
}
