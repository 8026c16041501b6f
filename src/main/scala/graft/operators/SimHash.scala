package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** 64-bit SimHash near-duplicate detection.
  *
  * simhash(doc) packs, for each of 64 bit positions, the sign of
  * Σ_tokens (±1 by that token's hash bit). Near-dups have small
  * Hamming distance between signatures. Candidate generation uses the
  * pigeonhole principle: split 64 bits into 4 × 16-bit blocks — any
  * pair at Hamming ≤ 3 must agree exactly on ≥ 1 block, so a
  * block-value self-join finds all such pairs without O(n²).
  *
  * Scale design (the 100 TB shape):
  *   1. pairing runs over DISTINCT signatures, not documents — exact
  *      duplicates (common in web corpora) collapse before the
  *      quadratic step and re-expand only at output;
  *   2. the Hamming filter is applied in the same stage as the
  *      block-collision join, BEFORE any distinct/exchange, so the
  *      |bucket|² collision blow-up is streamed through codegen and
  *      never shuffled;
  *   3. (block, block_val) buckets larger than `blockCap` are dropped
  *      — on a shared-vocabulary corpus 16-bit blocks collide
  *      massively; a capped bucket loses a true pair only if ALL of
  *      its agreeing blocks are over the cap. The result is exact
  *      below the cap; when the cap engages, the pruned row count is
  *      published as the `graft_simhash_block_cap` observed metric
  *      rather than vanishing silently.
  *
  * Everything is native expression work (fused token hashing, bit ops)
  * — codegen'd, no UDFs; signatures are 8 bytes per doc so the
  * self-join shuffles narrow rows at 100 TB.
  */
object SimHash {

  /** Adds `simhash: bigint` computed from whitespace tokens of
    * lower(trim(text)).
    */
  def withSimHash(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("simhash",
      graft.functions.VectorExpressions.simHash64(
        split(lower(trim(col(textCol))), "\\s+")))

  /** Pairs (id_a < id_b) with Hamming distance ≤ maxHamming (≤ 3 for
    * the 4-block scheme to be exact).
    */
  def nearDupPairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, blockCap: Option[Int] = Some(10000)): DataFrame = {
    require(maxHamming <= 3, "4-block pigeonhole is exact only for hamming <= 3")
    val sigs = withSimHash(docs.select(col(idCol), col(textCol)), textCol)
      .select(col(idCol), col("simhash"))

    // Quadratic work happens on unique signatures only.
    val uniq = sigs.select(col("simhash")).distinct()
    val blocks = uniq.select(
      col("simhash"),
      posexplode(expr(
        "transform(sequence(0, 3), b -> (simhash >> (b * 16)) & 65535L)"))
        .as(Seq("block", "block_val")))
    val pruned = blockCap match {
      case Some(cap) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("block"), col("block_val"))
        blocks.withColumn("_bsize", count(lit(1)).over(w))
          .observe("graft_simhash_block_cap",
            sum(when(col("_bsize") > cap, 1L).otherwise(0L)).as("dropped_rows"))
          .filter(col("_bsize") <= cap).drop("_bsize")
      case None => blocks
    }
    // Hamming predicate INSIDE the join stage: collisions that fail it
    // die in codegen before the dedup exchange.
    val sigPairs = pruned.as("x").join(pruned.as("y"),
        col("x.block") === col("y.block") &&
          col("x.block_val") === col("y.block_val") &&
          col("x.simhash") < col("y.simhash") &&
          bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))) <= maxHamming)
      .select(
        col("x.simhash").as("sig_a"), col("y.simhash").as("sig_b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
      .distinct()

    // Re-expand signature pairs to document pairs.
    val cross = sigPairs
      .join(sigs.select(col(idCol).as("_ida"), col("simhash").as("sig_a")), "sig_a")
      .join(sigs.select(col(idCol).as("_idb"), col("simhash").as("sig_b")), "sig_b")
      .select(
        least(col("_ida"), col("_idb")).as("id_a"),
        greatest(col("_ida"), col("_idb")).as("id_b"),
        col("hamming"))
    // Documents sharing an identical signature (hamming 0) pair within
    // their group; this is output-sized work, not a candidate blow-up.
    val within = sigs.as("p").join(sigs.as("q"),
        col("p.simhash") === col("q.simhash") &&
          col(s"p.$idCol") < col(s"q.$idCol"))
      .select(
        col(s"p.$idCol").as("id_a"), col(s"q.$idCol").as("id_b"),
        lit(0).as("hamming"))
    cross.unionByName(within)
  }
}
