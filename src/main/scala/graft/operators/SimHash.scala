package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  * Everything is native expression work (fused token hashing, bit ops,
  * higher-order folds) — codegen'd, no UDFs; signatures are 8 bytes
  * per doc so the self-join shuffles narrow rows at 100 TB.
  */
object SimHash {

  /** Adds `simhash: bigint` computed from whitespace tokens of
    * lower(text).
    */
  def withSimHash(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("simhash",
      graft.functions.VectorExpressions.simHash64(
        split(lower(col(textCol)), "\\s+")))

  /** Pairs (id_a < id_b) with Hamming distance ≤ maxHamming (≤ 3 for
    * the 4-block scheme to be exact).
    */
  def nearDupPairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4-block pigeonhole is exact only for hamming <= 3")
    val sigs = withSimHash(docs.select(col(idCol), col(textCol)), textCol)
      .select(col(idCol), col("simhash"))
    val blocks = sigs.select(
      col(idCol), col("simhash"),
      posexplode(expr(
        "transform(sequence(0, 3), b -> (simhash >> (b * 16)) & 65535L)"))
        .as(Seq("block", "block_val")))
    blocks.as("x").join(blocks.as("y"),
        col("x.block") === col("y.block") && col("x.block_val") === col("y.block_val") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .select(
        col(s"x.$idCol").as("id_a"), col(s"y.$idCol").as("id_b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
