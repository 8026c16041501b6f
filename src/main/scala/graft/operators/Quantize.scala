package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Symmetric int8 embedding quantization — the storage-scale operator
  * for embedding columns: 4 bytes/dim float32 → 1 byte/dim code plus
  * one scale per vector (~4× smaller scans for ANN/dedup candidate
  * stages; exact rerank dequantizes candidates only).
  *
  * Per vector: scale = max|v_i| / 127; code_i = floor(v_i/scale + 0.5)
  * ∈ [−127, 127]; dequantized value = code_i · scale, so the
  * reconstruction error is bounded by scale/2 per dimension.
  *
  * Everything is deterministic IEEE arithmetic (floor-based
  * round-half-up, no locale/HALF_EVEN ambiguity), so an external
  * engine computing the same formula matches bit-for-bit — see the
  * `embed_quantize_int8` query (VectorQueries), whose scale/code
  * aggregates and error bound are DuckDB-oracle-checked, and
  * [[VectorOps.ivfTopKInt8]], which runs its ANN candidate stage on
  * the quantized image with exact rerank (QuantizeSpec pins both).
  * The lambdas here run as interpreted higher-order functions; on a
  * true 100 TB scan the same formulas would move into a fused codegen
  * kernel like `VectorExpressions.arrayDot` (same contract, one
  * pass).
  */
object Quantize {

  private val Levels = 127

  /** Adds `q_scale: double` and `q_codes: array<bigint>` (values in
    * [−127, 127] — cast to byte at the storage boundary).
    */
  def quantizeInt8(df: DataFrame, vecCol: String): DataFrame =
    df.withColumn("_v", col(vecCol).cast("array<double>"))
      .withColumn("q_scale",
        greatest(array_max(transform(col("_v"), x => abs(x))), lit(1e-30)) / Levels)
      .withColumn("q_codes",
        transform(col("_v"), x => floor(x / col("q_scale") + lit(0.5))))
      .drop("_v")

  /** Reconstructs the (lossy) vector from codes + scale. */
  def dequantize(codes: Column, scale: Column): Column =
    transform(codes, c => c * scale)
}
