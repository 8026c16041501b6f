package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * When one join key carries a disproportionate share of rows (the
  * classic hot-key problem at 100 TB), a plain shuffle join puts the
  * whole hot key in one task. Salting splits it: the skewed (big)
  * side scatters each row into one of `buckets` sub-keys via a
  * deterministic hash of a disambiguator column; the small side is
  * replicated across all sub-keys. Same result set, `buckets`-way
  * parallelism for every key.
  *
  * AQE's skew-join splitting handles sort-merge cases adaptively;
  * this operator is the explicit form for when the optimizer can't
  * (e.g. aggregation-free pipelines, or pre-partitioning for a
  * downstream stage).
  */
object SkewJoin {

  /** @param scatterCol big-side column whose hash scatters rows
    *                   (any column; determinism follows from it).
    */
  def saltedInnerJoin(big: DataFrame, small: DataFrame, key: String,
      scatterCol: String, buckets: Int = 8): DataFrame = {
    val salted = big.withColumn("_salt", pmod(hash(col(scatterCol)), lit(buckets)))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "_salt"), "inner").drop("_salt")
  }
}
