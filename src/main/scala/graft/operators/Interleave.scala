package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Balanced interleaving (Joachims, SIGKDD 2002 — the online-eval
  * primitive behind every "which ranker is better for REAL users"
  * A/B: one merged list alternates picks from two rankings, clicks
  * credit the ranking that contributed the clicked result).
  * Deterministic variant: ranking A ALWAYS opens (no coin flip —
  * the engines must agree bit-for-bit; the position-bias caveat is
  * the caller's to randomize per impression at serving time).
  *
  * Semantics per turn t = 1, 2, …: side A on odd turns, B on even;
  * the turn's side contributes its highest-ranked NOT-YET-PICKED
  * result; an exhausted side's turn is filled by the other side, so
  * turn number = output position. The process is inherently
  * sequential (a closed-form priority sort provably disagrees once
  * duplicates skip), so it runs as a bounded per-query fold over the
  * two ≤k arrays — never a shuffle.
  *
  * The fold state is ONE array<long> with source encoded in the low
  * bit (id·2 + 0 for A, id·2 + 1 for B) — decode with
  * [[decodeId]]/[[decodeSrc]]. Requires non-negative ids below 2^62
  * (the encode multiplies by 2); the decode is exact integer
  * arithmetic (arithmetic shift = floor division by 2, matching the
  * oracle's `// 2`) for ALL longs — no double-precision bound.
  */
object Interleave {

  /** Encoded merged list for two ordered id arrays (bounded: folds
    * size(a)+size(b) turns).
    */
  def merged(a: Column, b: Column): Column = {
    def notPicked(side: Column, acc: Column): Column =
      filter(side, x => !array_contains(transform(acc,
        y => shiftright(y, 1)), x))
    aggregate(
      sequence(lit(1), size(a) + size(b)),
      array().cast("array<long>"),
      (acc, _) => {
        val ra = notPicked(a, acc)
        val rb = notPicked(b, acc)
        val pickA = (size(acc) % 2 === 0 && size(ra) > 0) || size(rb) === 0
        when(size(ra) === 0 && size(rb) === 0, acc)
          .when(pickA, concat(acc, array(element_at(ra, 1) * 2)))
          .otherwise(concat(acc, array(element_at(rb, 1) * 2 + 1)))
      })
  }

  def decodeId(e: Column): Column = shiftright(e, 1)

  def decodeSrc(e: Column, aName: String, bName: String): Column =
    when(e % 2 === 0, aName).otherwise(bName)
}
