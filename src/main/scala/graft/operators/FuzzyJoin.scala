package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate-string self-join (record linkage / fuzzy dedup,
  * SURVEY.md §2 C28): all pairs of DISTINCT values of a string
  * column within edit distance `maxDist`.
  *
  * Scale shape, in order:
  *   1. VOCABULARY COLLAPSE — pair the distinct value domain, not
  *      the corpus: entity names repeat heavily, so |V| ≪ |rows|
  *      (the same move as MinHashLSH's clone collapse).
  *   2. Q-GRAM COUNT FILTER (Gravano et al., VLDB 2001) — two
  *      strings within edit distance k share, as a MULTISET, at
  *      least max(|a|,|b|) − q + 1 − k·q of their q-grams. Grams are
  *      counted per name (one groupBy), candidates come from a keyed
  *      equi-join on the gram with Σ min(cntA, cntB) ≥ bound — never
  *      a cross join, and the filter is COMPLETE: it cannot drop a
  *      true pair.
  *   3. EXACT VERIFY — `levenshtein` on the candidates only.
  *
  * Strings too short for the bound to bite (|s| ≤ q − 1 + k·q) are
  * paired directly among themselves (a bounded bucket); a short-long
  * pair past that threshold has dist ≥ |b| − |a| > k by construction
  * (for q ≥ 2), so the gram path covers it or it is no pair at all.
  *
  * Output: (name_a < name_b, dist) — exact, verified; the DuckDB
  * O(|V|²) levenshtein join is the oracle specification.
  */
object FuzzyJoin {

  def editDistancePairs(df: DataFrame, strCol: String, maxDist: Int,
      q: Int = 2): DataFrame = {
    require(q >= 2, "q >= 2 (q=1 breaks the short/long completeness argument)")
    require(maxDist >= 1, "maxDist >= 1")
    val shortMax = q - 1 + maxDist * q // bound can reach 0 up to this length

    val names = df.select(col(strCol).as("name")).distinct()
      .withColumn("len", length(col("name")))

    // ---- short bucket: direct pairing (bounded: |s| ≤ shortMax) ----
    val short = names.filter(col("len") <= shortMax)
    val shortPairs = short.as("a").join(short.as("b"),
        col("a.name") < col("b.name") &&
          abs(col("a.len") - col("b.len")) <= maxDist)
      .select(col("a.name").as("name_a"), col("b.name").as("name_b"))

    // ---- gram path: multiset q-gram counts per name ----
    val grams = names.filter(col("len") >= q)
      .select(col("name"), col("len"),
        explode(expr(
          s"transform(sequence(1, length(name) - $q + 1), i -> substring(name, i, $q))"))
          .as("gram"))
      .groupBy(col("name"), col("len"), col("gram"))
      .agg(count(lit(1)).as("cnt"))
    val cand = grams.as("a").join(grams.as("b"),
        col("a.gram") === col("b.gram") &&
          col("a.name") < col("b.name") &&
          abs(col("a.len") - col("b.len")) <= maxDist)
      .groupBy(col("a.name").as("name_a"), col("b.name").as("name_b"),
        col("a.len").as("la"), col("b.len").as("lb"))
      .agg(sum(least(col("a.cnt"), col("b.cnt"))).as("shared"))
      .filter(col("shared") >=
        greatest(col("la"), col("lb")) - lit(q - 1) - lit(maxDist * q))
      // pairs with both sides short are already covered by the
      // direct bucket — keep the paths disjoint
      .filter(greatest(col("la"), col("lb")) > shortMax)
      .select(col("name_a"), col("name_b"))

    // ---- exact verify ----
    shortPairs.unionByName(cand)
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= maxDist)
  }
}
