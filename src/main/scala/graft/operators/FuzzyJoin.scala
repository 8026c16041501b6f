package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-string self-join (record linkage / fuzzy dedup,
  * SURVEY.md §2 C28): all pairs of DISTINCT values of a string
  * column within edit distance `maxDist`.
  *
  * Scale shape, in order:
  *   1. VOCABULARY COLLAPSE — pair the distinct value domain, not
  *      the corpus: entity names repeat heavily, so |V| ≪ |rows|
  *      (the same move as MinHashLSH's clone collapse).
  *   2. PREFIX FILTER (Chaudhuri et al., ICDE 2006 / ED-Join) — the
  *      candidate join keys on each name's (k·q + 1) globally RAREST
  *      gram occurrences, not on every gram. Two strings within edit
  *      distance k can each lose at most k·q gram occurrences from
  *      their multiset overlap, so under any fixed total order their
  *      (k·q + 1)-prefixes must share an element — completeness is
  *      preserved, while high-document-frequency grams ("an" shared
  *      by f names would otherwise produce f² join rows on ONE key)
  *      never reach the exchange: the hottest join keys are by
  *      construction the rarest grams.
  *   3. Q-GRAM COUNT FILTER (Gravano et al., VLDB 2001) — two
  *      strings within edit distance k share, as a MULTISET, at
  *      least max(|a|,|b|) − q + 1 − k·q of their q-grams. Applied to
  *      the (already small) candidate set via per-name gram-count
  *      maps; COMPLETE: it cannot drop a true pair.
  *   4. EXACT VERIFY — `levenshtein` on the survivors only.
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

    // ---- gram path: prefix-filtered candidates + count filter ----
    val cand = gramCandidates(names, maxDist, q)

    // ---- exact verify ----
    shortPairs.unionByName(cand)
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= maxDist)
  }

  /** Candidate pairs for the long-string path: prefix-filtered join +
    * Gravano count filter, BEFORE levenshtein verification. Exposed
    * package-private so specs can bound the candidate count on
    * pathological shared-gram corpora.
    */
  private[graft] def gramCandidates(names: DataFrame, maxDist: Int,
      q: Int): DataFrame = {
    val shortMax = q - 1 + maxDist * q
    val prefixLen = maxDist * q + 1

    // Multiset q-gram counts per name: (name, len, gram, cnt).
    val grams = names.filter(col("len") >= q)
      .select(col("name"), col("len"),
        explode(expr(
          s"transform(sequence(1, length(name) - $q + 1), i -> substring(name, i, $q))"))
          .as("gram"))
      .groupBy(col("name"), col("len"), col("gram"))
      .agg(count(lit(1)).as("cnt"))

    // Global rarity = number of distinct names containing the gram
    // (grams has one row per (name, gram)). Gram-domain sized.
    val gramDf = grams.groupBy(col("gram")).agg(count(lit(1)).as("gdf"))

    // Occurrence-tagged elements ((g,1), (g,2), … makes the multiset a
    // set), ranked per name under the fixed total order (rarity, gram,
    // occurrence). The per-name window is O(|name|) rows — small
    // groups at any corpus size. Only the prefix joins.
    val prefix = grams.join(gramDf, "gram")
      .select(col("name"), col("len"), col("gram"), col("gdf"),
        explode(expr("sequence(CAST(1 AS BIGINT), cnt)")).as("occ"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("name")).orderBy(col("gdf"), col("gram"), col("occ"))))
      .filter(col("rk") <= prefixLen)
      .select(col("name"), col("len"), col("gram"), col("occ"))

    val candPairs = prefix.as("a").join(prefix.as("b"),
        col("a.gram") === col("b.gram") && col("a.occ") === col("b.occ") &&
          col("a.name") < col("b.name") &&
          abs(col("a.len") - col("b.len")) <= maxDist)
      .select(col("a.name").as("name_a"), col("b.name").as("name_b"),
        col("a.len").as("la"), col("b.len").as("lb"))
      .distinct()
      // pairs with both sides short are already covered by the
      // direct bucket — keep the paths disjoint
      .filter(greatest(col("la"), col("lb")) > shortMax)

    // Count filter on the surviving candidates: shared multiset grams
    // Σ min(cntA, cntB) ≥ max(la,lb) − q + 1 − k·q. Per-name gram maps
    // are O(|name|) payloads; the HOF runs on candidate-sized rows
    // only (interpreted HOFs are fine off the corpus hot path).
    val gmapA = grams.groupBy(col("name")).agg(
      map_from_entries(collect_list(struct(col("gram"), col("cnt")))).as("gm"))
    val gmapB = gmapA.select(col("name").as("nb"), col("gm").as("gmb"))

    candPairs
      .join(gmapA.select(col("name").as("na"), col("gm").as("gma")),
        col("name_a") === col("na"))
      .join(gmapB, col("name_b") === col("nb"))
      .withColumn("shared", expr(
        """aggregate(map_entries(gma), CAST(0 AS BIGINT),
          |  (acc, e) -> acc + least(e.value, coalesce(element_at(gmb, e.key), CAST(0 AS BIGINT))))""".stripMargin))
      .filter(col("shared") >=
        greatest(col("la"), col("lb")) - lit(q - 1) - lit(maxDist * q))
      .select(col("name_a"), col("name_b"))
  }
}
