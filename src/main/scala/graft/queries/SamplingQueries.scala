package graft.queries

import graft.GraftSession.table
import graft.functions.BottomKSample
import org.apache.spark.sql.functions._

/** Deterministic sampling queries (SURVEY.md §2 B34, C33): the
  * bottom-k sketch promoted to a full DuckDB oracle row, and
  * target-proportional corpus rebalancing — the "data mixing" step of
  * a training pipeline (sample over-represented languages down to an
  * equal share, reproducibly).
  *
  * Both rest on hashes BOTH engines compute bit-identically: fmix64
  * is replayed in DuckDB HUGEINT arithmetic (the same replay
  * dedup_simhash uses), and the rebalance key is bounded modular
  * integer arithmetic (the stratified_sample convention).
  */
object SamplingQueries {

  // 64-bit wraparound multiply in HUGEINT: (x * C) mod 2^64 with the
  // product split into 32-bit halves (a full 64×64 product overflows
  // INT128). C is a compile-time constant, pre-split hi/lo.
  private def mulMod64(x: String, c: BigInt): String = {
    val hi = c >> 32
    val lo = c & 0xffffffffL
    s"((($x % 4294967296) * $lo + ((($x % 4294967296) * $hi + ($x // 4294967296) * $lo) % 4294967296) * 4294967296) % 18446744073709551616)"
  }

  /** DuckDB replay of `VectorExpressions.fmix64(o_orderkey)`: the
    * xor-shift-33 / multiply avalanche on the unsigned HUGEINT image
    * (>>> 33 ≡ // 2^33 for non-negative inputs), re-signed at the end
    * to Java's signed-Long ordering — the order BottomKSample's
    * TreeMap buffer keeps. fmix64 is a bijection, so distinct order
    * keys give distinct hashes: the bottom-5 SET and its emission
    * order are both exactly determined.
    */
  private val bottomkOracleSql: String = {
    val c1 = BigInt("18397679294719823053") // 0xff51afd7ed558ccd
    val c2 = BigInt("14181476777654086739") // 0xc4ceb9fe1a85ec53
    s"""WITH fm AS (
       |  SELECT o_orderpriority, o_orderkey, xor(d, d // 8589934592) AS h
       |  FROM (SELECT o_orderpriority, o_orderkey, ${mulMod64("c", c2)} AS d
       |    FROM (SELECT o_orderpriority, o_orderkey, xor(b, b // 8589934592) AS c
       |      FROM (SELECT o_orderpriority, o_orderkey, ${mulMod64("a", c1)} AS b
       |        FROM (SELECT o_orderpriority, o_orderkey,
       |                xor(CAST(o_orderkey AS HUGEINT),
       |                    CAST(o_orderkey AS HUGEINT) // 8589934592) AS a
       |              FROM orders))))),
       |sg AS (
       |  SELECT o_orderpriority, o_orderkey,
       |    CASE WHEN h >= 9223372036854775808
       |         THEN h - 18446744073709551616 ELSE h END AS hs
       |  FROM fm),
       |r AS (
       |  SELECT o_orderpriority, o_orderkey,
       |    row_number() OVER (PARTITION BY o_orderpriority ORDER BY hs) AS rnk
       |  FROM sg)
       |SELECT o_orderpriority, CAST(rnk AS INT) AS rnk, o_orderkey
       |FROM r WHERE rnk <= 5""".stripMargin
  }

  val all: Seq[Q] = Seq(

    // B34: the BottomKSample TypedImperativeAggregate under the full
    // oracle — a deterministic uniform sample per group (same rows on
    // every run and any cluster layout; O(k) buffer, O(k) shuffle per
    // group regardless of input size). The sketch's exact output —
    // which 5 order keys per priority, in which order — is pinned by
    // the DuckDB fmix64 replay.
    Q("bottomk_sample_orders", bottomkOracleSql) { (s, dir) =>
      table(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(BottomKSample.bottomkSample(col("o_orderkey"), 5).as("sample"))
        .select(col("o_orderpriority"),
          posexplode(col("sample")).as(Seq("pos", "o_orderkey")))
        .select(col("o_orderpriority"),
          (col("pos") + 1).cast("int").as("rnk"), col("o_orderkey"))
    },

    // C33: target-proportional corpus rebalancing — deterministic
    // down-sampling of over-represented languages to an equal share
    // (the data-mixing step before training). Per-lang keep
    // probability p = min(1, (n_total / n_langs) / n_lang) becomes an
    // integer threshold; a doc is kept iff its hash residue falls
    // below it. The hash is the stratified_sample convention (mod
    // 1000003 first keeps the product < 2^63 — ANSI-safe; at real
    // scale swap in a full-width 64-bit mix), so the kept SET — not
    // just its size — is oracle-exact. Plan shape: one tiny stats agg
    // broadcast back over one corpus scan; the exchange carries only
    // the per-lang rollup.
    Q("corpus_rebalance",
      """WITH t AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n_total,
        |         count(DISTINCT lang) AS n_langs
        |  FROM documents),
        |s AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
        |th AS (
        |  SELECT lang, n_docs,
        |    CAST(floor(least(1.0,
        |      (SELECT n_total FROM t) / (SELECT n_langs FROM t) / n_docs)
        |      * 1000000) AS BIGINT) AS thresh
        |  FROM s),
        |k AS (
        |  SELECT d.lang, d.doc_id, th.thresh, th.n_docs,
        |    CASE WHEN ((d.doc_id % 1000003) * 2654435761) % 1000000 < th.thresh
        |         THEN 1 ELSE 0 END AS keep
        |  FROM documents d JOIN th USING (lang))
        |SELECT lang,
        |  CAST(max(n_docs) AS BIGINT) AS n_docs,
        |  thresh,
        |  CAST(sum(keep) AS BIGINT) AS n_kept,
        |  CAST(coalesce(sum(CASE WHEN keep = 1 THEN doc_id END), 0) AS BIGINT)
        |    AS kept_id_sum
        |FROM k GROUP BY lang, thresh""".stripMargin) { (s, dir) =>
      val docs = table(s, dir, "documents")
      val tot = docs.agg(
        count(lit(1)).cast("double").as("n_total"),
        countDistinct(col("lang")).as("n_langs"))
      val perLang = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
      val th = perLang.crossJoin(broadcast(tot))
        .select(col("lang"), col("n_docs"),
          floor(least(lit(1.0), col("n_total") / col("n_langs") / col("n_docs"))
            * 1000000).cast("bigint").as("thresh"))
      docs
        .select(col("doc_id"), col("lang"),
          ((col("doc_id") % 1000003L) * 2654435761L % 1000000L).as("hkey"))
        .join(broadcast(th), Seq("lang"))
        .withColumn("keep", (col("hkey") < col("thresh")).cast("int"))
        .groupBy(col("lang"))
        .agg(
          max(col("n_docs")).as("n_docs"),
          max(col("thresh")).as("thresh"),
          sum(col("keep")).as("n_kept"),
          coalesce(sum(when(col("keep") === 1, col("doc_id"))), lit(0L))
            .cast("bigint").as("kept_id_sum"))
    })
}
