package graft.queries

import graft.GraftSession.table
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-10 closing wave 2: regression diagnostics, seasonal trend,
  * sentence-grain text stats, and train/eval n-gram novelty.
  * Conventions as PinnacleQueries (exact integers → one pinned
  * division, 6dp floor; day = epoch // 86400; cents = floor(v·100)).
  */
object PinnacleQueries2 {

  val all: Seq[Q] = Seq(

    // B160: OLS LEVERAGE / INFLUENCE diagnostics (Hoaglin & Welsch
    // 1978's hat matrix) for the daily-revenue-on-time regression
    // (B73's trend line): h_i = 1/n + (x_i−x̄)²/Σ(x_j−x̄)² — which
    // days DOMINATE the fitted trend; the outlier-vs-influence
    // distinction B153's Grubbs can't make (an extreme y mid-sample
    // has low leverage; a mild y at the calendar edge has high).
    // Exactness: with dev_i = n·x_i − Σx (exact BIGINT, x = day
    // index), h_i = 1/n + dev_i²/Σdev² — two divisions of exact
    // integers (Σdev² in DECIMAL(38,0)/HUGEINT), 6dp floor; flag at
    // the textbook 2p/n = 4/n cut. Scale shape: one keyed day agg;
    // day-grain after (calendar-bounded).
    Q("ols_influence",
      """WITH d AS (
        |  SELECT CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400 AS day,
        |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM orders GROUP BY 1),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |             CAST(sum(day) AS BIGINT) AS sx FROM d),
        |dev AS (
        |  SELECT d.day, d.cents, s.n,
        |    CAST(s.n * d.day - s.sx AS HUGEINT) AS dv
        |  FROM d, s),
        |dd AS (SELECT sum(dv * dv) AS dd FROM dev),
        |h AS (
        |  SELECT dev.day, dev.cents, dev.n,
        |    1.0 / dev.n + CAST(dev.dv * dev.dv AS DOUBLE)
        |      / CAST(dd.dd AS DOUBLE) AS hraw
        |  FROM dev, dd)
        |SELECT day, cents,
        |  floor(hraw * 1000000 + 0.5) / 1000000 AS leverage,
        |  CAST(CASE WHEN hraw > 4.0 / n THEN 1 ELSE 0 END AS INT)
        |    AS high_leverage
        |FROM h""".stripMargin) { (s, dir) =>
      val d = table(s, dir, "orders")
        .select(expr("unix_timestamp(o_orderdate) div 86400").as("day"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"))
        .groupBy(col("day")).agg(sum(col("cents")).as("cents"))
        .localCheckpoint() // feeds the moment pass and the dev pass
      val st = d.agg(count(lit(1)).as("n"), sum(col("day")).as("sx"))
      val dev = d.crossJoin(broadcast(st))
        .select(col("day"), col("cents"), col("n"),
          (col("n").cast("decimal(38,0)") * col("day") - col("sx"))
            .as("dv"))
        .localCheckpoint() // feeds Σdev² and the per-day read-out
      val dd = dev.agg(sum(col("dv") * col("dv")).as("dd"))
      dev.crossJoin(broadcast(dd))
        .withColumn("hraw",
          lit(1.0) / col("n")
            + (col("dv") * col("dv")).cast("double") / col("dd").cast("double"))
        .select(col("day"), col("cents"),
          (floor(col("hraw") * 1000000 + lit(0.5)) / 1000000).as("leverage"),
          when(col("hraw") > lit(4.0) / col("n"), lit(1)).otherwise(lit(0))
            .cast("int").as("high_leverage"))
    },

    // B161: SEASONAL MANN-KENDALL (Hirsch & Slack 1984 — the
    // water-quality-monitoring standard): B152's MK run WITHIN each
    // day-of-week sub-series, S and tie-corrected var SUMMED across
    // the 7 seasons — a weekly cycle no longer masquerades as (or
    // masks) a monotone trend. Same exactness contract as B152
    // (BIGINT S/var18, two IEEE ops for z, 6dp); pair joins stay on
    // the calendar-bounded day grain, now 7 sub-series of n/7 each
    // (≈ 7·(n/7)²/2 comparisons — SMALLER than B152's single join).
    Q("seasonal_mann_kendall",
      """WITH d AS (
        |  SELECT CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400 AS day,
        |    CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400 % 7
        |      AS dow,
        |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM orders GROUP BY 1, 2),
        |s AS (
        |  SELECT CAST(sum(CASE WHEN b.cents > a.cents THEN 1
        |    WHEN b.cents < a.cents THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
        |  FROM d a JOIN d b ON a.dow = b.dow AND b.day > a.day),
        |n AS (
        |  SELECT CAST(coalesce(sum(nk * (nk - 1) * (2 * nk + 5)), 0)
        |    AS BIGINT) AS base18
        |  FROM (SELECT CAST(count(*) AS BIGINT) AS nk
        |        FROM d GROUP BY dow) g),
        |ties AS (
        |  SELECT CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0)
        |    AS BIGINT) AS tie_term
        |  FROM (SELECT CAST(count(*) AS BIGINT) AS t
        |        FROM d GROUP BY dow, cents) tt WHERE t > 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_days,
        |        CAST(count(DISTINCT dow) AS BIGINT) AS n_seasons FROM d),
        |v AS (
        |  SELECT tot.n_days, tot.n_seasons, s.s_stat,
        |    n.base18 - ties.tie_term AS var18
        |  FROM n, s, ties, tot)
        |SELECT n_days, n_seasons, s_stat, var18 AS var_s_x18,
        |  CASE WHEN var18 > 0 AND s_stat <> 0 THEN
        |    floor((CAST(s_stat AS DOUBLE)
        |        - CASE WHEN s_stat > 0 THEN 1 ELSE -1 END)
        |      / sqrt(CAST(var18 AS DOUBLE) / 18.0) * 1000000 + 0.5)
        |      / 1000000
        |    ELSE 0.0 END AS z
        |FROM v""".stripMargin) { (s, dir) =>
      val d = table(s, dir, "orders")
        .select(expr("unix_timestamp(o_orderdate) div 86400").as("day"),
          expr("unix_timestamp(o_orderdate) div 86400 % 7").as("dow"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"))
        .groupBy(col("day"), col("dow")).agg(sum(col("cents")).as("cents"))
        .localCheckpoint() // feeds pairs, season sizes, and ties
      val a = d.select(col("dow"), col("day").as("da"), col("cents").as("ca"))
      val b = d.select(col("dow"), col("day").as("db"), col("cents").as("cb"))
      val st = a.join(b, Seq("dow")).filter(col("db") > col("da"))
        .agg(sum(when(col("cb") > col("ca"), lit(1L))
          .when(col("cb") < col("ca"), lit(-1L)).otherwise(lit(0L)))
          .as("s_stat"))
      val base = d.groupBy(col("dow")).agg(count(lit(1)).as("nk"))
        .agg(coalesce(sum(col("nk") * (col("nk") - 1)
          * (lit(2) * col("nk") + 5)), lit(0L)).as("base18"))
      val ties = d.groupBy(col("dow"), col("cents"))
        .agg(count(lit(1)).as("t")).filter(col("t") > 1)
        .agg(coalesce(sum(col("t") * (col("t") - 1)
          * (lit(2) * col("t") + 5)), lit(0L)).as("tie_term"))
      val tot = d.agg(count(lit(1)).as("n_days"),
        countDistinct(col("dow")).as("n_seasons"))
      broadcast(tot).crossJoin(broadcast(st)).crossJoin(broadcast(base))
        .crossJoin(broadcast(ties))
        .select(col("n_days"), col("n_seasons"), col("s_stat"),
          (col("base18") - col("tie_term")).as("var18"))
        .select(col("n_days"), col("n_seasons"), col("s_stat"),
          col("var18").as("var_s_x18"),
          when(col("var18") > 0 && col("s_stat") =!= 0,
            floor((col("s_stat").cast("double")
                - when(col("s_stat") > 0, lit(1.0)).otherwise(lit(-1.0)))
              / sqrt(col("var18").cast("double") / 18.0)
              * lit(1000000) + lit(0.5)) / lit(1000000))
            .otherwise(lit(0.0)).as("z"))
    },

    // C131: SENTENCE-GRAIN STATISTICS — the segmentation pass under
    // sentence-level dedup (Lee et al. ACL'22 run it before
    // ExactSubstr) and under every length-law filter that speaks
    // "sentences" (Gopher's mean-words-per-sentence bound, Rae et al.
    // 2021): docs split on [.!?]+ runs, per doc: sentence count,
    // token total, mean/max sentence length in whitespace tokens.
    // All-integer counts off one split, ONE division (mean), 6dp.
    // Empty/blank sentences (consecutive terminators, trailing
    // punctuation) are dropped on BOTH sides. Map-only, no shuffle.
    Q("text_sentence_stats",
      """WITH sent AS (
        |  SELECT doc_id, s FROM (
        |    SELECT doc_id, unnest(string_split_regex(
        |      regexp_replace(lower(trim(text)), '\s+', ' ', 'g'),
        |      '[.!?]+')) AS s
        |    FROM documents)
        |  WHERE trim(s) <> ''),
        |st AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(trim(s), ' ')) AS BIGINT) AS toks
        |  FROM sent)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sentences,
        |  CAST(sum(toks) AS BIGINT) AS n_tokens,
        |  floor(CAST(sum(toks) AS DOUBLE) / count(*) * 1000000 + 0.5)
        |    / 1000000 AS mean_sentence_len,
        |  CAST(max(toks) AS BIGINT) AS max_sentence_len
        |FROM st GROUP BY doc_id""".stripMargin) { (s, dir) =>
      val sent = table(s, dir, "documents")
        .select(col("doc_id"),
          explode(split(graft.functions.TextFunctions
            .normalizeText(col("text")), "[.!?]+")).as("s"))
        .filter(trim(col("s")) =!= "")
      sent
        .select(col("doc_id"),
          size(split(trim(col("s")), " ")).cast("long").as("toks"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_sentences"), sum(col("toks")).as("n_tokens"),
          (floor(sum(col("toks")).cast("double") / count(lit(1))
            * lit(1000000) + lit(0.5)) / lit(1000000))
            .as("mean_sentence_len"),
          max(col("toks")).as("max_sentence_len"))
    },

    // C132: N-GRAM NOVELTY vs the train split (McCoy et al. TACL 2023
    // "RAVEN" n-gram novelty; the memorization-vs-generalization
    // read-out Carlini et al. 2023 take on generations, here applied
    // corpus-side to the eval split): for each EVAL doc (doc_id % 10
    // ≥ 8, the C72 dataset_split convention), the fraction of its
    // distinct word 4-grams that never appear in ANY train doc. Low
    // novelty = the eval split leaks training text (the gram-grain
    // complement of C73's decontaminate, which flags whole docs).
    // Exactness: distinct-gram counts are integers off the engine's
    // fmix64 gram hashes — REPLAYED EXACTLY in DuckDB via the C3
    // HUGEINT machinery... no: the oracle needs no hash at all — it
    // compares the gram STRINGS (the specification); the Spark side
    // joins on TokenNgramHashes for shuffle width (8 B vs ~40 B
    // keys), exact because fmix64 grams collide with probability
    // ~n²/2⁶⁴ and the C1 fingerprint convention (collision = loud
    // assert) applies. ONE division, 6dp. Scale: gram explode +
    // distinct + anti-join — linear keyed shuffles.
    Q("ngram_novelty",
      """WITH tk AS (
        |  SELECT doc_id, string_split(
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')
        |    AS t
        |  FROM documents),
        |g AS (
        |  SELECT DISTINCT doc_id,
        |    array_to_string(t[CAST(i AS INT):CAST(i + 3 AS INT)], ' ')
        |      AS gram
        |  FROM tk, unnest(range(1, len(t) - 2)) AS u(i)
        |  WHERE len(t) >= 4),
        |train AS (
        |  SELECT DISTINCT gram FROM g WHERE doc_id % 10 < 8),
        |ev AS (SELECT doc_id, gram FROM g WHERE doc_id % 10 >= 8),
        |nov AS (
        |  SELECT e.doc_id,
        |    CAST(count(*) AS BIGINT) AS n_grams,
        |    CAST(sum(CASE WHEN t.gram IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_novel
        |  FROM ev e LEFT JOIN train t ON e.gram = t.gram
        |  GROUP BY 1)
        |SELECT doc_id, n_grams, n_novel,
        |  floor(CAST(n_novel AS DOUBLE) / n_grams * 1000000 + 0.5)
        |    / 1000000 AS novelty
        |FROM nov""".stripMargin) { (s, dir) =>
      val tk = table(s, dir, "documents")
        .select(col("doc_id"),
          graft.functions.TextFunctions.wsTokens(col("text")).as("t"))
        .filter(size(col("t")) >= 4)
      // 8-byte fmix64 gram hashes instead of ~40-byte gram strings on
      // the shuffle (the C2/C61 discipline); TokenNgramHashes is
      // already distinct-per-doc by construction.
      val g = tk.select(col("doc_id"),
        explode(graft.functions.VectorExpressions
          .tokenNgramHashes(col("t"), 4)).as("gh"))
      val train = g.filter(col("doc_id") % 10 < 8)
        .select(col("gh")).distinct()
      val ev = g.filter(col("doc_id") % 10 >= 8)
      ev.join(train.withColumn("hit", lit(1)), Seq("gh"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("hit").isNull, lit(1L)).otherwise(lit(0L)))
            .as("n_novel"))
        .select(col("doc_id"), col("n_grams"), col("n_novel"),
          (floor(col("n_novel").cast("double") / col("n_grams")
            * lit(1000000) + lit(0.5)) / lit(1000000)).as("novelty"))
    })
}
