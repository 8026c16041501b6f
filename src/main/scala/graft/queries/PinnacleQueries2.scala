package graft.queries

import graft.GraftSession.table
import graft.operators.VectorOps
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
    },

    // B162: RESCALED-RANGE (R/S) TABLE (Hurst 1951; Mandelbrot &
    // Wallis 1969) over the zero-filled daily revenue grid — the
    // long-memory diagnostic: per dyadic window size w ∈ {64, 128,
    // 256}, each complete block's R = range of mean-adjusted
    // cumulative deviations, S = block stddev; persistent series
    // grow R/S faster than √w. (The log-log slope is left to the
    // reader — no live log in the determinism contract; the per-size
    // table IS the diagnostic.) Exactness: Z'_t = w·prefix_t − t·S_b
    // is an exact BIGINT (range R = (maxZ'−minZ')/w one division);
    // S via the exact integer w·Σx²−S_b² (DECIMAL(38,0)/HUGEINT)
    // into one sqrt; mean R/S per size is a block-ascending ORDERED
    // fold, 6dp. Scale shape: one keyed day agg; grid/blocks are
    // day-grain (calendar-bounded — block count is CONSTANT in
    // corpus size).
    Q("hurst_rescaled_range",
      """WITH o AS (
        |  SELECT CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400 AS day,
        |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM orders GROUP BY 1),
        |bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM o),
        |grid AS (
        |  SELECT CAST(unnest(range(d0, d1 + 1)) AS BIGINT) - d0 AS t,
        |    d0 FROM bounds),
        |x AS (
        |  SELECT g.t, CAST(coalesce(o.cents, 0) AS BIGINT) AS v
        |  FROM grid g LEFT JOIN o ON g.t + g.d0 = o.day),
        |ws AS (SELECT CAST(unnest([64, 128, 256]) AS BIGINT) AS w),
        |blk AS (
        |  SELECT ws.w, x.t // ws.w AS b, x.t % ws.w + 1 AS i, x.v
        |  FROM x, ws
        |  WHERE x.t // ws.w < (SELECT (max(t) + 1) // ws.w FROM x)),
        |pre AS (
        |  SELECT w, b, i, v,
        |    CAST(sum(v) OVER (PARTITION BY w, b ORDER BY i
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS p
        |  FROM blk),
        |bs AS (
        |  SELECT w, b, CAST(sum(v) AS BIGINT) AS sb,
        |    CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT) AS qb
        |  FROM pre GROUP BY 1, 2),
        |z AS (
        |  SELECT p.w, p.b,
        |    CAST(max(p.w * p.p - p.i * bs.sb) AS BIGINT) AS zmax,
        |    CAST(min(p.w * p.p - p.i * bs.sb) AS BIGINT) AS zmin
        |  FROM pre p JOIN bs ON p.w = bs.w AND p.b = bs.b
        |  GROUP BY 1, 2),
        |rs AS (
        |  SELECT z.w, z.b,
        |    CASE WHEN CAST(z.w AS HUGEINT) * bs.qb
        |        > CAST(bs.sb AS HUGEINT) * bs.sb THEN
        |      (CAST(z.zmax - z.zmin AS DOUBLE) / z.w)
        |        / sqrt(CAST(CAST(z.w AS HUGEINT) * bs.qb
        |            - CAST(bs.sb AS HUGEINT) * bs.sb AS DOUBLE)
        |          / (CAST(z.w AS DOUBLE) * z.w))
        |    END AS rsv
        |  FROM z JOIN bs ON z.w = bs.w AND z.b = bs.b),
        |m AS (
        |  SELECT w, CAST(count(*) AS BIGINT) AS n_blocks,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(coalesce(rsv, 0.0) ORDER BY b)), (a, v) -> a + v)
        |      AS s_rs
        |  FROM rs GROUP BY w)
        |SELECT w AS window_days, n_blocks,
        |  floor(s_rs / n_blocks * 1000000 + 0.5) / 1000000 AS mean_rs
        |FROM m""".stripMargin) { (s, dir) =>
      val o = table(s, dir, "orders")
        .select(expr("unix_timestamp(o_orderdate) div 86400").as("day"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"))
        .groupBy(col("day")).agg(sum(col("cents")).as("cents"))
      val bounds = o.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      val x = bounds
        .select(explode(sequence(lit(0L), col("d1") - col("d0"))).as("t"),
          col("d0"))
        .join(o, col("t") + col("d0") === col("day"), "left")
        .select(col("t"), coalesce(col("cents"), lit(0L)).as("v"))
        .localCheckpoint() // day-grain; feeds every window size
      val tmax = x.agg(max(col("t")).as("tm"))
      val ws = s.createDataFrame(Seq(64L, 128L, 256L).map(Tuple1.apply))
        .toDF("w")
      val blk = x.crossJoin(broadcast(ws)).crossJoin(broadcast(tmax))
        .filter(expr("t div w") < expr("(tm + 1) div w"))
        .select(col("w"), expr("t div w").as("b"),
          (col("t") % col("w") + 1).as("i"), col("v"))
      // per-(w, block) windows: block size ≤ 256 rows — bounded
      val pre = blk.withColumn("p",
        sum(col("v")).over(Window.partitionBy(col("w"), col("b"))
          .orderBy(col("i"))))
      val bs = blk.groupBy(col("w"), col("b"))
        .agg(sum(col("v")).as("sb"),
          sum(col("v").cast("decimal(38,0)") * col("v")).as("qb"))
      val z = pre.join(bs, Seq("w", "b"))
        .groupBy(col("w"), col("b"), col("sb"), col("qb"))
        .agg(max(col("w") * col("p") - col("i") * col("sb")).as("zmax"),
          min(col("w") * col("p") - col("i") * col("sb")).as("zmin"))
      val rs = z.select(col("w"), col("b"),
        when(col("w").cast("decimal(38,0)") * col("qb")
          > col("sb").cast("decimal(38,0)") * col("sb"),
          ((col("zmax") - col("zmin")).cast("double") / col("w"))
            / sqrt((col("w").cast("decimal(38,0)") * col("qb")
                - col("sb").cast("decimal(38,0)") * col("sb")).cast("double")
              / (col("w").cast("double") * col("w")))).as("rsv"))
      rs.groupBy(col("w"))
        .agg(count(lit(1)).as("n_blocks"),
          aggregate(transform(sort_array(collect_list(struct(col("b"),
            coalesce(col("rsv"), lit(0.0)).as("r")))),
            v => v.getField("r")), lit(0.0), (a, v) => a + v).as("s_rs"))
        .select(col("w").as("window_days"), col("n_blocks"),
          (floor(col("s_rs") / col("n_blocks") * lit(1000000) + lit(0.5))
            / lit(1000000)).as("mean_rs"))
    },

    // B163: DURBIN-WATSON autocorrelated-residuals test (Durbin &
    // Watson Biometrika 1950) on the daily-revenue trend regression —
    // "is the OLS trend line (B73) even valid": DW = Σ(e_t−e_{t−1})²
    // / Σe_t² ≈ 2(1−ρ₁) of the RESIDUALS (B124's ACF diagnoses the
    // raw series; DW diagnoses what the trend fit leaves behind).
    // Exactness: the scaled residual E_t = dy_t·Σdx² − dx_t·Σdxdy is
    // an exact DECIMAL(38,0)/HUGEINT integer (the common positive
    // scale n·Σdx² cancels in the ratio); E² would pass 38 digits,
    // so both sums run as day-ascending ORDERED double folds over
    // the identical exact integers (the ADC convention), ONE
    // division, 6dp floor. Scale shape: one keyed day agg; the
    // residual array is day-grain (calendar-bounded, clone-constant).
    Q("durbin_watson",
      """WITH d AS (
        |  SELECT CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400 AS day,
        |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM orders GROUP BY 1),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |             CAST(sum(day) AS BIGINT) AS sx,
        |             CAST(sum(cents) AS BIGINT) AS sy FROM d),
        |dev AS (
        |  SELECT d.day,
        |    CAST(s.n * d.day - s.sx AS HUGEINT) AS dx,
        |    CAST(s.n * d.cents - s.sy AS HUGEINT) AS dy
        |  FROM d, s),
        |mm AS (SELECT sum(dx * dx) AS dxx, sum(dx * dy) AS dxy FROM dev),
        |e AS (
        |  SELECT dev.day,
        |    CAST(dev.dy * mm.dxx - dev.dx * mm.dxy AS DOUBLE) AS ev
        |  FROM dev, mm),
        |l AS (SELECT list(ev ORDER BY day) AS es,
        |             CAST(count(*) AS BIGINT) AS n FROM e),
        |f AS (
        |  SELECT n,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(range(2, CAST(n + 1 AS INT)), i ->
        |        (es[CAST(i AS INT)] - es[CAST(i - 1 AS INT)])
        |        * (es[CAST(i AS INT)] - es[CAST(i - 1 AS INT)]))),
        |      (a, v) -> a + v) AS num,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(es, v -> v * v)), (a, v) -> a + v) AS den
        |  FROM l)
        |SELECT n AS n_days,
        |  CASE WHEN den > 0 THEN
        |    floor(num / den * 1000000 + 0.5) / 1000000 END AS dw
        |FROM f""".stripMargin) { (s, dir) =>
      val d = table(s, dir, "orders")
        .select(expr("unix_timestamp(o_orderdate) div 86400").as("day"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"))
        .groupBy(col("day")).agg(sum(col("cents")).as("cents"))
        .localCheckpoint() // feeds moments and residuals
      val st = d.agg(count(lit(1)).as("n"), sum(col("day")).as("sx"),
        sum(col("cents")).as("sy"))
      val dev = d.crossJoin(broadcast(st))
        .select(col("day"),
          (col("n").cast("decimal(38,0)") * col("day") - col("sx"))
            .as("dx"),
          (col("n").cast("decimal(38,0)") * col("cents") - col("sy"))
            .as("dy"), col("n"))
        .localCheckpoint() // feeds the moment agg and the residuals
      val mm = dev.agg(sum(col("dx") * col("dx")).as("dxx"),
        sum(col("dx") * col("dy")).as("dxy"))
      val e = dev.crossJoin(broadcast(mm))
        .select(col("day"), col("n"),
          (col("dy") * col("dxx") - col("dx") * col("dxy")).cast("double")
            .as("ev"))
      // day-grain ordered folds (the ADC convention): one array of
      // calendar-bounded length, both sums in day order
      val f = e.agg(first(col("n")).as("n"),
          transform(sort_array(collect_list(struct(col("day"), col("ev")))),
            v => v.getField("ev")).as("es"))
        .select(col("n"),
          aggregate(expr(
            """transform(sequence(2, size(es)),
              |  i -> (element_at(es, i) - element_at(es, i - 1))
              |     * (element_at(es, i) - element_at(es, i - 1)))"""
              .stripMargin),
            lit(0.0), (a, v) => a + v).as("num"),
          aggregate(transform(col("es"), v => v * v), lit(0.0),
            (a, v) => a + v).as("den"))
      f.select(col("n").as("n_days"),
        when(col("den") > 0,
          floor(col("num") / col("den") * lit(1000000) + lit(0.5))
            / lit(1000000)).as("dw"))
    },

    // C133: KEYFRAME SELECTION per shot — the representative-frame
    // pick that feeds image dedup/captioning once C121 has segmented
    // shots (Zhuang et al. 1998's change-maximal keyframe rule):
    // within each shot, the frame with the LARGEST L1 distance to its
    // predecessor (the most change-bearing frame), tie-break (dist
    // DESC, frame ASC); a shot's first frame carries dist 0, so
    // single-frame shots select themselves. Distances are exact
    // dyadic rationals (the C20 2⁻¹⁶ contract — the C115 cut metric
    // verbatim), so the argmax replays bit-for-bit. Scale shape: the
    // C20 map-only explode + doc-partitioned bounded windows
    // (frames/doc ≤ payload/128) + one keyed argmax.
    Q("mm_keyframe_select", {
      s"""WITH ${MediaOracle.frameFeatureCtes(step = 2)},
         |fd AS (
         |  SELECT doc_id, f, feats,
         |    lag(feats) OVER (PARTITION BY doc_id ORDER BY f) AS pfeats
         |  FROM ft),
         |cut AS (
         |  SELECT doc_id, f,
         |    CASE WHEN pfeats IS NULL THEN 0.0 ELSE
         |      list_reduce(list_prepend(0.0, list_transform(range(8),
         |        j -> abs(feats[CAST(j + 1 AS INT)]
         |               - pfeats[CAST(j + 1 AS INT)]))),
         |        (a, x) -> a + x) END AS dist,
         |    CASE WHEN pfeats IS NOT NULL AND
         |      list_reduce(list_prepend(0.0, list_transform(range(8),
         |        j -> abs(feats[CAST(j + 1 AS INT)]
         |               - pfeats[CAST(j + 1 AS INT)]))),
         |        (a, x) -> a + x) > 9.0
         |    THEN 1 ELSE 0 END AS is_cut
         |  FROM fd),
         |sh AS (
         |  SELECT doc_id, f, dist,
         |    CAST(sum(is_cut) OVER (PARTITION BY doc_id ORDER BY f)
         |      AS BIGINT) AS shot_id
         |  FROM cut),
         |ranked AS (
         |  SELECT doc_id, shot_id, f, dist,
         |    row_number() OVER (PARTITION BY doc_id, shot_id
         |      ORDER BY dist DESC, f) AS rn,
         |    CAST(count(*) OVER (PARTITION BY doc_id, shot_id) AS BIGINT)
         |      AS n_frames
         |  FROM sh)
         |SELECT doc_id AS id, shot_id, CAST(f AS INT) AS keyframe_idx,
         |  dist, n_frames
         |FROM ranked WHERE rn = 1""".stripMargin
    }) { (s, dir) =>
      val docs = table(s, dir, "documents")
      val frames = graft.operators.Multimodal.sampleFrames(s,
        graft.operators.Multimodal.asMedia(docs, "text")
          .select(col("doc_id"), col("media")),
        "doc_id", frameBytes = 64, everyN = 2)
      val w = Window.partitionBy(col("id")).orderBy(col("frame_idx"))
      val cut = frames
        .withColumn("pfeats", lag(col("features"), 1).over(w))
        .withColumn("dist",
          when(col("pfeats").isNull, lit(0.0))
            .otherwise(aggregate(zip_with(col("features"), col("pfeats"),
              (a, b) => abs(a - b)), lit(0.0), (acc, x) => acc + x)))
        .withColumn("is_cut",
          when(col("pfeats").isNotNull && col("dist") > 9.0, lit(1))
            .otherwise(lit(0)))
      val sh = cut.withColumn("shot_id",
        sum(col("is_cut")).over(w).cast("long"))
      val ws = Window.partitionBy(col("id"), col("shot_id"))
      sh.withColumn("rn",
          row_number().over(ws.orderBy(col("dist").desc, col("frame_idx"))))
        .withColumn("n_frames", count(lit(1)).over(ws))
        .filter(col("rn") === 1)
        .select(col("id"), col("shot_id"),
          col("frame_idx").cast("int").as("keyframe_idx"),
          col("dist"), col("n_frames"))
    },

    // C134: IVF nPROBE RECALL CURVE — the index-tuning sweep run
    // before committing an ANN configuration (the recall-vs-probes
    // trade every IVF deployment publishes — Johnson et al. 2017's
    // faiss nprobe curves): recall@10 of the C7b IVF search against
    // the C6 brute-force truth, for nProbe = 1..8 over the 8-cell
    // codebook. recall = hits / (10·|Q|) — exact integer counts into
    // ONE division, 6dp floor. Scale shape: 8 bounded IVF searches
    // (each the probed ann_ivf shape) + a broadcast top-10 join; the
    // brute-force side is ONE TopKPerKey pass shared by all 8.
    Q("ann_ivf_nprobe_curve", {
      val d2 = "list_dot_product(%s, %s) - 2 * list_dot_product(%s, c.cv) + list_dot_product(c.cv, c.cv)"
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
         |asg AS (
         |  SELECT vec_id, v, cid FROM (
         |    SELECT e.vec_id, e.v, c.cid,
         |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |        ${d2.format("e.v", "e.v", "e.v")}, c.cid) AS rn
         |    FROM e, cent c) WHERE rn = 1),
         |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
         |cr AS (
         |  SELECT query_id, qv, cid,
         |    row_number() OVER (PARTITION BY query_id ORDER BY
         |      ${d2.format("q.qv", "q.qv", "q.qv")}, c.cid) AS crnk
         |  FROM q, cent c),
         |bf AS (
         |  SELECT query_id, id FROM (
         |    SELECT p.query_id, e2.vec_id AS id,
         |      row_number() OVER (PARTITION BY p.query_id ORDER BY
         |        round(list_dot_product(p.qv, e2.v)
         |          / (sqrt(list_dot_product(p.qv, p.qv))
         |             * sqrt(list_dot_product(e2.v, e2.v))), 6) DESC,
         |        e2.vec_id) AS rnk
         |    FROM e e2, q p WHERE e2.vec_id <> p.query_id)
         |  WHERE rnk <= 10),
         |np AS (SELECT CAST(unnest(range(1, 9)) AS BIGINT) AS nprobe),
         |scored AS (
         |  SELECT np.nprobe, c.query_id, a.vec_id AS id,
         |    round(list_dot_product(c.qv, a.v)
         |      / (sqrt(list_dot_product(c.qv, c.qv))
         |         * sqrt(list_dot_product(a.v, a.v))), 6) AS cosine
         |  FROM np JOIN cr c ON c.crnk <= np.nprobe
         |  JOIN asg a USING (cid)
         |  WHERE a.vec_id <> c.query_id),
         |ivf AS (
         |  SELECT nprobe, query_id, id FROM (
         |    SELECT nprobe, query_id, id,
         |      row_number() OVER (PARTITION BY nprobe, query_id
         |        ORDER BY cosine DESC, id) AS rnk
         |    FROM scored) WHERE rnk <= 10),
         |hits AS (
         |  SELECT i.nprobe, CAST(count(*) AS BIGINT) AS hits
         |  FROM ivf i JOIN bf ON bf.query_id = i.query_id AND bf.id = i.id
         |  GROUP BY 1),
         |nq AS (SELECT CAST(count(*) AS BIGINT) AS nq FROM q)
         |SELECT np.nprobe, CAST(coalesce(h.hits, 0) AS BIGINT) AS hits,
         |  nq.nq AS n_queries,
         |  floor(CAST(coalesce(h.hits, 0) AS DOUBLE) / (10 * nq.nq)
         |    * 1000000 + 0.5) / 1000000 AS recall
         |FROM np LEFT JOIN hits h ON np.nprobe = h.nprobe, nq""".stripMargin
    }) { (s, dir) =>
      val vecs = table(s, dir, "embeddings")
      val probes = vecs.filter(col("vec_id") < 5)
      val centroids = vecs.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding").as("cv"))
      val bf = VectorOps.bruteForceTopK(
          vecs, probes, "vec_id", "embedding", k = 10)
        .select(col("query_id"), col("id"))
        .localCheckpoint() // one brute-force pass shared by all 8
      val ivf = (1 to 8).map { np =>
        VectorOps.ivfTopK(vecs, probes, centroids,
            "vec_id", "embedding", "cid", "cv", k = 10, nProbe = np)
          .select(lit(np.toLong).as("nprobe"), col("query_id"), col("id"))
      }.reduce(_ unionByName _)
      val nq = probes.agg(count(lit(1)).as("nq"))
      val hits = ivf.join(bf, Seq("query_id", "id"))
        .groupBy(col("nprobe")).agg(count(lit(1)).as("hits"))
      val grid = s.range(1, 9).select(col("id").as("nprobe"))
      grid.join(hits, Seq("nprobe"), "left")
        .crossJoin(broadcast(nq))
        .select(col("nprobe"),
          coalesce(col("hits"), lit(0L)).as("hits"),
          col("nq").as("n_queries"),
          (floor(coalesce(col("hits"), lit(0L)).cast("double")
            / (lit(10) * col("nq")) * lit(1000000) + lit(0.5))
            / lit(1000000)).as("recall"))
    },

    // C135: POISSON BOOTSTRAP CI (Hanley & MacGibbon 2006; Chamandy
    // et al., Google 2012 — THE way to bootstrap on a cluster: iid
    // resampling needs the full dataset per replicate, Poisson(1)
    // weights need one streamed pass for ALL replicates): the mean
    // order value with a 32-replicate bootstrap CI, each row's weight
    // in replicate r drawn as Poisson(1) via the ENGINE's
    // deterministic fingerprint of "orderkey:r" inverse-CDF'd against
    // SEVEN PINNED 2⁶⁴-scaled thresholds (exact integers precomputed
    // from the float CDF of e⁻¹ — both engines compare the same
    // unsigned image, Spark through the sign-bit-XOR trick since ANSI
    // forbids wraparound adds). Replicate means are exact-integer
    // ratios; the SE across 32 replicates runs as replicate-ascending
    // ORDERED folds, 6dp floors. Scale shape: ONE map-only pass over
    // orders×32 (codegen'd fingerprint, no shuffle) into a 32-group
    // keyed agg — the bootstrap that survives 100 TB.
    Q("poisson_bootstrap_ci", {
      val tsUnsigned = Seq("6786177901268885504", "13572355802537771008",
        "16965444753172213760", "18096474403383695360",
        "18379231815936565248", "18435783298447138816",
        "18445208545532233728")
      val wExpr = tsUnsigned.map(t =>
        s"CASE WHEN u >= CAST($t AS HUGEINT) THEN 1 ELSE 0 END")
        .mkString("(", " + ", ")")
      s"""WITH o AS (
         |  SELECT o_orderkey,
         |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
         |  FROM orders),
         |reps AS (SELECT CAST(unnest(range(1, 33)) AS BIGINT) AS rep),
         |t AS (
         |  SELECT o.cents, reps.rep,
         |    list_reduce(
         |      list_prepend(CAST(0 AS HUGEINT),
         |        list_transform(string_split_regex(
         |          CAST(o.o_orderkey AS VARCHAR) || ':'
         |            || CAST(reps.rep AS VARCHAR), ''),
         |          c -> CAST(ord(c) AS HUGEINT))),
         |      (h, b) -> (h * 31 + b) % 18446744073709551616) AS t
         |  FROM o, reps),
         |h AS (
         |  SELECT cents, rep, xor(d, d // 8589934592) AS u
         |  FROM (SELECT cents, rep, ${DedupQueries.mulMod64("c", BigInt("14181476777654086739"))} AS d
         |    FROM (SELECT cents, rep, xor(b, b // 8589934592) AS c
         |      FROM (SELECT cents, rep, ${DedupQueries.mulMod64("a", BigInt("18397679294719823053"))} AS b
         |        FROM (SELECT cents, rep, xor(t, t // 8589934592) AS a
         |              FROM t))))),
         |w AS (SELECT cents, rep, $wExpr AS wt FROM h),
         |rm AS (
         |  SELECT rep,
         |    CASE WHEN sum(wt) > 0 THEN
         |      CAST(sum(CAST(wt AS BIGINT) * cents) AS DOUBLE)
         |        / sum(wt) END AS m
         |  FROM w GROUP BY rep),
         |base AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(cents) AS BIGINT) AS s FROM o),
         |mb AS (
         |  SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list(coalesce(m, 0.0) ORDER BY rep)), (a, v) -> a + v)
         |    / 32 AS mbar
         |  FROM rm),
         |ss AS (
         |  SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list((coalesce(m, 0.0) - mb.mbar)
         |        * (coalesce(m, 0.0) - mb.mbar) ORDER BY rep)),
         |      (a, v) -> a + v) / 31 AS v
         |  FROM rm, mb GROUP BY mb.mbar)
         |SELECT base.n AS n_orders,
         |  floor(CAST(base.s AS DOUBLE) / base.n * 1000000 + 0.5)
         |    / 1000000 AS theta,
         |  floor(sqrt(ss.v) * 1000000 + 0.5) / 1000000 AS se_boot,
         |  floor((CAST(base.s AS DOUBLE) / base.n - 1.96 * sqrt(ss.v))
         |    * 1000000 + 0.5) / 1000000 AS ci_lo,
         |  floor((CAST(base.s AS DOUBLE) / base.n + 1.96 * sqrt(ss.v))
         |    * 1000000 + 0.5) / 1000000 AS ci_hi
         |FROM base, ss""".stripMargin
    }) { (s, dir) =>
      // signed images of the seven 2^64-scaled Poisson(1) CDF cuts
      // (threshold − 2^63): unsigned u ≥ t  ⟺  (h XOR sign bit) ≥
      // these, pure comparisons — no wraparound arithmetic in ANSI SQL
      val tsSigned = Seq(-2437194135585890304L, 4348983765682995200L,
        7742072716317437952L, 8873102366528919552L, 9155859779081789440L,
        9212411261592363008L, 9221836508677457920L)
      val o = table(s, dir, "orders")
        .select(col("o_orderkey"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"))
      val reps = o.select(col("o_orderkey"), col("cents"),
        explode(sequence(lit(1L), lit(32L))).as("rep"))
      // fmix64 AFTER the poly fingerprint: a 31-poly of a short key
      // never fills the high 64-bit range (31^12 < 2^63), so raw
      // threshold draws would be degenerate — the finalizer is what
      // makes the unsigned image uniform (Fmix64, codegen'd)
      val img = graft.functions.Fingerprint64.fmix64(
        graft.functions.Fingerprint64.fingerprint64(
          concat(col("o_orderkey").cast("string"), lit(":"),
            col("rep").cast("string"))))
        .bitwiseXOR(lit(Long.MinValue))
      val wt = tsSigned.map(t =>
        when(img >= lit(t), lit(1)).otherwise(lit(0)))
        .reduce(_ + _)
      val rm = reps.withColumn("wt", wt.cast("long"))
        .groupBy(col("rep"))
        .agg(sum(col("wt")).as("sw"), sum(col("wt") * col("cents")).as("swc"))
        .select(col("rep"),
          when(col("sw") > 0, col("swc").cast("double") / col("sw"))
            .as("m"))
      val base = o.agg(count(lit(1)).as("n"), sum(col("cents")).as("s"))
      // 32-replicate ordered folds (the ADC convention)
      val folded = rm
        .agg(transform(sort_array(collect_list(struct(col("rep"),
          coalesce(col("m"), lit(0.0)).as("mv")))),
          v => v.getField("mv")).as("ms"))
        .select(col("ms"),
          (aggregate(col("ms"), lit(0.0), (a, v) => a + v) / 32).as("mbar"))
        .select((aggregate(transform(col("ms"),
          v => (v - col("mbar")) * (v - col("mbar"))),
          lit(0.0), (a, v) => a + v) / 31).as("v"))
      def dp6(c: org.apache.spark.sql.Column) =
        floor(c * 1000000 + lit(0.5)) / 1000000
      broadcast(base).crossJoin(broadcast(folded))
        .select(col("n").as("n_orders"),
          dp6(col("s").cast("double") / col("n")).as("theta"),
          dp6(sqrt(col("v"))).as("se_boot"),
          dp6(col("s").cast("double") / col("n") - lit(1.96) * sqrt(col("v")))
            .as("ci_lo"),
          dp6(col("s").cast("double") / col("n") + lit(1.96) * sqrt(col("v")))
            .as("ci_hi"))
    },

    // B164: DIFFERENCE-IN-DIFFERENCES (Card & Krueger AER 1994's
    // design; the marketing-analytics "did the campaign move the
    // treated group more than the control drifted") on purchase
    // values: treatment = user_id % 2, period split at the PINNED
    // calendar midpoint (min+max+1)//2 of the event-day range, DiD =
    // (m_t1 − m_t0) − (m_c1 − m_c0). Four exact-integer cell ratios
    // (one division each) into three IEEE subtractions, 6dp floors.
    // One keyed 4-cell agg — map-side combined, nothing else.
    Q("diff_in_diff",
      """WITH e AS (
        |  SELECT user_id % 2 AS grp,
        |    CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
        |    CAST(floor(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase'),
        |b AS (SELECT (min(day) + max(day) + 1) // 2 AS mid FROM e),
        |c AS (
        |  SELECT e.grp,
        |    CASE WHEN e.day >= b.mid THEN 1 ELSE 0 END AS post,
        |    CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS s
        |  FROM e, b GROUP BY 1, 2),
        |m AS (
        |  SELECT
        |    max(CASE WHEN grp = 1 AND post = 1 THEN CAST(s AS DOUBLE) / n END) AS t1,
        |    max(CASE WHEN grp = 1 AND post = 0 THEN CAST(s AS DOUBLE) / n END) AS t0,
        |    max(CASE WHEN grp = 0 AND post = 1 THEN CAST(s AS DOUBLE) / n END) AS c1,
        |    max(CASE WHEN grp = 0 AND post = 0 THEN CAST(s AS DOUBLE) / n END) AS c0,
        |    CAST(sum(n) AS BIGINT) AS n_events
        |  FROM c)
        |SELECT n_events,
        |  floor(t1 * 1000000 + 0.5) / 1000000 AS m_treat_post,
        |  floor(t0 * 1000000 + 0.5) / 1000000 AS m_treat_pre,
        |  floor(c1 * 1000000 + 0.5) / 1000000 AS m_ctrl_post,
        |  floor(c0 * 1000000 + 0.5) / 1000000 AS m_ctrl_pre,
        |  floor(((t1 - t0) - (c1 - c0)) * 1000000 + 0.5) / 1000000 AS did
        |FROM m""".stripMargin) { (s, dir) =>
      val e = table(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .select((col("user_id") % 2).as("grp"),
          expr("(ts div 1000000000) div 86400").as("day"),
          floor(col("value") * 100).cast("long").as("cents"))
        .localCheckpoint() // feeds the bound and the cells
      val b = e.agg(expr("(min(day) + max(day) + 1) div 2").as("mid"))
      val c = e.crossJoin(broadcast(b))
        .select(col("grp"),
          when(col("day") >= col("mid"), lit(1)).otherwise(lit(0))
            .as("post"), col("cents"))
        .groupBy(col("grp"), col("post"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("s"))
      def cell(g: Int, p: Int) =
        max(when(col("grp") === g && col("post") === p,
          col("s").cast("double") / col("n")))
      def dp6(x: org.apache.spark.sql.Column) =
        floor(x * 1000000 + lit(0.5)) / 1000000
      c.agg(cell(1, 1).as("t1"), cell(1, 0).as("t0"),
          cell(0, 1).as("c1"), cell(0, 0).as("c0"),
          sum(col("n")).as("n_events"))
        .select(col("n_events"),
          dp6(col("t1")).as("m_treat_post"),
          dp6(col("t0")).as("m_treat_pre"),
          dp6(col("c1")).as("m_ctrl_post"),
          dp6(col("c0")).as("m_ctrl_pre"),
          dp6((col("t1") - col("t0")) - (col("c1") - col("c0"))).as("did"))
    })
}
