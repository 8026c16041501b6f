package graft.queries

import graft.GraftSession.table
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-10 statistics wave: rank correlation, autocorrelation, and
  * distribution distance — the remaining canonical members of the
  * monitoring/eval families (Spearman beside Kendall B117 and
  * Mann-Whitney B114; ACF beside seasonal decomposition B111 and Holt
  * B109; Wasserstein-1 beside PSI D35 and KS B120/D36).
  *
  * Shared conventions (AnalyticsQueries): exact BIGINT sums to one
  * pinned double division (+ IEEE sqrt where a variance norm is
  * inherent), 6dp floor form `floor(x*1e6 + 0.5)/1e6` in BOTH
  * engines; day = epoch // 86400; cents = floor(value·100).
  */
object SummitQueries {

  val all: Seq[Q] = Seq(

    // B123: SPEARMAN rank correlation (Spearman 1904) between time
    // and daily revenue — the monotone-trend test that is robust to
    // any monotone transform of the values, completing the rank-test
    // trio (Kendall B117 measures pair concordance, Mann-Whitney B114
    // two-sample location; Spearman is Pearson ON RANKS). Exact
    // spelling: the daily series collapses to the DAY grain (model-
    // sized: one row per calendar day, ≤ a few thousand at any corpus
    // size — stated bound for the windows below), day ranks are
    // 2·row_number (days are distinct), value ranks are tie-averaged
    // DOUBLED ranks on the distinct-cents grain (2r = 2(cum−cnt)+cnt+1
    // — the B114/C101 prefix-sum identity, exact BIGINT). Pearson's
    // sums over doubled ranks stay far inside BIGINT (n ≤ 1e6 days ⇒
    // Σ(2r)² ≤ 4e18); rho = (n·Σxy − Σx·Σy) / (√(n·Σx²−(Σx)²) ·
    // √(n·Σy²−(Σy)²)) — exact integers into two IEEE sqrts and one
    // division, 6dp floor. Scale shape: ONE keyed day agg (map-side
    // combined) over orders; everything after is day-grain.
    Q("spearman_daily",
      """WITH d AS (
        |  SELECT CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400 AS day,
        |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM orders GROUP BY 1),
        |rx AS (
        |  SELECT day, cents,
        |    2 * CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS rx2
        |  FROM d),
        |v AS (
        |  SELECT cents, CAST(count(*) AS BIGINT) AS cnt
        |  FROM d GROUP BY cents),
        |vc AS (
        |  SELECT cents, cnt,
        |    CAST(sum(cnt) OVER (ORDER BY cents) AS BIGINT) AS cum
        |  FROM v),
        |r AS (
        |  SELECT rx.day, rx.rx2,
        |    2 * (vc.cum - vc.cnt) + vc.cnt + 1 AS ry2
        |  FROM rx JOIN vc ON rx.cents = vc.cents),
        |s AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(rx2) AS BIGINT) AS sx, CAST(sum(ry2) AS BIGINT) AS sy,
        |    CAST(sum(rx2 * rx2) AS BIGINT) AS sxx,
        |    CAST(sum(ry2 * ry2) AS BIGINT) AS syy,
        |    CAST(sum(rx2 * ry2) AS BIGINT) AS sxy
        |  FROM r)
        |SELECT n AS n_days,
        |  CASE WHEN n * sxx > sx * sx AND n * syy > sy * sy THEN
        |    floor(CAST(n * sxy - sx * sy AS DOUBLE)
        |      / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
        |         * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
        |      * 1000000 + 0.5) / 1000000 END AS rho
        |FROM s""".stripMargin) { (s, dir) =>
      val d = table(s, dir, "orders")
        .select(expr("unix_timestamp(o_orderdate) div 86400").as("day"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"))
        .groupBy(col("day")).agg(sum(col("cents")).as("cents"))
      // day-grain from here on (≤ a few thousand rows at any SF —
      // the unpartitioned windows below run on that bound)
      val rx = d.select(col("day"), col("cents"),
        (row_number().over(Window.orderBy(col("day"))).cast("long") * 2)
          .as("rx2"))
      val vc = d.groupBy(col("cents")).agg(count(lit(1)).as("cnt"))
        .withColumn("cum",
          sum(col("cnt")).over(Window.orderBy(col("cents"))))
      val r = rx.join(vc, "cents")
        .select(col("rx2"),
          (lit(2) * (col("cum") - col("cnt")) + col("cnt") + 1).as("ry2"))
      r.agg(count(lit(1)).as("n"), sum(col("rx2")).as("sx"),
          sum(col("ry2")).as("sy"),
          sum(col("rx2") * col("rx2")).as("sxx"),
          sum(col("ry2") * col("ry2")).as("syy"),
          sum(col("rx2") * col("ry2")).as("sxy"))
        .select(col("n").as("n_days"),
          when(col("n") * col("sxx") > col("sx") * col("sx") &&
               col("n") * col("syy") > col("sy") * col("sy"),
            floor((col("n") * col("sxy") - col("sx") * col("sy"))
                .cast("double")
              / (sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
                  .cast("double"))
                 * sqrt((col("n") * col("syy") - col("sy") * col("sy"))
                  .cast("double")))
              * lit(1000000) + lit(0.5)) / lit(1000000)).as("rho"))
    },

    // B124: AUTOCORRELATION FUNCTION at lags 1-7 of the zero-filled
    // daily revenue series — the "is this series weekly-periodic /
    // mean-reverting / trending" diagnostic that precedes any
    // forecasting choice (Box & Jenkins 1970 ch.2; B111's seasonal
    // decomposition ASSUMES the period, ACF MEASURES it). The series
    // is the calendar GRID between the first and last order day with
    // missing days as exact 0 (the B45 gap-fill convention — ACF on a
    // gapped series silently misaligns lags). Exactness under the
    // mean-centering: multiply through by n² so every product is an
    // integer — dev_t = n·x_t − S (BIGINT), r_k = Σ dev_t·dev_{t+k} /
    // Σ dev_t² with the products in DECIMAL(38,0) (Spark) / HUGEINT
    // (DuckDB): dev ~ n·cents can reach ~1e13, its square ~1e26 —
    // past BIGINT, exact in 38 digits; both engines convert the same
    // exact integers to double for the ONE division, 6dp floor.
    // Scale shape: one keyed day agg over orders; the grid, the lag
    // self-join (≤ 7·n rows) and the sums are day-grain (model-sized,
    // bound as in B123).
    Q("timeseries_acf",
      """WITH o AS (
        |  SELECT CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400 AS day,
        |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM orders GROUP BY 1),
        |bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM o),
        |grid AS (
        |  SELECT CAST(unnest(range(d0, d1 + 1)) AS BIGINT) AS day
        |  FROM bounds),
        |x AS (
        |  SELECT g.day, CAST(coalesce(o.cents, 0) AS BIGINT) AS v
        |  FROM grid g LEFT JOIN o ON g.day = o.day),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |             CAST(sum(v) AS BIGINT) AS tot FROM x),
        |dev AS (
        |  SELECT x.day, CAST(s.n * x.v - s.tot AS HUGEINT) AS dv
        |  FROM x, s),
        |den AS (SELECT sum(dv * dv) AS den FROM dev),
        |lags AS (SELECT CAST(unnest(range(1, 8)) AS BIGINT) AS lag),
        |num AS (
        |  SELECT l.lag, sum(a.dv * b.dv) AS num
        |  FROM lags l
        |  JOIN dev a ON true
        |  JOIN dev b ON b.day = a.day + l.lag
        |  GROUP BY l.lag)
        |SELECT num.lag, s.n AS n_days,
        |  CASE WHEN den.den > 0 THEN
        |    floor(CAST(num.num AS DOUBLE) / CAST(den.den AS DOUBLE)
        |      * 1000000 + 0.5) / 1000000 END AS acf
        |FROM num, den, s""".stripMargin) { (s, dir) =>
      val o = table(s, dir, "orders")
        .select(expr("unix_timestamp(o_orderdate) div 86400").as("day"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"))
        .groupBy(col("day")).agg(sum(col("cents")).as("cents"))
      val bounds = o.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      // calendar grid with exact-0 fill (day-grain, model-sized)
      val x = bounds
        .select(explode(sequence(col("d0"), col("d1"))).as("day"))
        .join(o, Seq("day"), "left")
        .select(col("day"), coalesce(col("cents"), lit(0L)).as("v"))
      val st = x.agg(count(lit(1)).as("n"), sum(col("v")).as("tot"))
      val dev = x.crossJoin(broadcast(st))
        .select(col("day"),
          (col("n") * col("v") - col("tot")).cast("decimal(18,0)").as("dv"),
          col("n"))
      val den = dev.agg(sum(col("dv") * col("dv")).as("den"))
      val lags = s.range(1, 8).select(col("id").as("lag"))
      val a = dev.select(col("day").as("da"), col("dv").as("dva"), col("n"))
      val b = dev.select(col("day").as("db"), col("dv").as("dvb"))
      val num = a.crossJoin(broadcast(lags))
        .join(b, col("db") === col("da") + col("lag"))
        .groupBy(col("lag"))
        .agg(sum(col("dva") * col("dvb")).as("num"), first(col("n")).as("n"))
      num.crossJoin(broadcast(den))
        .select(col("lag"), col("n").as("n_days"),
          when(col("den") > 0,
            floor(col("num").cast("double") / col("den").cast("double")
              * lit(1000000) + lit(0.5)) / lit(1000000)).as("acf"))
    },

    // C109: WASSERSTEIN-1 (earth mover's) distance between per-
    // language document-length distributions — the third canonical
    // distribution distance beside PSI (D35, needs smoothing) and KS
    // (B120/D36, sup-norm): EMD is the INTEGRAL of |CDF difference|,
    // so it sees "how far apart" mass sits, not just the worst bin —
    // the corpus-mixture drift metric that ranks language/source
    // pairs by how much rebalancing work separates them (Rubner et
    // al. 2000). On the shared 64-bin length domain EMD has the exact
    // closed form Σ_b |CDF_a(b) − CDF_b(b)| (in bin units). Exact
    // spelling: cross-multiplied integer CDFs — Σ_b |cum_a·n_b −
    // cum_b·n_a| is a BIGINT (≤ 64·n²  < 2^63 to ~380M docs/lang),
    // ONE division by n_a·n_b, 6dp floor. Scale shape: one map-only
    // binning pass + keyed (lang, bin) count (map-side combined);
    // everything after is langs×64 (model-sized — the windows below
    // run on that stated bound).
    Q("hist_emd_langs",
      """WITH c AS (
        |  SELECT lang, least(n_chars // 32, 63) AS bin,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM documents GROUP BY 1, 2),
        |l AS (SELECT lang, CAST(sum(cnt) AS BIGINT) AS n FROM c GROUP BY 1),
        |grid AS (
        |  SELECT l.lang, l.n, CAST(unnest(range(64)) AS BIGINT) AS bin
        |  FROM l),
        |cdf AS (
        |  SELECT g.lang, g.n, g.bin,
        |    CAST(sum(coalesce(c.cnt, 0)) OVER (
        |      PARTITION BY g.lang ORDER BY g.bin) AS BIGINT) AS cum
        |  FROM grid g LEFT JOIN c ON g.lang = c.lang AND g.bin = c.bin),
        |p AS (
        |  SELECT a.lang AS lang_a, b.lang AS lang_b, a.n AS n_a, b.n AS n_b,
        |    CAST(sum(abs(a.cum * b.n - b.cum * a.n)) AS BIGINT) AS emd_num
        |  FROM cdf a JOIN cdf b ON a.bin = b.bin AND a.lang < b.lang
        |  GROUP BY 1, 2, 3, 4)
        |SELECT lang_a, lang_b, n_a, n_b, emd_num,
        |  floor(CAST(emd_num AS DOUBLE) / CAST(n_a * n_b AS DOUBLE)
        |    * 1000000 + 0.5) / 1000000 AS emd_bins
        |FROM p""".stripMargin) { (s, dir) =>
      val c = table(s, dir, "documents")
        .select(col("lang"),
          least(expr("n_chars div 32"), lit(63L)).as("bin"))
        .groupBy(col("lang"), col("bin")).agg(count(lit(1)).as("cnt"))
      val l = c.groupBy(col("lang")).agg(sum(col("cnt")).as("n"))
      // dense 64-bin domain per lang (langs×64 — model-sized)
      val grid = l.crossJoin(
        broadcast(s.range(64).select(col("id").as("bin"))))
      val cdf = grid.join(c, Seq("lang", "bin"), "left")
        .select(col("lang"), col("n"), col("bin"),
          coalesce(col("cnt"), lit(0L)).as("cnt"))
        .withColumn("cum", sum(col("cnt")).over(
          Window.partitionBy(col("lang")).orderBy(col("bin"))))
      val a = cdf.select(col("lang").as("lang_a"), col("n").as("n_a"),
        col("bin"), col("cum").as("cum_a"))
      val b = cdf.select(col("lang").as("lang_b"), col("n").as("n_b"),
        col("bin").as("bin_b"), col("cum").as("cum_b"))
      a.join(b, col("bin") === col("bin_b") && col("lang_a") < col("lang_b"))
        .groupBy(col("lang_a"), col("lang_b"), col("n_a"), col("n_b"))
        .agg(sum(abs(col("cum_a") * col("n_b") - col("cum_b") * col("n_a")))
          .as("emd_num"))
        .select(col("lang_a"), col("lang_b"), col("n_a"), col("n_b"),
          col("emd_num"),
          (floor(col("emd_num").cast("double")
            / (col("n_a") * col("n_b")).cast("double")
            * lit(1000000) + lit(0.5)) / lit(1000000)).as("emd_bins"))
    })
}
