package graft.queries

import graft.GraftSession.table
import graft.operators.DistributedPrefixSum
import org.apache.spark.sql.functions._

/** Round-12 statistics wave: the distribution-shape and
  * randomness/changepoint tests that close out the monitoring
  * family's remaining corners — normality (Jarque-Bera beside the
  * rank tests that ASSUME nothing), raw-series randomness (von
  * Neumann beside B163's residual Durbin-Watson), nonparametric
  * changepoint (Pettitt beside B122's least-squares changepoint),
  * and the full-CDF two-sample test (Kuiper beside B120's KS —
  * equally sensitive in both tails).
  *
  * Shared conventions (AnalyticsQueries/ZenithQueries): exact
  * integer sufficient statistics (BIGINT, DECIMAL(38,0)/HUGEINT for
  * products — ALWAYS widened before multiplying) into pinned IEEE
  * expression trees with 6dp floors `floor(x*1e6 + 0.5)/1e6`; day =
  * epoch div 86400 on the B45 zero-filled calendar grid; daily
  * DOLLARS (cents div 100) where 4th powers must stay inside
  * DECIMAL(38,0) at the ×1000 clone scale (dev⁴ at 1e8-dollar days
  * is 1e32·2400 ≈ 2.4e35 — cents would overflow at 1e40).
  */
object MeridianQueries {

  // Shared DuckDB CTE: zero-filled daily order revenue in DOLLARS.
  private val dailyDollarsSql =
    """o AS (
      |  SELECT CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400 AS day,
      |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS cents
      |  FROM orders GROUP BY 1),
      |bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM o),
      |grid AS (
      |  SELECT CAST(unnest(range(d0, d1 + 1)) AS BIGINT) AS day
      |  FROM bounds),
      |x AS (
      |  SELECT g.day, CAST(coalesce(o.cents, 0) // 100 AS BIGINT) AS v
      |  FROM grid g LEFT JOIN o ON g.day = o.day)""".stripMargin

  /** Spark side of the shared zero-filled daily-dollars grid. */
  private def dailyDollars(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val o = table(s, dir, "orders")
      .select(expr("unix_timestamp(o_orderdate) div 86400").as("day"),
        floor(col("o_totalprice") * 100).cast("long").as("cents"))
      .groupBy(col("day")).agg(sum(col("cents")).as("cents"))
    o.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
      .join(o, Seq("day"), "left")
      .select(col("day"),
        expr("coalesce(cents, 0L) div 100").as("v"))
  }

  val all: Seq[Q] = Seq(

    // B190: JARQUE-BERA NORMALITY TEST (Jarque & Bera 1980/1987) of
    // the zero-filled daily revenue distribution — the moment-based
    // normality screen (JB = n·(S²/6 + (K−3)²/24) ~ χ²₂) that says
    // whether the Gaussian monitoring rules (D44's z-gate, B60's t)
    // are even admissible on this series; the parametric companion
    // to the rank tests that assume nothing. Exact spelling:
    // deviations r = v − (tot div n) about the FLOORED integer mean
    // (documented variant — |bias| < 1 dollar on 1e8-dollar days;
    // the exact-mean central moments need S1⁴, which overflows
    // DECIMAL(38,0) at clone scale); M2/M3/M4 = Σr²/Σr³/Σr⁴ as
    // DECIMAL(38,0) sums of widened products; skew/kurtosis/JB a
    // pinned IEEE tree (three divisions + one sqrt), 6dp floors;
    // reject at the pinned χ²₂(0.95) = 5.991465 literal. Scale
    // shape: one keyed day agg (map-side combined); the grid and
    // moments are calendar-sized.
    Q("jarque_bera", {
      s"""WITH $dailyDollarsSql,
         |s AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |             CAST(sum(v) AS BIGINT) AS tot FROM x),
         |r AS (SELECT CAST(x.v - (s.tot // s.n) AS HUGEINT) AS r, s.n
         |      FROM x, s),
         |m AS (SELECT max(n) AS n,
         |        sum(r * r) AS m2s, sum(r * r * r) AS m3s,
         |        sum(r * r * r * r) AS m4s FROM r),
         |d AS (
         |  SELECT n,
         |    CAST(m2s AS DOUBLE) / n AS m2,
         |    CAST(m3s AS DOUBLE) / n AS m3,
         |    CAST(m4s AS DOUBLE) / n AS m4
         |  FROM m),
         |jb AS (
         |  SELECT n,
         |    m3 / (m2 * sqrt(m2)) AS skew,
         |    m4 / (m2 * m2) AS kurt
         |  FROM d)
         |SELECT n AS n_days,
         |  floor(skew * 1000000 + 0.5) / 1000000 AS skewness,
         |  floor(kurt * 1000000 + 0.5) / 1000000 AS kurtosis,
         |  floor(n * (skew * skew / 6
         |      + (kurt - 3) * (kurt - 3) / 24) * 1000000 + 0.5) / 1000000
         |    AS jb_stat,
         |  CAST(CASE WHEN n * (skew * skew / 6
         |      + (kurt - 3) * (kurt - 3) / 24) > 5.991465
         |    THEN 1 ELSE 0 END AS INT) AS reject_normal
         |FROM jb""".stripMargin }) { (s, dir) =>
      val x = dailyDollars(s, dir)
        .localCheckpoint() // feeds the total and the moment pass
      val st = x.agg(count(lit(1)).as("n"), sum(col("v")).as("tot"))
      val r = x.crossJoin(broadcast(st))
        .select((col("v") - expr("tot div n")).cast("decimal(38,0)")
          .as("r"), col("n"))
      val m = r.agg(max(col("n")).as("n"),
        sum(col("r") * col("r")).as("m2s"),
        sum(col("r") * col("r") * col("r")).as("m3s"),
        sum(col("r") * col("r") * col("r") * col("r")).as("m4s"))
      val d = m.select(col("n"),
        (col("m2s").cast("double") / col("n")).as("m2"),
        (col("m3s").cast("double") / col("n")).as("m3"),
        (col("m4s").cast("double") / col("n")).as("m4"))
      val jb = d.select(col("n"),
        (col("m3") / (col("m2") * sqrt(col("m2")))).as("skew"),
        (col("m4") / (col("m2") * col("m2"))).as("kurt"))
      val stat = col("n") * (col("skew") * col("skew") / 6
        + (col("kurt") - 3) * (col("kurt") - 3) / 24)
      jb.select(col("n").as("n_days"),
        (floor(col("skew") * lit(1000000) + lit(0.5)) / lit(1000000))
          .as("skewness"),
        (floor(col("kurt") * lit(1000000) + lit(0.5)) / lit(1000000))
          .as("kurtosis"),
        (floor(stat * lit(1000000) + lit(0.5)) / lit(1000000)).as("jb_stat"),
        when(stat > 5.991465, 1).otherwise(0).cast("int")
          .as("reject_normal"))
    },

    // B191: VON NEUMANN RATIO (von Neumann 1941) of the zero-filled
    // daily revenue series — the raw-series randomness screen
    // (VN = Σ(Δv)²/Σ(v−v̄)², E[VN] = 2n/(n−1) ≈ 2 under
    // independence; VN ≪ 2 means positive autocorrelation/trend,
    // VN ≫ 2 alternation): B163's Durbin-Watson on REGRESSION
    // residuals, this on the series itself — the one-number "is this
    // metric a random walk or noise" triage before fitting anything.
    // Exact: successive diffs via a day+1 self-join on the grid (no
    // global window), Σ(Δv)² in DECIMAL(38,0); denominator in the
    // n-scaled form Σ(n·v − tot)² = n²·Σdev² (exact — no mean
    // division); VN = num·n²/den ONE double division of exact
    // integers, 6dp floor. Scale shape: one keyed day agg; grid,
    // join and moments calendar-sized.
    Q("von_neumann_ratio", {
      s"""WITH $dailyDollarsSql,
         |s AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |             CAST(sum(v) AS BIGINT) AS tot FROM x),
         |num AS (
         |  SELECT sum(CAST(b.v - a.v AS HUGEINT)
         |    * CAST(b.v - a.v AS HUGEINT)) AS num
         |  FROM x a JOIN x b ON b.day = a.day + 1),
         |den AS (
         |  SELECT sum(CAST(s.n * x.v - s.tot AS HUGEINT)
         |    * CAST(s.n * x.v - s.tot AS HUGEINT)) AS den
         |  FROM x, s)
         |SELECT s.n AS n_days,
         |  CASE WHEN den.den > 0 THEN
         |    floor(CAST(num.num AS DOUBLE) * s.n * s.n
         |      / CAST(den.den AS DOUBLE) * 1000000 + 0.5) / 1000000
         |  END AS von_neumann
         |FROM s, num, den""".stripMargin }) { (s, dir) =>
      val x = dailyDollars(s, dir)
        .localCheckpoint() // feeds totals, diffs, and deviations
      val st = x.agg(count(lit(1)).as("n"), sum(col("v")).as("tot"))
      val a = x.select(col("day").as("da"), col("v").as("va"))
      val b = x.select(col("day").as("db"), col("v").as("vb"))
      val num = a.join(b, col("db") === col("da") + 1)
        .select(((col("vb") - col("va")).cast("decimal(38,0)")
          * (col("vb") - col("va")).cast("decimal(38,0)")).as("sq"))
        .agg(sum(col("sq")).as("num"))
      val den = x.crossJoin(broadcast(st))
        .select(((col("n") * col("v") - col("tot")).cast("decimal(38,0)")
          * (col("n") * col("v") - col("tot")).cast("decimal(38,0)"))
          .as("sq"))
        .agg(sum(col("sq")).as("den"))
      broadcast(st).crossJoin(broadcast(num)).crossJoin(broadcast(den))
        .select(col("n").as("n_days"),
          when(col("den") > 0,
            floor(col("num").cast("double") * col("n") * col("n")
              / col("den").cast("double") * lit(1000000) + lit(0.5))
              / lit(1000000)).as("von_neumann"))
    },

    // B194: PETTITT CHANGEPOINT TEST (Pettitt 1979) on the
    // zero-filled daily revenue series — the NONPARAMETRIC
    // changepoint (rank-based Mann-Whitney sweep: U_t compares
    // {1..t} against {t+1..n} at every split), the outlier-immune
    // companion to B122's least-squares changepoint and B152's
    // monotone-trend Mann-Kendall. Exact spelling: doubled midranks
    // r2 = 2·rank + ties − 1 are exact integers (the B114
    // convention); U2_t = Σ_{i≤t} r2_i − t·(n+1) = 2·U_t via one
    // prefix sum in day order; K = max|U_t| exact (U2 is even);
    // changepoint = earliest argmax day; significance against the
    // pinned −ln(0.025) = 3.688879 literal (K² > 3.688879·(n³+n²)/6
    // — cross-multiplied in exact integers, no sqrt needed). Scale
    // shape: one keyed day agg; ranks/prefix on the calendar-sized
    // grid (the day-grain window class).
    Q("pettitt_changepoint", {
      s"""WITH $dailyDollarsSql,
         |s AS (SELECT CAST(count(*) AS BIGINT) AS n FROM x),
         |rnk AS (
         |  SELECT day, v,
         |    CAST(2 * rank() OVER (ORDER BY v)
         |      + count(*) OVER (PARTITION BY v) - 1 AS BIGINT) AS r2
         |  FROM x),
         |u AS (
         |  SELECT day,
         |    CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t,
         |    CAST(sum(r2) OVER (ORDER BY day) AS BIGINT) AS s2
         |  FROM rnk),
         |uu AS (SELECT day, abs(s2 - t * (s.n + 1)) AS a2 FROM u, s),
         |k AS (SELECT CAST(max(a2) // 2 AS BIGINT) AS k_stat FROM uu),
         |arg AS (
         |  SELECT CAST(min(uu.day) AS BIGINT) AS cp_day
         |  FROM uu, k WHERE uu.a2 // 2 = k.k_stat)
         |SELECT s.n AS n_days, k.k_stat, arg.cp_day,
         |  CAST(CASE WHEN CAST(k.k_stat AS HUGEINT) * k.k_stat * 6
         |      > CAST(3688879 AS HUGEINT) * (s.n * s.n * s.n + s.n * s.n)
         |        / 1000000
         |    THEN 1 ELSE 0 END AS INT) AS signif
         |FROM s, k, arg""".stripMargin }) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val x = dailyDollars(s, dir)
        .localCheckpoint() // feeds count + the rank/prefix pass
      val st = x.agg(count(lit(1)).as("n"))
      val rnk = x.select(col("day"),
        (lit(2) * rank().over(Window.orderBy(col("v")))
          + count(lit(1)).over(Window.partitionBy(col("v"))) - 1)
          .cast("long").as("r2"))
      val u = rnk.select(col("day"),
        row_number().over(Window.orderBy(col("day"))).cast("long").as("t"),
        sum(col("r2")).over(Window.orderBy(col("day"))).as("s2"))
      val uu = u.crossJoin(broadcast(st))
        .select(col("day"), abs(col("s2") - col("t") * (col("n") + 1))
          .as("a2"), col("n"))
        .localCheckpoint() // the max and the argmax both read it
      val k = uu.agg(expr("max(a2) div 2").as("k_stat"),
        max(col("n")).as("n"))
      val arg = uu.join(broadcast(k.select(col("k_stat"))),
          expr("a2 div 2") === col("k_stat"))
        .agg(min(col("day")).as("cp_day"))
      broadcast(k).crossJoin(broadcast(arg))
        .select(col("n").as("n_days"), col("k_stat"), col("cp_day"),
          when(col("k_stat").cast("decimal(38,0)") * col("k_stat") * 6
              > lit(3688879).cast("decimal(38,0)")
                * (col("n") * col("n") * col("n") + col("n") * col("n"))
                / 1000000, 1)
            .otherwise(0).cast("int").as("signif"))
    },

    // B197: KUIPER TWO-SAMPLE TEST (Kuiper 1960) between purchase
    // and view value distributions — V = D⁺ + D⁻ (sup of F₁−F₂ plus
    // sup of F₂−F₁): where B120's KS sees only the single worst CDF
    // gap (and goes blind in the tails), Kuiper weighs BOTH signed
    // excursions equally — the test of choice when the two
    // directions of drift matter separately (and the cyclic-data
    // standard). Exact: rides B120's machinery verbatim — integer
    // prefix counts on the cents grid, signed sups as
    // cross-multiplied BIGINTs max(k1·n2 − k2·n1)/max(k2·n1 − k1·n2)
    // (each ≥ 0: the diff is 0 at the top of the grid), V ONE
    // division by n1·n2, 6dp floor. Scale shape: one keyed cents agg
    // (map-side combined) + the DistributedPrefixSum pass.
    Q("kuiper_two_sample",
      """WITH e AS (
        |  SELECT event_type = 'purchase' AS g1,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
        |  FROM events WHERE event_type IN ('purchase', 'view')),
        |v AS (
        |  SELECT c, CAST(count(*) FILTER (g1) AS BIGINT) AS c1,
        |    CAST(count(*) FILTER (NOT g1) AS BIGINT) AS c2
        |  FROM e GROUP BY c),
        |w AS (SELECT c, sum(c1) OVER (ORDER BY c) AS k1,
        |        sum(c2) OVER (ORDER BY c) AS k2
        |      FROM v),
        |tot AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
        |          CAST(sum(c2) AS BIGINT) AS n2 FROM v),
        |d AS (
        |  SELECT t.n1, t.n2,
        |    CAST(max(k1 * t.n2 - k2 * t.n1) AS BIGINT) AS d_pos,
        |    CAST(max(k2 * t.n1 - k1 * t.n2) AS BIGINT) AS d_neg
        |  FROM w, tot t GROUP BY t.n1, t.n2)
        |SELECT n1, n2, d_pos, d_neg,
        |  floor(CAST(d_pos + d_neg AS DOUBLE)
        |    / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))
        |    * 1000000 + 0.5) / 1000000 AS kuiper_v
        |FROM d""".stripMargin) { (s, dir) =>
      val v = table(s, dir, "events")
        .filter(col("event_type").isin("purchase", "view"))
        .select((col("event_type") === "purchase").as("g1"),
          floor(col("value") * 100 + lit(0.5)).cast("long").as("c"))
        .groupBy(col("c"))
        .agg(sum(col("g1").cast("long")).as("c1"),
          sum((!col("g1")).cast("long")).as("c2"))
        .withColumn("_g", lit("all"))
        .localCheckpoint() // two prefix passes + the total read it
      val w1 = DistributedPrefixSum.running(v, "_g", Seq("c"), "c1", "k1")
      val w = DistributedPrefixSum.running(w1, "_g", Seq("c"), "c2", "k2")
      val tot = v.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
      val d = w.crossJoin(broadcast(tot))
        .groupBy(col("n1"), col("n2"))
        .agg(max(col("k1") * col("n2") - col("k2") * col("n1")).as("d_pos"),
          max(col("k2") * col("n1") - col("k1") * col("n2")).as("d_neg"))
      d.select(col("n1"), col("n2"), col("d_pos"), col("d_neg"),
        (floor((col("d_pos") + col("d_neg")).cast("double")
          / (col("n1").cast("double") * col("n2").cast("double"))
          * lit(1000000) + lit(0.5)) / lit(1000000)).as("kuiper_v"))
    })
}
