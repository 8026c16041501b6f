package graft.queries

import graft.GraftSession.table
import graft.functions.{BitmapDistinct, HllSketch, TextFunctions => TF, VectorExpressions}
import graft.operators.{AsOfJoin, RangeJoin}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-9 additions (SURVEY.md §2 B79-B82): marketing attribution,
  * interval-overlap join, bitmap exact-distinct, and HLL
  * sketch-column rollup.
  *
  * Conventions as elsewhere: epoch seconds / cents / counts as exact
  * integers so oracle rows compare bit-for-bit; events normalized to
  * the epoch-nanos BIGINT `ts` contract (GraftSession.normalizeEvents).
  */
object FrontierQueries {

  private val eventsCte =
    """e AS (
      |  SELECT event_id, user_id, event_type, value,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS tsec
      |  FROM events)""".stripMargin

  // Attribution lookback window (seconds).
  private val AttribWindowS = 3600L
  // Activity-interval inactivity gap (seconds) for the overlap join's
  // left side; storm buckets are 300 s wide with a >= 3 error floor.
  private val ActivityGapS = 600L
  private val StormBucketS = 300L
  // >= 2 errors per bucket so the smallest SF (sf0.001: ~200 errors
  // over a month) still produces a non-empty storm set to join.
  private val StormMinErrors = 2L

  private def events(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "events").select(
      col("event_id"), col("user_id"), col("event_type"), col("value"),
      expr("ts div 1000000000").as("tsec"))

  val all: Seq[Q] = Seq(

    // B79: LAST-TOUCH ATTRIBUTION — credit each purchase to the
    // user's most recent click within a 1-hour lookback. The classic
    // marketing-warehouse join, and the workload the as-of operator
    // exists for: one union-sort pass (AsOfJoin.asofBackward), never
    // a per-purchase range join over the click stream. Clicks are
    // deduped to one per (user, second) keep-highest-event-id first —
    // same-instant ties would otherwise make ASOF nondeterministic in
    // both engines. All outputs exact integers / null.
    Q("attribution_last_touch",
      s"""WITH $eventsCte,
         |p AS (SELECT event_id AS purchase_id, user_id, tsec AS purchase_s,
         |        CAST(floor(value * 100) AS BIGINT) AS cents
         |      FROM e WHERE event_type = 'purchase'),
         |c0 AS (SELECT user_id, tsec, event_id FROM e WHERE event_type = 'click'),
         |c AS (SELECT user_id, tsec, event_id FROM (
         |        SELECT user_id, tsec, event_id,
         |          row_number() OVER (PARTITION BY user_id, tsec ORDER BY event_id DESC) AS rn
         |        FROM c0) WHERE rn = 1),
         |j AS (SELECT p.purchase_id, p.user_id, p.purchase_s, p.cents,
         |        c.event_id AS click_id0, c.tsec AS click_s0
         |      FROM p ASOF LEFT JOIN c
         |        ON p.user_id = c.user_id AND p.purchase_s >= c.tsec)
         |SELECT purchase_id, user_id, purchase_s, cents,
         |  CASE WHEN click_s0 IS NOT NULL AND purchase_s - click_s0 <= $AttribWindowS
         |    THEN click_id0 END AS click_id,
         |  CASE WHEN click_s0 IS NOT NULL AND purchase_s - click_s0 <= $AttribWindowS
         |    THEN click_s0 END AS click_s,
         |  CAST(CASE WHEN click_s0 IS NOT NULL AND purchase_s - click_s0 <= $AttribWindowS
         |    THEN 1 ELSE 0 END AS BIGINT) AS attributed
         |FROM j""".stripMargin) { (s, dir) =>
      val e = events(s, dir)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("tsec"), floor(col("value") * 100).cast("long").as("cents"))
      val w = Window.partitionBy(col("user_id"), col("tsec")).orderBy(col("event_id").desc)
      val clicks = e.filter(col("event_type") === "click")
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("user_id"), col("tsec"),
          col("tsec").as("click_s"), col("event_id").as("click_id"))
      val inWindow = col("asof_click_s").isNotNull &&
        col("tsec") - col("asof_click_s") <= AttribWindowS
      AsOfJoin.asofBackward(
          purchases, clicks,
          keyCol = "user_id", tsCol = "tsec",
          valueCols = Seq("click_s", "click_id"))
        .select(col("purchase_id"), col("user_id"),
          col("tsec").as("purchase_s"), col("cents"),
          when(inWindow, col("asof_click_id")).as("click_id"),
          when(inWindow, col("asof_click_s")).as("click_s"),
          when(inWindow, 1L).otherwise(0L).as("attributed"))
    },

    // B80: INTERVAL-OVERLAP JOIN — which user activity intervals
    // overlap system error storms? Left side: per-user gaps-and-
    // islands activity intervals (600 s inactivity gap) over DISTINCT
    // (user, second) points — per-user windows, small groups by the
    // B45 rule. Right side: 5-minute buckets holding >= 3 error
    // events (one keyed agg — deliberately NOT a global gaps-and-
    // islands pass, which would serialize the whole table through one
    // window partition). The join itself is the new
    // RangeJoin.intervalOverlap: both interval sets explode into
    // 600 s buckets, equi-join on the bucket, overlap predicate
    // refines, and each pair is emitted exactly once in the canonical
    // bucket of max(starts) — no dedup exchange. Spark's native plan
    // for interval × interval inequality joins is a nested-loop
    // cartesian; this is the spelling that survives 100 TB.
    Q("interval_overlap_join",
      s"""WITH $eventsCte,
         |pt AS (SELECT DISTINCT user_id, tsec FROM e),
         |a0 AS (SELECT user_id, tsec,
         |         CASE WHEN tsec - lag(tsec) OVER (PARTITION BY user_id ORDER BY tsec)
         |           > $ActivityGapS THEN 1 ELSE 0 END AS brk
         |       FROM pt),
         |a1 AS (SELECT user_id, tsec,
         |         sum(brk) OVER (PARTITION BY user_id ORDER BY tsec
         |           ROWS UNBOUNDED PRECEDING) AS grp
         |       FROM a0),
         |act AS (SELECT user_id, min(tsec) AS a_start, max(tsec) AS a_end,
         |          CAST(count(*) AS BIGINT) AS n_pts
         |        FROM a1 GROUP BY user_id, grp),
         |storm AS (SELECT (tsec // $StormBucketS) * $StormBucketS AS b_start,
         |            (tsec // $StormBucketS) * $StormBucketS + ${StormBucketS - 1} AS b_end,
         |            CAST(count(*) AS BIGINT) AS n_err
         |          FROM e WHERE event_type = 'error'
         |          GROUP BY 1, 2 HAVING count(*) >= $StormMinErrors)
         |SELECT a.user_id, a.a_start, a.a_end, a.n_pts, s.b_start, s.n_err,
         |  least(a.a_end, s.b_end) - greatest(a.a_start, s.b_start) + 1 AS overlap_s
         |FROM act a JOIN storm s
         |  ON a.a_start <= s.b_end AND s.b_start <= a.a_end""".stripMargin) { (s, dir) =>
      val e = events(s, dir)
      val pts = e.select(col("user_id"), col("tsec")).distinct()
      val wOrd = Window.partitionBy(col("user_id")).orderBy(col("tsec"))
      val act = pts
        .withColumn("brk",
          when(col("tsec") - lag(col("tsec"), 1).over(wOrd) > ActivityGapS, 1)
            .otherwise(0))
        .withColumn("grp", sum(col("brk")).over(
          wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("grp"))
        .agg(min(col("tsec")).as("a_start"), max(col("tsec")).as("a_end"),
          count(lit(1)).as("n_pts"))
        .drop("grp")
      val storms = e.filter(col("event_type") === "error")
        .groupBy(expr(s"(tsec div $StormBucketS) * $StormBucketS").as("b_start"))
        .agg(count(lit(1)).as("n_err"))
        .filter(col("n_err") >= StormMinErrors)
        .withColumn("b_end", col("b_start") + (StormBucketS - 1))
      RangeJoin.intervalOverlap(act, storms,
          lStart = "a_start", lEnd = "a_end", rStart = "b_start", rEnd = "b_end",
          bucketWidth = 2 * StormBucketS)
        .select(col("user_id"), col("a_start"), col("a_end"), col("n_pts"),
          col("b_start"), col("n_err"),
          (least(col("a_end"), col("b_end")) - greatest(col("a_start"), col("b_start")) + 1)
            .as("overlap_s"))
    },

    // B81: BITMAP EXACT DISTINCT — exact per-type distinct users via
    // the fixed-size bitset aggregate (graft.functions.BitmapDistinct).
    // count(DISTINCT) plans an Expand + a shuffle of every distinct
    // value; the bitmap ships one 8 KiB buffer per (group, task) at
    // ANY cardinality within the declared dense domain [0, 2^16), and
    // ids outside the domain fail loudly rather than undercount. The
    // oracle is the exact count — the aggregate's whole claim.
    Q("bitmap_distinct_users",
      """SELECT event_type,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |  CAST(count(*) AS BIGINT) AS n_events
        |FROM events GROUP BY event_type""".stripMargin) { (s, dir) =>
      events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          BitmapDistinct.bitmapDistinct(col("user_id"), 1 << 16).as("n_users"),
          count(lit(1)).as("n_events"))
    },

    // B82: HLL SKETCH-COLUMN ROLLUP — materialize per-(type, day)
    // HLL register buffers (HllSketchBin), then roll up to per-type
    // distinct estimates by UNIONING THE SKETCHES (HllUnionEstimate),
    // never rescanning the raw events: the Druid/BigQuery
    // HLL_COUNT.INIT/MERGE pattern, and at 100 TB the difference
    // between one scan per reporting grain and one scan total.
    // Register union is exactly the sketch of the union, so the
    // merged estimate must equal the direct single-pass estimate
    // BIT-FOR-BIT (merged_eq_direct) — a determinism gate, not a
    // tolerance — beside the usual exact-count 5% bound.
    Q("hll_union_rollup",
      """SELECT event_type,
        |  CAST(count(DISTINCT (CAST(floor(epoch(ts)) AS BIGINT) // 86400)) AS BIGINT)
        |    AS n_days,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
        |  CAST(1 AS BIGINT) AS merged_eq_direct,
        |  CAST(1 AS BIGINT) AS within_bound
        |FROM events GROUP BY event_type""".stripMargin) { (s, dir) =>
      val e = events(s, dir).withColumn("day", expr("tsec div 86400"))
      val daily = e.groupBy(col("event_type"), col("day"))
        .agg(HllSketch.hllSketchBin(col("user_id")).as("sk"))
      val rolled = daily.groupBy(col("event_type"))
        .agg(HllSketch.hllUnionEstimate(col("sk")).as("est_merged"),
          count(lit(1)).as("n_days"))
      val direct = e.groupBy(col("event_type"))
        .agg(HllSketch.hllDistinct(col("user_id")).as("est_direct"),
          countDistinct(col("user_id")).as("n_exact"))
      rolled.join(direct, Seq("event_type"))
        .select(col("event_type"), col("n_days"), col("n_exact"),
          when(col("est_merged") === col("est_direct"), 1L).otherwise(0L)
            .as("merged_eq_direct"),
          when(abs(col("est_merged") - col("n_exact")) <=
            greatest(lit(2.0), col("n_exact") * 0.05), 1L).otherwise(0L)
            .as("within_bound"))
    },

    // C58: CORPUS TOKEN DRIFT — add-one-smoothed KL divergence
    // KL(en || L) between the English token distribution and each
    // other language's, the data-drift / domain-shift monitor a
    // training pipeline runs between corpus snapshots or sources.
    // Scale shape: ONE corpus scan → one keyed (lang, token) count
    // exchange; everything after is MODEL-sized (vocab tables), the
    // C24/C42 discipline. Determinism: per-token contributions are
    // quantized to INTEGER micro-units (the C42 DSIR convention) —
    // floor(1e6·(cP+1)·ln(ratio)) where ratio is a quotient of exact
    // integer products — so the per-lang sum is an order-independent
    // BIGINT and the final `kl` is a single division of exact
    // integers, bit-equal across engines.
    Q("corpus_token_drift", {
      val toksSql = """string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')"""
      s"""WITH t AS (SELECT lang, $toksSql AS toks FROM documents),
         |tok AS (SELECT lang, unnest(toks) AS w FROM t),
         |tc AS (SELECT lang, w, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY lang, w),
         |en AS (SELECT w, c AS c_p FROM tc WHERE lang = 'en'),
         |oth AS (SELECT lang, w, c AS c_q FROM tc WHERE lang <> 'en'),
         |np AS (SELECT CAST(sum(c_p) AS BIGINT) AS n_p FROM en),
         |langs AS (SELECT DISTINCT lang FROM oth),
         |enx AS (SELECT l.lang, e.w, e.c_p FROM en e CROSS JOIN langs l),
         |u AS (SELECT coalesce(a.lang, b.lang) AS lang, coalesce(a.w, b.w) AS w,
         |        coalesce(a.c_p, 0) AS c_p, coalesce(b.c_q, 0) AS c_q
         |      FROM enx a FULL OUTER JOIN oth b ON a.lang = b.lang AND a.w = b.w),
         |tot AS (SELECT lang, CAST(sum(c_q) AS BIGINT) AS n_q,
         |          CAST(count(*) AS BIGINT) AS v FROM u GROUP BY lang),
         |contrib AS (
         |  SELECT u.lang,
         |    CAST(floor((u.c_p + 1) * ln(
         |      CAST((u.c_p + 1) * (t.n_q + t.v) AS DOUBLE) /
         |      CAST((u.c_q + 1) * (p.n_p + t.v) AS DOUBLE)) * 1000000.0) AS BIGINT)
         |      AS k_micro
         |  FROM u JOIN tot t ON u.lang = t.lang CROSS JOIN np p)
         |SELECT c.lang, p.n_p, t.n_q, t.v,
         |  CAST(sum(c.k_micro) AS BIGINT) AS kl_micro,
         |  CAST(sum(c.k_micro) AS DOUBLE) / 1000000.0 / (p.n_p + t.v) AS kl
         |FROM contrib c JOIN tot t ON c.lang = t.lang CROSS JOIN np p
         |GROUP BY c.lang, p.n_p, t.n_q, t.v""".stripMargin
    }) { (s, dir) =>
      val tc = table(s, dir, "documents")
        .select(col("lang"), explode(split(TF.normalizeText(col("text")), " ")).as("w"))
        .groupBy(col("lang"), col("w")).agg(count(lit(1)).as("c"))
        .localCheckpoint() // model-sized; cut the explode off replays
      val en = tc.filter(col("lang") === "en").select(col("w"), col("c").as("c_p"))
      val oth = tc.filter(col("lang") =!= "en")
        .select(col("lang"), col("w"), col("c").as("c_q"))
      val nP = en.agg(sum(col("c_p")).as("n_p"))
      val langs = oth.select(col("lang")).distinct()
      val enx = en.crossJoin(broadcast(langs))
      val u = enx.join(oth, Seq("lang", "w"), "full_outer")
        .select(col("lang"), col("w"),
          coalesce(col("c_p"), lit(0L)).as("c_p"),
          coalesce(col("c_q"), lit(0L)).as("c_q"))
      val tot = u.groupBy(col("lang"))
        .agg(sum(col("c_q")).as("n_q"), count(lit(1)).as("v"))
      u.join(tot, Seq("lang")).crossJoin(broadcast(nP))
        .withColumn("k_micro", expr(
          """CAST(floor((c_p + 1) * ln(
            |  CAST((c_p + 1) * (n_q + v) AS DOUBLE) /
            |  CAST((c_q + 1) * (n_p + v) AS DOUBLE)) * 1000000.0) AS BIGINT)""".stripMargin))
        .groupBy(col("lang"), col("n_p"), col("n_q"), col("v"))
        .agg(sum(col("k_micro")).as("kl_micro"))
        .withColumn("kl",
          col("kl_micro").cast("double") / 1000000.0 / (col("n_p") + col("v")))
    },

    // C59: EMBEDDING DIVERSITY SAMPLE — farthest-point (k-center
    // greedy / Gonzalez) selection of k maximally-spread vectors: the
    // coreset/diversity primitive behind "pick representative docs
    // for eval" and k-means++-style seeding. Each round is ONE
    // corpus-scale scan (squared-L2 distance to the ≤k selected
    // vectors, broadcast as literals) + a map-side-combinable
    // min(struct(-dist, id)) argmax — only k single rows ever reach
    // the driver, and k is a constant (4), so the plan is k scans at
    // any corpus size. Determinism: distances are the pinned
    // left-to-right ArrayDot folds (`d(x,s) = x·x − 2·x·s + s·s`,
    // identical expression order in DuckDB's list_dot_product
    // replay), argmax ties break on vec_id ascending in both engines.
    Q("embed_diversity_sample", {
      val d = (v: String, sv: String) =>
        s"(list_dot_product($v, $v) - 2 * list_dot_product($v, $sv) + list_dot_product($sv, $sv))"
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |s1 AS (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 1),
         |d1 AS (SELECT e.vec_id, e.v, ${d("e.v", "s1.v")} AS md FROM e, s1),
         |s2 AS (SELECT vec_id, v, md FROM d1 ORDER BY md DESC, vec_id LIMIT 1),
         |d2 AS (SELECT d1.vec_id, d1.v, least(d1.md, ${d("d1.v", "s2.v")}) AS md
         |       FROM d1, s2),
         |s3 AS (SELECT vec_id, v, md FROM d2 ORDER BY md DESC, vec_id LIMIT 1),
         |d3 AS (SELECT d2.vec_id, d2.v, least(d2.md, ${d("d2.v", "s3.v")}) AS md
         |       FROM d2, s3),
         |s4 AS (SELECT vec_id, v, md FROM d3 ORDER BY md DESC, vec_id LIMIT 1)
         |SELECT 1 AS rank, vec_id, CAST(NULL AS DOUBLE) AS min_dist FROM s1
         |UNION ALL SELECT 2, vec_id, floor(md * 10000 + 0.5) / 10000 FROM s2
         |UNION ALL SELECT 3, vec_id, floor(md * 10000 + 0.5) / 10000 FROM s3
         |UNION ALL SELECT 4, vec_id, floor(md * 10000 + 0.5) / 10000 FROM s4""".stripMargin
    }) { (s, dir) =>
      val K = 4
      val e = table(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        .localCheckpoint()
      def dot(a: Column, b: Column): Column = VectorExpressions.arrayDot(a, b)
      // seed: lowest vec_id (one bounded-heap row to the driver)
      val seedRow = e.orderBy(col("vec_id")).limit(1)
        .select(col("vec_id"), col("v")).head()
      var selected = Seq((seedRow.getLong(0), seedRow.getSeq[Double](1).toArray))
      var out = Seq((1, seedRow.getLong(0), Option.empty[Double]))
      while (selected.size < K) {
        val dists = selected.map { case (_, sv) =>
          val svl = typedLit(sv)
          dot(col("v"), col("v")) - lit(2.0) * dot(col("v"), svl) + dot(svl, svl)
        }
        val md = dists.reduceLeft(least(_, _))
        val top = e.select(col("vec_id"), col("v"), md.as("md"))
          .agg(min(struct((col("md") * -1.0).as("neg"), col("vec_id"), col("v")))
            .as("m"))
          .select(col("m.vec_id"), col("m.v"), (col("m.neg") * -1.0).as("md"))
          .head()
        selected :+= ((top.getLong(0), top.getSeq[Double](1).toArray))
        out :+= ((selected.size, top.getLong(0), Some(top.getDouble(2))))
      }
      import s.implicits._
      out.map { case (r, id, mdv) =>
        (r, id, mdv.map(x => math.floor(x * 10000 + 0.5) / 10000))
      }.toDF("rank", "vec_id", "min_dist")
        .select(col("rank").cast("int"), col("vec_id"), col("min_dist"))
    }
  )
}
