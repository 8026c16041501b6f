package graft.queries

import graft.GraftSession.table
import graft.operators.VectorOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-10 closing wave: retrieval-quality evaluation — the metrics
  * a training-data pipeline runs over its OWN retrieval index (the
  * C6/C7/C52 ANN family) to decide whether the index is good enough
  * to mine hard negatives (C90) or dedup candidates from. Reference
  * scope: the reference's trip engine has no retrieval surface
  * (alfonso-higuera/flink-template AggregateTrips.kt:1-120 is the
  * whole analytics core); these extend the ANN family the way §2's
  * C-block extends the corpus ops.
  *
  * Shared determinism conventions (SummitQueries/AnalyticsQueries):
  * exact integers to one pinned double division, 6dp floor
  * `floor(x*1e6 + 0.5)/1e6`; cosine via the left-to-right ArrayDot
  * (= DuckDB list_dot_product) rounded to 6dp with (cosine DESC, id)
  * tie-break — the C6 contract.
  */
object PinnacleQueries {

  // Fixed-point DCG weights: w_r = round(1e6 / log2(r+1)) for rank
  // r = 1..10, pinned as INTEGER literals in BOTH engines (computing
  // 1/log2 live would hang cross-engine exactness on libm-vs-JVM ulp
  // agreement at the floor boundary; pinning makes DCG a sum of
  // exact integers). cumWeights(k) = Σ w_1..w_k for the ideal DCG.
  private val dcgW = Seq(1000000L, 630930L, 500000L, 430677L, 386853L,
    356207L, 333333L, 315465L, 301030L, 289065L)
  private val dcgCum = dcgW.scanLeft(0L)(_ + _).tail
  private val dcgWSqlValues = dcgW.zipWithIndex
    .map { case (w, i) => s"(${i + 1}, ${w})" }.mkString(", ")

  /** Shared DuckDB skeleton: exact-cosine top-10 with labels for the
    * first `nq` vectors as queries (self excluded) — the C6
    * brute-force contract plus the label columns the eval needs.
    */
  private def topSql(nq: Int): String =
    s"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
       |  FROM embeddings),
       |q AS (SELECT vec_id AS query_id, v AS qv, label AS qlabel
       |  FROM e WHERE vec_id < $nq),
       |scored AS (
       |  SELECT query_id, qlabel, e.vec_id AS id, e.label AS lbl,
       |    round(list_dot_product(qv, v)
       |      / (sqrt(list_dot_product(qv, qv))
       |         * sqrt(list_dot_product(v, v))), 6) AS cosine
       |  FROM e, q WHERE e.vec_id <> query_id),
       |ranked AS (
       |  SELECT query_id, qlabel, id, lbl,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY cosine DESC, id) AS rnk
       |  FROM scored),
       |top AS (SELECT * FROM ranked WHERE rnk <= 10)""".stripMargin

  /** Spark twin of [[topSql]]: brute-force top-10 (TopKPerKey — no
    * corpus sort) joined back to labels. Scale shape: |Q| is a
    * model-sized probe set broadcast against the corpus scan; the
    * label join broadcasts the ≤ |Q|·10 result rows' worth of ids
    * only if small — here it joins corpus-side labels via a plain
    * shuffle-free broadcast of the top rows.
    */
  private def sparkTop(s: org.apache.spark.sql.SparkSession, dir: String,
      nq: Int): org.apache.spark.sql.DataFrame = {
    val vecs = table(s, dir, "embeddings")
    val labels = vecs.select(col("vec_id"), col("label"))
    val top = VectorOps.bruteForceTopK(
      vecs, vecs.filter(col("vec_id") < nq), "vec_id", "embedding", k = 10)
    // top is |Q|·10 rows — broadcast IT against the label relation
    // twice (query label, neighbor label); labels stays a scan.
    broadcast(top)
      .join(labels.withColumnRenamed("vec_id", "query_id")
        .withColumnRenamed("label", "qlabel"), Seq("query_id"))
      .join(labels.withColumnRenamed("vec_id", "id")
        .withColumnRenamed("label", "lbl"), Seq("id"))
  }

  val all: Seq[Q] = Seq(

    // C123: RETRIEVAL EVAL — MRR@10, MAP@10, NDCG@10 per query
    // against label-match relevance (Manning/Raghavan/Schütze IR ch.8;
    // Järvelin & Kekäläinen 2002 for DCG). The three canonical
    // ranking metrics, all exact: RR and AP terms are rationals with
    // rank ≤ 10 denominators, scaled by lcm(1..10) = 2520 into exact
    // BIGINTs (2520/r is a whole number for every r ≤ 10); DCG uses
    // the pinned fixed-point weight table above. One double division
    // per metric at the end, 6dp floor. AP@10 = Σ_hit P(rank)·rel /
    // min(R, 10) with R = same-label corpus count (the standard
    // truncated-AP denominator). Scale shape: corpus×|Q| scored rows
    // flow through the bounded TopKPerKey heap (no sort); everything
    // after is |Q|·10 rows — model-sized windows.
    Q("retrieval_eval",
      s"""WITH ${topSql(10)},
         |rel AS (
         |  SELECT query_id, rnk,
         |    CASE WHEN lbl = qlabel THEN 1 ELSE 0 END AS rel
         |  FROM top),
         |relr AS (
         |  SELECT query_id, rnk, rel,
         |    CAST(sum(rel) OVER (PARTITION BY query_id ORDER BY rnk)
         |      AS BIGINT) AS relcnt
         |  FROM rel),
         |w AS (SELECT * FROM (VALUES $dcgWSqlValues) AS t(rnk, wt)),
         |nrel AS (
         |  SELECT q.query_id, CAST(count(*) AS BIGINT) AS n_rel
         |  FROM q JOIN e ON e.label = q.qlabel AND e.vec_id <> q.query_id
         |  GROUP BY 1),
         |m AS (
         |  SELECT r.query_id,
         |    min(CASE WHEN r.rel = 1 THEN r.rnk END) AS first_rel,
         |    CAST(sum(CASE WHEN r.rel = 1
         |      THEN (2520 // r.rnk) * r.relcnt ELSE 0 END) AS BIGINT)
         |      AS ap_num,
         |    CAST(sum(r.rel * w.wt) AS BIGINT) AS dcg_w
         |  FROM relr r JOIN w ON w.rnk = r.rnk GROUP BY 1),
         |idcg AS (
         |  SELECT n.query_id, n.n_rel, CAST(sum(w.wt) AS BIGINT) AS idcg_w
         |  FROM nrel n JOIN w ON w.rnk <= LEAST(n.n_rel, 10)
         |  GROUP BY 1, 2)
         |SELECT m.query_id, i.n_rel,
         |  CASE WHEN m.first_rel IS NOT NULL THEN
         |    floor(CAST(2520 // m.first_rel AS DOUBLE) / 2520
         |      * 1000000 + 0.5) / 1000000 ELSE 0.0 END AS rr,
         |  CASE WHEN i.n_rel > 0 THEN
         |    floor(CAST(m.ap_num AS DOUBLE)
         |      / (2520.0 * LEAST(i.n_rel, 10)) * 1000000 + 0.5) / 1000000
         |    ELSE 0.0 END AS ap,
         |  CASE WHEN i.n_rel > 0 THEN
         |    floor(CAST(m.dcg_w AS DOUBLE) / CAST(i.idcg_w AS DOUBLE)
         |      * 1000000 + 0.5) / 1000000 ELSE 0.0 END AS ndcg
         |FROM m JOIN idcg i ON m.query_id = i.query_id""".stripMargin) {
      (s, dir) =>
        val top = sparkTop(s, dir, nq = 10)
          .select(col("query_id"), col("rnk"),
            when(col("lbl") === col("qlabel"), lit(1)).otherwise(lit(0))
              .as("rel"))
        // |Q|·10 rows from here — model-sized keyed window
        val relr = top.withColumn("relcnt",
          sum(col("rel")).over(Window.partitionBy(col("query_id"))
            .orderBy(col("rnk"))).cast("long"))
        val wArr = array(dcgW.map(lit): _*)
        val cumArr = array(dcgCum.map(lit): _*)
        val m = relr
          .withColumn("wt", element_at(wArr, col("rnk")))
          .groupBy(col("query_id"))
          .agg(min(when(col("rel") === 1, col("rnk"))).as("first_rel"),
            sum(when(col("rel") === 1,
              (lit(2520) / col("rnk")).cast("long") * col("relcnt"))
              .otherwise(lit(0L))).as("ap_num"),
            sum(col("rel").cast("long") * col("wt")).as("dcg_w"))
        val vecs = table(s, dir, "embeddings")
        val labels = vecs.select(col("vec_id"), col("label"))
        val nrel = broadcast(
          labels.filter(col("vec_id") < 10)
            .select(col("vec_id").as("query_id"), col("label").as("qlabel")))
          .join(labels, col("label") === col("qlabel")
            && col("vec_id") =!= col("query_id"))
          .groupBy(col("query_id")).agg(count(lit(1)).as("n_rel"))
          .withColumn("idcg_w", element_at(cumArr, least(col("n_rel"), lit(10L)).cast("int")))
        def dp6(c: org.apache.spark.sql.Column) =
          floor(c * 1000000 + lit(0.5)) / 1000000
        m.join(nrel, Seq("query_id"))
          .select(col("query_id"), col("n_rel"),
            when(col("first_rel").isNotNull,
              dp6((lit(2520) / col("first_rel")).cast("long")
                .cast("double") / 2520)).otherwise(lit(0.0)).as("rr"),
            when(col("n_rel") > 0,
              dp6(col("ap_num").cast("double")
                / (lit(2520.0) * least(col("n_rel"), lit(10L)))))
              .otherwise(lit(0.0)).as("ap"),
            when(col("n_rel") > 0,
              dp6(col("dcg_w").cast("double") / col("idcg_w").cast("double")))
              .otherwise(lit(0.0)).as("ndcg"))
    },

    // C124: k-NN CLASSIFICATION by retrieval — majority label vote
    // over the exact cosine top-10 (Cover & Hart 1967), the
    // classification-by-index pattern that closes the trained-family
    // loop from the retrieval side (Rocchio C86 classifies by
    // centroid, NB C96 by likelihood; k-NN by neighborhood). Vote
    // tie-break is (votes DESC, label ASC) — fully deterministic.
    // Scale shape: identical to C123 (bounded heap, then |Q|·10 rows).
    Q("knn_classify",
      s"""WITH ${topSql(25)},
         |votes AS (
         |  SELECT query_id, qlabel, lbl, CAST(count(*) AS BIGINT) AS votes
         |  FROM top GROUP BY 1, 2, 3),
         |best AS (
         |  SELECT query_id, qlabel, lbl, votes,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY votes DESC, lbl) AS vr
         |  FROM votes)
         |SELECT query_id, CAST(qlabel AS INT) AS true_label,
         |  CAST(lbl AS INT) AS pred_label, votes,
         |  CAST(CASE WHEN lbl = qlabel THEN 1 ELSE 0 END AS INT) AS correct
         |FROM best WHERE vr = 1""".stripMargin) { (s, dir) =>
      val votes = sparkTop(s, dir, nq = 25)
        .groupBy(col("query_id"), col("qlabel"), col("lbl"))
        .agg(count(lit(1)).as("votes"))
      // ≤ 10 vote rows per query — model-sized keyed window
      votes.withColumn("vr",
          row_number().over(Window.partitionBy(col("query_id"))
            .orderBy(col("votes").desc, col("lbl"))))
        .filter(col("vr") === 1)
        .select(col("query_id"), col("qlabel").cast("int").as("true_label"),
          col("lbl").cast("int").as("pred_label"), col("votes"),
          when(col("lbl") === col("qlabel"), lit(1)).otherwise(lit(0))
            .cast("int").as("correct"))
    })
}
