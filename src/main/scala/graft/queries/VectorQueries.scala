package graft.queries

import graft.GraftSession.table
import graft.operators.{Quantize, VectorOps}
import org.apache.spark.sql.functions._

/** Embedding-analytics queries (SURVEY.md §2 C18-C19): per-label
  * centroids (the k-means M-step / class-prototype computation) and
  * nearest-centroid assignment (E-step). Both fully declarative:
  * posexplode + keyed aggregation, broadcast centroids × one corpus
  * scan — at 100 TB the centroid table stays tiny and the corpus is
  * touched once.
  */
object VectorQueries {

  /** DuckDB replay of one Lloyd E-step against centroids CTE `cs`
    * over vectors CTE `eName` (default `e`): 6dp-rounded squared
    * euclidean, tie-break on (d2, cluster). Shared with DedupQueries'
    * trained-codebook semantic_dedup and the per-subspace PQ chains.
    */
  private[queries] def assignCte(cs: String, eName: String = "e"): String =
    s"""SELECT vec_id, v, cluster FROM (
       |    SELECT e.vec_id, e.v, c.cluster,
       |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |        round(list_dot_product(e.v, e.v) - 2 * list_dot_product(e.v, c.cv)
       |          + list_dot_product(c.cv, c.cv), 6), c.cluster) AS rn
       |    FROM $eName e, $cs c) WHERE rn = 1""".stripMargin

  /** Shard-keyed variant of [[assignCte]] — one Lloyd E-step where
    * each vector competes only against ITS shard's centroids (`cs`
    * carries (shard, cluster, cv); `eName` carries (shard, vec_id,
    * v)). The closed-form replay of `KMeans.assignPerGroup`, shared
    * with DedupQueries' sharded semantic_dedup.
    */
  private[queries] def assignShardCte(cs: String, eName: String): String =
    s"""SELECT shard, vec_id, v, cluster FROM (
       |    SELECT e.shard, e.vec_id, e.v, c.cluster,
       |      row_number() OVER (PARTITION BY e.shard, e.vec_id ORDER BY
       |        round(list_dot_product(e.v, e.v) - 2 * list_dot_product(e.v, c.cv)
       |          + list_dot_product(c.cv, c.cv), 6), c.cluster) AS rn
       |    FROM $eName e JOIN $cs c ON e.shard = c.shard) WHERE rn = 1""".stripMargin

  /** Shard-keyed variant of [[mStepCte]]: per (shard, cluster, dim)
    * 6dp-rounded mean — the `KMeans.fitPerGroup` M-step closed-form.
    */
  private[queries] def mStepShardCte(as_ : String): String =
    s"""SELECT shard, cluster, list(c ORDER BY dim) AS cv FROM (
       |    SELECT shard, cluster, dim, round(avg(val), 6) AS c FROM (
       |      SELECT shard, cluster, unnest(range(len(v))) AS dim, unnest(v) AS val
       |      FROM $as_)
       |    GROUP BY shard, cluster, dim) GROUP BY shard, cluster""".stripMargin

  /** DuckDB replay of one M-step over assignments CTE `as_`: per
    * (cluster, dim) 6dp-rounded mean, re-assembled into an array.
    */
  private[queries] def mStepCte(as_ : String): String =
    s"""SELECT cluster, list(c ORDER BY dim) AS cv FROM (
       |    SELECT cluster, dim, round(avg(val), 6) AS c FROM (
       |      SELECT cluster, unnest(range(len(v))) AS dim, unnest(v) AS val
       |      FROM $as_)
       |    GROUP BY cluster, dim) GROUP BY cluster""".stripMargin

  private val kmeansIterationsQuery: Q =
    Q("kmeans_iterations",
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INT) AS cluster,
         |         v AS cv FROM e WHERE vec_id < 8),
         |a1 AS (${assignCte("c0")}),
         |c1 AS (${mStepCte("a1")}),
         |a2 AS (${assignCte("c1")}),
         |c2 AS (${mStepCte("a2")}),
         |a3 AS (${assignCte("c2")})
         |SELECT vec_id, cluster AS assigned FROM a3""".stripMargin) { (s, dir) =>
      val e = table(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val (assigned, _) = graft.operators.KMeans.fit(
        e, "vec_id", "v", k = 8, iterations = 2, roundTo = Some(6))
      assigned.select(col("id").as("vec_id"), col("cluster").as("assigned"))
    }

  /** DuckDB replay of the TRAINED vector pipeline: two Lloyd rounds
    * (the kmeans_iterations CTEs, 6dp deterministic mode) produce the
    * codebook, then the IVF index/search replays on it — cell argmin
    * and probe ranking by UNROUNDED d2 over the bit-equal trained
    * centroids, in-cell cosine rerank rounded 6dp. Train → index →
    * search, every step closed-form.
    */
  private val trainedIvfOracleSql: String = {
    val d2 = "list_dot_product(%s, %s) - 2 * list_dot_product(%s, c.cv) + list_dot_product(c.cv, c.cv)"
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INT) AS cluster,
       |         v AS cv FROM e WHERE vec_id < 8),
       |a1 AS (${assignCte("c0")}),
       |c1 AS (${mStepCte("a1")}),
       |a2 AS (${assignCte("c1")}),
       |c2 AS (${mStepCte("a2")}),
       |cent AS (SELECT cluster AS cid, cv FROM c2),
       |asg AS (
       |  SELECT vec_id, v, cid FROM (
       |    SELECT e.vec_id, e.v, c.cid,
       |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |        ${d2.format("e.v", "e.v", "e.v")}, c.cid) AS rn
       |    FROM e, cent c) WHERE rn = 1),
       |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
       |probes AS (
       |  SELECT query_id, qv, cid FROM (
       |    SELECT q.query_id, q.qv, c.cid,
       |      row_number() OVER (PARTITION BY q.query_id ORDER BY
       |        ${d2.format("q.qv", "q.qv", "q.qv")}, c.cid) AS rn
       |    FROM q, cent c) WHERE rn <= 3),
       |scored AS (
       |  SELECT p.query_id, a.vec_id AS id,
       |    round(list_dot_product(p.qv, a.v)
       |      / (sqrt(list_dot_product(p.qv, p.qv)) * sqrt(list_dot_product(a.v, a.v))), 6) AS cosine
       |  FROM asg a JOIN probes p USING (cid)
       |  WHERE a.vec_id <> p.query_id)
       |SELECT query_id, id, cosine, rnk FROM (
       |  SELECT query_id, id, cosine,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, id) AS rnk
       |  FROM scored)
       |WHERE rnk <= 10""".stripMargin
  }

  /** DuckDB replay of PowerIteration.pc1: scatter (4dp, the
    * embedding_covariance noise-floor argument), then `iters` power
    * iterations — matvec rows, norm, and projection all fold in
    * ascending index order from 0.0 (the ArrayDot order), iterates
    * renormalized and rounded 6dp. Ends with CTEs `s` (scatter),
    * `v$iters` (the component), `u` (exploded corpus).
    */
  private def pc1Ctes(iters: Int): String = {
    val base =
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |cnt AS (SELECT count(*) AS n FROM e),
         |u AS (SELECT vec_id, CAST(i AS INT) AS i, v[CAST(i + 1 AS INT)] AS vi, v
         |      FROM e, unnest(range(len(v))) AS ui(i)),
         |p AS (SELECT u.i, CAST(j AS INT) AS j, u.vi, u.v[CAST(j + 1 AS INT)] AS vj
         |      FROM u, unnest(range(len(u.v))) AS uj(j)),
         |g AS (SELECT i, j, sum(vi * vj) AS sxy FROM p GROUP BY i, j),
         |m AS (SELECT CAST(i AS INT) AS i, sum(v[CAST(i + 1 AS INT)]) AS sx
         |      FROM e, unnest(range(len(v))) AS um(i) GROUP BY i),
         |s AS (SELECT g.i, g.j, round(g.sxy - mi.sx * mj.sx / cnt.n, 4) AS sv
         |      FROM g, cnt
         |      JOIN m mi ON g.i = mi.i
         |      JOIN m mj ON g.j = mj.i),
         |v0 AS (SELECT i, round(1.0 / sqrt(64.0), 6) AS x
         |       FROM (SELECT DISTINCT i FROM s))""".stripMargin
    val steps = (1 to iters).map { k =>
      s"""w$k AS (SELECT s.i,
         |  list_reduce(list_prepend(0.0, list(s.sv * v${k - 1}.x ORDER BY s.j)),
         |    (a, b) -> a + b) AS w
         |  FROM s JOIN v${k - 1} ON s.j = v${k - 1}.i GROUP BY s.i),
         |n$k AS (SELECT sqrt(list_reduce(list_prepend(0.0, list(w * w ORDER BY i)),
         |    (a, b) -> a + b)) AS nrm FROM w$k),
         |v$k AS (SELECT i, round(w / (SELECT nrm FROM n$k), 6) AS x FROM w$k)""".stripMargin
    }
    (base +: steps).mkString(",\n")
  }

  /** DuckDB replay of the PRODUCT-QUANTIZATION pipeline (C43): per
    * subspace, two deterministic Lloyd rounds (the kmeans_iterations
    * convention — 6dp distances and centroid means) train a 4-cell
    * codebook over the 16-dim slice; vectors encode as the per-
    * subspace argmin cell; queries score by asymmetric distance —
    * Σ over subspaces of the 6dp-rounded query-to-centroid d², folded
    * in ascending subspace order from 0.0 (the canonical-fold
    * convention, so the 4-term sum is bit-equal across engines).
    */
  private val pqOracleSql: String = {
    val m = 4; val sub = 16; val kSub = 4
    val perSub = (0 until m).map { s =>
      val lo = s * sub + 1; val hi = s * sub + sub
      s"""e$s AS (SELECT vec_id, v[$lo:$hi] AS v FROM e),
         |c0_$s AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INT) AS cluster,
         |           v AS cv FROM e$s WHERE vec_id < $kSub),
         |a1_$s AS (${assignCte(s"c0_$s", s"e$s")}),
         |c1_$s AS (${mStepCte(s"a1_$s")}),
         |a2_$s AS (${assignCte(s"c1_$s", s"e$s")}),
         |c2_$s AS (${mStepCte(s"a2_$s")})""".stripMargin
    }.mkString(",\n")
    val centUnion = (0 until m)
      .map(s => s"SELECT $s AS sub, cluster AS cid, cv FROM c2_$s")
      .mkString("\nUNION ALL ")
    val svUnion = (0 until m)
      .map(s => s"SELECT vec_id, $s AS sub, v[${s * sub + 1}:${s * sub + sub}] AS sv FROM e")
      .mkString("\nUNION ALL ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |$perSub,
       |cent AS ($centUnion),
       |sv AS ($svUnion),
       |codes AS (
       |  SELECT vec_id, sub, cid FROM (
       |    SELECT s.vec_id, s.sub, c.cid,
       |      row_number() OVER (PARTITION BY s.vec_id, s.sub ORDER BY
       |        round(list_dot_product(s.sv, s.sv) - 2 * list_dot_product(s.sv, c.cv)
       |          + list_dot_product(c.cv, c.cv), 6), c.cid) AS rn
       |    FROM sv s JOIN cent c USING (sub)) WHERE rn = 1),
       |q AS (SELECT vec_id AS query_id, sub, sv AS qv FROM sv WHERE vec_id < 5),
       |dt AS (
       |  SELECT q.query_id, q.sub, c.cid,
       |    round(list_dot_product(q.qv, q.qv) - 2 * list_dot_product(q.qv, c.cv)
       |      + list_dot_product(c.cv, c.cv), 6) AS term
       |  FROM q JOIN cent c USING (sub)),
       |sc AS (
       |  SELECT d.query_id, k.vec_id,
       |    list_reduce(list_prepend(0.0, list(d.term ORDER BY d.sub)),
       |      (a, b) -> a + b) AS adc_d2
       |  FROM codes k JOIN dt d ON k.sub = d.sub AND k.cid = d.cid
       |  WHERE k.vec_id <> d.query_id
       |  GROUP BY d.query_id, k.vec_id)
       |SELECT query_id, vec_id AS id, adc_d2, rnk FROM (
       |  SELECT query_id, vec_id, adc_d2,
       |    row_number() OVER (PARTITION BY query_id ORDER BY adc_d2, vec_id) AS rnk
       |  FROM sc) WHERE rnk <= 10""".stripMargin
  }

  /** DuckDB replay of the IVF-PQ composition (C89): coarse cell
    * assign exactly as `ivfOracleSql` (unrounded left-fold dots, cid
    * tie-break), residuals v − cv by exact IEEE subtraction, then the
    * full `pqOracleSql` machinery — per-subspace 2-round Lloyd
    * codebooks, 6dp encode, per-(query, probed-cell) residual ADC
    * tables folded ascending from 0.0 — run over RESIDUALS with the
    * candidate set restricted to the query's 3 probed cells.
    */
  private val ivfpqOracleSql: String = ivfpqOracleSqlWith(None)

  /** IVF-PQ oracle builder, optionally ATTRIBUTE-FILTERED: with a
    * predicate, the `label` column rides assignment → residuals →
    * codes and the ADC scan keeps only matching candidates
    * (filter-DURING-search — the C142 semantics on the C89 index).
    */
  private def ivfpqOracleSqlWith(labelPred: Option[String]): String = {
    val m = 4; val sub = 16; val kSub = 4
    val lab = if (labelPred.isDefined) ", label" else ""
    val labE = if (labelPred.isDefined) ", e.label" else ""
    val labK = if (labelPred.isDefined) ", s.label" else ""
    val scFilter = labelPred.map(p => s" AND k.$p").getOrElse("")
    val d2c = "list_dot_product(%s, %s) - 2 * list_dot_product(%s, c.cv) + list_dot_product(c.cv, c.cv)"
    val perSub = (0 until m).map { s =>
      val lo = s * sub + 1; val hi = s * sub + sub
      s"""rs$s AS (SELECT vec_id, rv[$lo:$hi] AS v FROM res),
         |c0_$s AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INT) AS cluster,
         |           v AS cv FROM rs$s WHERE vec_id < $kSub),
         |a1_$s AS (${assignCte(s"c0_$s", s"rs$s")}),
         |c1_$s AS (${mStepCte(s"a1_$s")}),
         |a2_$s AS (${assignCte(s"c1_$s", s"rs$s")}),
         |c2_$s AS (${mStepCte(s"a2_$s")})""".stripMargin
    }.mkString(",\n")
    val centUnion = (0 until m)
      .map(s => s"SELECT $s AS sub, cluster AS cid, cv FROM c2_$s")
      .mkString("\nUNION ALL ")
    val rsvUnion = (0 until m)
      .map(s => s"SELECT vec_id, cell$lab, $s AS sub, rv[${s * sub + 1}:${s * sub + sub}] AS rsv FROM res")
      .mkString("\nUNION ALL ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v$lab FROM embeddings),
       |cent AS (SELECT vec_id AS cell, v AS ccv FROM e WHERE vec_id < 8),
       |asg AS (
       |  SELECT vec_id, v$lab, cell, ccv FROM (
       |    SELECT e.vec_id, e.v$labE, c.cell, c.ccv,
       |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |        list_dot_product(e.v, e.v) - 2 * list_dot_product(e.v, c.ccv)
       |          + list_dot_product(c.ccv, c.ccv), c.cell) AS rn
       |    FROM e, cent c) WHERE rn = 1),
       |res AS (
       |  SELECT vec_id, cell$lab,
       |    list_transform(range(1, ${m * sub + 1}),
       |      i -> v[CAST(i AS INT)] - ccv[CAST(i AS INT)]) AS rv
       |  FROM asg),
       |$perSub,
       |pqc AS ($centUnion),
       |rsv AS ($rsvUnion),
       |codes AS (
       |  SELECT vec_id, cell, sub$lab, cid FROM (
       |    SELECT s.vec_id, s.cell, s.sub$labK, c.cid,
       |      row_number() OVER (PARTITION BY s.vec_id, s.sub ORDER BY
       |        round(list_dot_product(s.rsv, s.rsv) - 2 * list_dot_product(s.rsv, c.cv)
       |          + list_dot_product(c.cv, c.cv), 6), c.cid) AS rn
       |    FROM rsv s JOIN pqc c USING (sub)) WHERE rn = 1),
       |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
       |probes AS (
       |  SELECT query_id, qv, cell, ccv FROM (
       |    SELECT q.query_id, q.qv, c.cell, c.ccv,
       |      row_number() OVER (PARTITION BY q.query_id ORDER BY
       |        list_dot_product(q.qv, q.qv) - 2 * list_dot_product(q.qv, c.ccv)
       |          + list_dot_product(c.ccv, c.ccv), c.cell) AS rn
       |    FROM q, cent c) WHERE rn <= 3),
       |qres AS (
       |  SELECT query_id, cell, sub,
       |    list_transform(range(sub * $sub + 1, sub * $sub + ${sub + 1}),
       |      i -> qv[CAST(i AS INT)] - ccv[CAST(i AS INT)]) AS qrv
       |  FROM probes, (SELECT unnest(range($m)) AS sub)),
       |dt AS (
       |  SELECT q.query_id, q.cell, q.sub, c.cid,
       |    round(list_dot_product(q.qrv, q.qrv) - 2 * list_dot_product(q.qrv, c.cv)
       |      + list_dot_product(c.cv, c.cv), 6) AS term
       |  FROM qres q JOIN pqc c USING (sub)),
       |sc AS (
       |  SELECT d.query_id, k.vec_id,
       |    list_reduce(list_prepend(0.0, list(d.term ORDER BY d.sub)),
       |      (a, b) -> a + b) AS adc_d2
       |  FROM codes k JOIN dt d ON k.cell = d.cell AND k.sub = d.sub AND k.cid = d.cid
       |  WHERE k.vec_id <> d.query_id$scFilter
       |  GROUP BY d.query_id, k.vec_id)
       |SELECT query_id, vec_id AS id, adc_d2, rnk FROM (
       |  SELECT query_id, vec_id, adc_d2,
       |    row_number() OVER (PARTITION BY query_id ORDER BY adc_d2, vec_id) AS rnk
       |  FROM sc) WHERE rnk <= 10""".stripMargin
  }

  /** Shared IVF-PQ chain (C89 ann_ivfpq_topk / C152
    * ann_ivfpq_filtered): coarse IVF assign → residual PQ codebook
    * (ONE shared codebook across cells, trained on the full corpus —
    * the FAISS layout; filtering is a search-time concern) → codes →
    * per-query ADC over 3 probed cells → top-10. With `keep`, the
    * `label` attribute rides assignment → residuals → codes and the
    * predicate prunes the CODES relation before the ADC join
    * (filter-during-scan — the C142 semantics on the C89 index).
    */
  private def ivfPqChain(s: org.apache.spark.sql.SparkSession, dir: String,
      keep: Option[org.apache.spark.sql.Column])
      : org.apache.spark.sql.DataFrame = {
    val m = 4; val sub = 16; val kSub = 4
    val withLab = keep.isDefined
    def labCols = if (withLab) Seq(col("label")) else Nil
    val e = table(s, dir, "embeddings")
      .select(Seq(col("vec_id"),
        col("embedding").cast("array<double>").as("v")) ++ labCols: _*)
    val cents = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cell"), col("v").as("ccv"))
    val d2cell = VectorOps.dot(col("v"), col("v")) -
      lit(2) * VectorOps.dot(col("v"), col("ccv")) +
      VectorOps.dot(col("ccv"), col("ccv"))
    val asgAggs = Seq(first(col("v")).as("v")) ++
      (if (withLab) Seq(first(col("label")).as("label")) else Nil)
    val asg = e.crossJoin(broadcast(cents))
      .withColumn("_d2", d2cell)
      .groupBy(col("vec_id"))
      .agg(min_by(struct(col("cell"), col("ccv")),
        struct(col("_d2"), col("cell"))).as("c"), asgAggs: _*)
      .select(Seq(col("vec_id"), col("v"), col("c.cell").as("cell"),
        zip_with(col("v"), col("c.ccv"), (a, b) => a - b).as("rv"))
        ++ labCols: _*)
    val rsv = asg.select(Seq(col("vec_id"), col("cell")) ++ labCols ++ Seq(
        explode(array((0 until m).map(si =>
          struct(lit(si).as("sub"),
            slice(col("rv"), si * sub + 1, sub).as("rsv"))): _*)).as("p")): _*)
      .select(Seq(col("vec_id"), col("cell")) ++ labCols ++ Seq(
        col("p.sub").as("sub"), col("p.rsv").as("rsv")): _*)
      .localCheckpoint() // residuals feed train + encode, one compute
    val codebook = graft.operators.KMeans.fitPerGroup(
        rsv, "sub", "vec_id", "rsv", k = kSub, iterations = 2,
        roundTo = Some(6))
      .select(col("grp").as("sub"), col("cluster").as("cid"), col("cv"))
      .localCheckpoint()
    val d2pq = round(
      VectorOps.dot(col("rsv"), col("rsv"))
        - lit(2) * VectorOps.dot(col("rsv"), col("cv"))
        + VectorOps.dot(col("cv"), col("cv")), 6)
    val codeAggs = Seq(min_by(col("cid"), struct(col("d2"), col("cid"))).as("cid")) ++
      (if (withLab) Seq(first(col("label")).as("label")) else Nil)
    val codesAll = rsv.join(broadcast(codebook), Seq("sub"))
      .select(Seq(col("vec_id"), col("cell"), col("sub"),
        col("cid"), d2pq.as("d2")) ++ labCols: _*)
      .groupBy(col("vec_id"), col("cell"), col("sub"))
      .agg(codeAggs.head, codeAggs.tail: _*)
    // filter-during-scan: prune the codes relation BEFORE ADC
    val codes = keep.map(codesAll.filter).getOrElse(codesAll)
    // probes: top-3 cells per query by raw d² (cell tie-break)
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val qd2 = VectorOps.dot(col("qv"), col("qv")) -
      lit(2) * VectorOps.dot(col("qv"), col("ccv")) +
      VectorOps.dot(col("ccv"), col("ccv"))
    val probes = q.crossJoin(broadcast(cents))
      .withColumn("_r", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_id")).orderBy(qd2, col("cell"))))
      .filter(col("_r") <= 3)
      .select(col("query_id"), col("cell"),
        zip_with(col("qv"), col("ccv"), (a, b) => a - b).as("qrv"))
    val qrsv = probes.select(col("query_id"), col("cell"),
        explode(array((0 until m).map(si =>
          struct(lit(si).as("sub"),
            slice(col("qrv"), si * sub + 1, sub).as("rsv"))): _*)).as("p"))
      .select(col("query_id"), col("cell"), col("p.sub").as("sub"),
        col("p.rsv").as("rsv"))
    val dt = qrsv.join(broadcast(codebook), Seq("sub"))
      .select(col("query_id"), col("cell"), col("sub"), col("cid"),
        d2pq.as("term"))
      .localCheckpoint() // tiny: queries × 3 cells × 16 entries
    val scored = codes.join(broadcast(dt), Seq("cell", "sub", "cid"))
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(aggregate(
        sort_array(collect_list(struct(col("sub"), col("term")))),
        lit(0.0), (a, x) => a + x.getField("term")).as("adc_d2"))
      .select(col("query_id"), col("vec_id").as("id"), col("adc_d2"))
    graft.plans.TopK.perKey(scored, Seq("query_id"),
      Seq(("adc_d2", true), ("id", true)), 10)
  }

  /** DuckDB replay of `GraphAnn.graphTopK` (C158): the 6 hyperplanes
    * are the SAME deterministic Random(42) Gaussian sequence
    * `VectorOps.withLshBucket` draws (double literals round-trip —
    * the ann_lsh_topk precedent), so the sign buckets, the
    * bucketed top-8 out-edges, the union-symmetrized adjacency, and
    * all three expand-score-prune beam hops replay bit-exactly:
    * 6dp cosines with (cosine DESC, id) row_number everywhere the
    * operator uses its (cosine desc, id) bounded heap.
    */
  private val graphAnnOracleSql: String = {
    val rng = new scala.util.Random(42L)
    val planeVecs: Seq[Seq[Double]] =
      Seq.fill(6)(Seq.fill(64)(rng.nextGaussian()))
    def bucketExpr(vcol: String): String = planeVecs.zipWithIndex.map {
      case (p, j) =>
        val lst = p.map(java.lang.Double.toString).mkString("[", ", ", "]")
        s"(CASE WHEN list_dot_product(CAST($lst AS DOUBLE[]), $vcol) > 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString("(", " + ", ")")
    def cos(qv: String, v: String): String =
      s"round(list_dot_product($qv, $v) / (sqrt(list_dot_product($qv, $qv)) * sqrt(list_dot_product($v, $v))), 6)"
    def hop(bPrev: String, t: Int): String =
      s"""f$t AS (
         |  SELECT DISTINCT query_id, id FROM (
         |    SELECT query_id, id FROM $bPrev
         |    UNION ALL
         |    SELECT b.query_id, a.w AS id FROM $bPrev b JOIN adj a ON a.u = b.id)),
         |s$t AS (
         |  SELECT f.query_id, f.id, ${cos("q.qv", "e.v")} AS cosine
         |  FROM f$t f JOIN e ON e.vec_id = f.id JOIN q ON q.query_id = f.query_id
         |  WHERE f.id <> f.query_id),
         |b$t AS (
         |  SELECT query_id, id FROM (
         |    SELECT query_id, id,
         |      row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, id) AS rnk
         |    FROM s$t) WHERE rnk <= 24)""".stripMargin
    val ranks = graft.operators.GraphAnn.defaultRanks.mkString(", ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |c AS (SELECT vec_id, v, CAST(${bucketExpr("v")} AS BIGINT) AS bucket FROM e),
       |cand AS (
       |  SELECT a.vec_id AS u, b.vec_id AS w, ${cos("a.v", "b.v")} AS cosine
       |  FROM c a, (SELECT unnest([0, 1, 2, 4, 8, 16, 32]) AS p) pr, c b
       |  WHERE xor(a.bucket, CAST(pr.p AS BIGINT)) = b.bucket
       |    AND a.vec_id <> b.vec_id),
       |oute AS (
       |  SELECT u, w FROM (
       |    SELECT u, w, row_number() OVER (PARTITION BY u ORDER BY cosine DESC, w) AS rnk
       |    FROM cand) WHERE rnk IN ($ranks)),
       |adj AS (SELECT u, w FROM oute UNION SELECT w AS u, u AS w FROM oute),
       |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
       |b0 AS (SELECT q.query_id, e.vec_id AS id FROM q, e WHERE e.vec_id < 8),
       |${hop("b0", 1)},
       |${hop("b1", 2)},
       |${hop("b2", 3)},
       |${hop("b3", 4)}
       |SELECT query_id, id, cosine, rnk FROM (
       |  SELECT query_id, id, cosine,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, id) AS rnk
       |  FROM s4) WHERE rnk <= 10""".stripMargin
  }

  val all: Seq[Q] = Seq(

    // C158: GRAPH-ANN BEAM SEARCH — the HNSW-family navigable-graph
    // method (Malkov & Yashunin TPAMI 2020) re-expressed
    // relationally (operators/GraphAnn.scala): bounded-degree
    // neighbor RELATION (Hamming-1 multi-probe LSH candidates —
    // probes bridge clusters fragmented across hyperplanes — with
    // FIBONACCI-STRIDED edge ranks 1..144, the deterministic
    // stand-in for HNSW's multi-scale links: a plain top-k graph
    // collapses into mutual-nearest cliques and strands the beam,
    // measured 0.32 → 1.00 clustered recall; union-symmetrized) +
    // 4 hops of expand-score-prune beam search (beam 24, entry = the
    // 8 lowest ids, results top-10) — each hop ONE keyed join against
    // the adjacency + a bounded-heap top-B, never a mutable graph or
    // per-query driver loop. The IVF-family's companion: search cost
    // ≤ |Q|·beam·degree rows/hop, independent of corpus size; the
    // build is the documented NN-descent-class bucketed-pairs floor
    // (~n²·7/2^planes, sharded per bucket). FULLY oracle-exact:
    // buckets, graph, and every hop replay closed-form (hyperplane
    // literals + 6dp cosines + (cosine DESC, id) ranks — the
    // ann_lsh_topk precedent); GraphAnnSpec additionally gates
    // recall ≥ 0.9 on the clustered mixture corpus vs brute force at
    // these exact parameters.
    Q("ann_graph_topk", graphAnnOracleSql) { (s, dir) =>
      val vecs = table(s, dir, "embeddings")
      graft.operators.GraphAnn.graphTopK(
        vecs, vecs.filter(col("vec_id") < 5), "vec_id", "embedding",
        k = 10, beam = 24, hops = 4, planes = 6, entries = 8)
    },

    // C92: BINARY-QUANTIZATION ANN with exact rerank (sign-bit codes
    // à la Charikar 2002, packed per-DIMENSION — the flat "BQ +
    // rescore" path modern vector stores ship alongside IVF/PQ): the
    // coarse stage scans an 8 B/vector code relation with two
    // XOR+popcount per candidate (at 100 TB an 800×-smaller persisted
    // index read at memory bandwidth — the complement of cell pruning
    // when recall must not depend on a quantizer's cell boundaries),
    // keeps the top-50 by (Hamming, id) in TopKPerKey heaps, and
    // reranks only the survivors against the raw vectors. Exact
    // integer codes and Hamming distances + the 6dp cosine rerank →
    // the whole chain replays closed-form (sign rule v[j] >= 0 is
    // IEEE-identical both engines, including -0.0).
    Q("ann_binary_rerank", {
      def halfCte(off: Int): String =
        s"""CAST(list_sum(list_transform(range(32), j ->
           |      CASE WHEN v[CAST(j + ${off + 1} AS INT)] >= 0
           |           THEN (CAST(1 AS BIGINT) << CAST(j AS INT))
           |           ELSE CAST(0 AS BIGINT) END)) AS BIGINT)""".stripMargin
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |c AS (
         |  SELECT vec_id, ${halfCte(0)} AS lo, ${halfCte(32)} AS hi
         |  FROM e),
         |q AS (SELECT vec_id AS query_id, lo AS qlo, hi AS qhi FROM c
         |      WHERE vec_id < 5),
         |ham AS (
         |  SELECT query_id, c.vec_id AS id,
         |    CAST(bit_count(xor(qlo, lo)) + bit_count(xor(qhi, hi)) AS INT) AS hd
         |  FROM c, q WHERE c.vec_id <> query_id),
         |cand AS (
         |  SELECT query_id, id, hd,
         |    row_number() OVER (PARTITION BY query_id ORDER BY hd, id) AS crn
         |  FROM ham),
         |rer AS (
         |  SELECT query_id, id, hd,
         |    round(list_dot_product(qe.v, ce.v)
         |      / (sqrt(list_dot_product(qe.v, qe.v))
         |         * sqrt(list_dot_product(ce.v, ce.v))), 6) AS cosine
         |  FROM cand
         |  JOIN e ce ON cand.id = ce.vec_id
         |  JOIN e qe ON cand.query_id = qe.vec_id
         |  WHERE crn <= 50),
         |ranked AS (
         |  SELECT query_id, id, hd, cosine,
         |    row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, id)
         |      AS rnk
         |  FROM rer)
         |SELECT query_id, id, hd, cosine, rnk FROM ranked WHERE rnk <= 10""".stripMargin
    }) { (s, dir) =>
      val vecs = table(s, dir, "embeddings")
      VectorOps.binaryRerankTopK(
        vecs, vecs.filter(col("vec_id") < 5), "vec_id", "embedding",
        k = 10, candidates = 50)
    },

    // C94: MMR DIVERSE RE-RANKING (maximal marginal relevance,
    // Carbonell & Goldstein 1998 — the standard answer to "my top-k
    // retrieval results are 5 near-copies of the same chunk" in RAG /
    // retrieval pipelines): greedily select 5 of the top-20
    // candidates, each step maximizing λ·relevance − (1−λ)·max
    // similarity to the already-selected set (λ = 0.5, ties by id).
    // MMR is inherently SEQUENTIAL in k, so the scale posture bounds
    // the sequential part instead of distributing it: candidates are
    // a per-query TOP-20 (the ANN stage does the corpus work), and
    // each greedy round is a join over the |Q|·20-row candidate
    // relation — driver-looped 5×, data never driver-resident.
    // Determinism: rel and pairwise sims are the 6dp cosine
    // convention; the score combines them in identical IEEE order
    // both engines; the oracle replays the greedy loop with a
    // RECURSIVE CTE carrying (sel_ids, sel_vecs) state and a LATERAL
    // per-step argmax.
    Q("ann_mmr_rerank",
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
        |scored AS (
        |  SELECT query_id, e.vec_id AS id, e.v,
        |    round(list_dot_product(qv, v)
        |      / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))), 6) AS rel
        |  FROM e, q WHERE e.vec_id <> query_id),
        |cand AS (
        |  SELECT * FROM (
        |    SELECT query_id, id, v, rel,
        |      row_number() OVER (PARTITION BY query_id ORDER BY rel DESC, id) AS rn
        |    FROM scored) WHERE rn <= 20),
        |sel AS (
        |  WITH RECURSIVE s(query_id, k_step, sel_ids, sel_vecs) AS (
        |    SELECT query_id, 0, CAST([] AS BIGINT[]), CAST([] AS DOUBLE[][]) FROM q
        |    UNION ALL
        |    SELECT s.query_id, k_step + 1,
        |      list_append(sel_ids, pick.id), list_append(sel_vecs, pick.v)
        |    FROM s, LATERAL (
        |      SELECT id, v FROM cand c
        |      WHERE c.query_id = s.query_id AND NOT list_contains(s.sel_ids, c.id)
        |      ORDER BY 0.5 * rel - 0.5 * coalesce(list_max(list_transform(s.sel_vecs,
        |          sv -> round(list_dot_product(c.v, sv)
        |            / (sqrt(list_dot_product(c.v, c.v))
        |               * sqrt(list_dot_product(sv, sv))), 6))), 0.0) DESC,
        |        id
        |      LIMIT 1) pick
        |    WHERE k_step < 5)
        |  SELECT query_id, sel_ids FROM s WHERE k_step = 5)
        |SELECT query_id, CAST(u.i AS INT) AS rank, sel_ids[CAST(u.i AS INT)] AS id
        |FROM sel, unnest(range(1, len(sel_ids) + 1)) AS u(i)""".stripMargin) { (s, dir) =>
      val vecs = table(s, dir, "embeddings")
      val e = vecs.select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
        .withColumn("nrm", sqrt(VectorOps.dot(col("v"), col("v"))))
      // candidate stage: the existing brute-force top-k (its (cosine
      // desc, id) selection IS the oracle's top-20 rule); vectors and
      // norms joined back once, checkpointed for the 5 greedy rounds
      val cand = VectorOps.bruteForceTopK(
          vecs, vecs.filter(col("vec_id") < 5), "vec_id", "embedding", k = 20)
        .select(col("query_id"), col("id"), col("cosine").as("rel"))
        .join(e.select(col("vec_id").as("id"), col("v"), col("nrm")), Seq("id"))
        .localCheckpoint()
      var selected = cand.filter(lit(false))
        .select(col("query_id"), lit(0).as("rank"), col("id"),
          col("v"), col("nrm"))
      for (step <- 1 to 5) {
        val remaining = cand.join(
          selected.select(col("query_id"), col("id")),
          Seq("query_id", "id"), "left_anti")
        val sims = remaining.join(
            selected.select(col("query_id"), col("id").as("sid"),
              col("v").as("sv"), col("nrm").as("snrm")),
            Seq("query_id"), "left")
          .select(col("query_id"), col("id"), col("rel"), col("v"), col("nrm"),
            when(col("sid").isNull, lit(null).cast("double"))
              .otherwise(round(VectorOps.dot(col("v"), col("sv"))
                / (col("nrm") * col("snrm")), 6)).as("sim"))
          .groupBy(col("query_id"), col("id"))
          .agg(first(col("rel")).as("rel"), first(col("v")).as("v"),
            first(col("nrm")).as("nrm"), max(col("sim")).as("maxsim"))
          .select(col("query_id"), col("id"), col("v"), col("nrm"),
            (lit(0.5) * col("rel")
              - lit(0.5) * coalesce(col("maxsim"), lit(0.0))).as("score"))
        val pick = graft.plans.TopK.perKey(sims, Seq("query_id"),
            Seq(("score", false), ("id", true)), 1)
          .select(col("query_id"), lit(step).as("rank"), col("id"),
            col("v"), col("nrm"))
        // checkpoint per round: each round reads `selected` twice
        // (anti join + sim join) — the Hits lazy-chain lesson
        selected = selected.unionByName(pick).localCheckpoint()
      }
      selected.select(col("query_id"), col("rank"), col("id"))
    },

    // C89: IVF-PQ — THE production vector index (Jégou et al. 2011
    // §IV; the FAISS IVFPQ default): the coarse IVF quantizer
    // (ann_ivf_topk's 8 fixed cells) prunes the search to 3 probed
    // cells, and product quantization over the RESIDUALS v − cell
    // centroid (finer than C43's raw-vector PQ: residual energy is
    // what's left AFTER the coarse quantizer explains the cell) packs
    // each vector into m = 4 codes — at 100 TB the corpus-resident
    // state is (cell, 4 codes) per vector and search cost is
    // |probed cells| · ADC lookups, never a full scan and never the
    // raw vectors again. ONE shared PQ codebook across cells (the
    // FAISS layout), trained per-subspace in one fitPerGroup pass
    // over residuals. Search: per (query, probed cell) the query
    // residual differs, so the ADC table keys on (cell, sub, cid) —
    // a tiny broadcast (queries × 3 cells × 16 entries) against the
    // thin codes relation. Every stage replays closed-form: raw
    // left-fold dots for cell assign/probes (bit-equal), exact IEEE
    // residual subtraction, 6dp Lloyd rounds + encode, ADC folded
    // ascending from 0.0.
    Q("ann_ivfpq_topk", ivfpqOracleSql) { (s, dir) =>
      ivfPqChain(s, dir, keep = None)
    },

    // C152: ATTRIBUTE-FILTERED IVF-PQ search (round 12; r11 verdict
    // #8 — C142 filters the FLAT IVF, but the production index is
    // IVF-PQ): the C89 chain with the predicate (label < 4, ~25% of
    // the corpus) applied to the CODES relation before the ADC join —
    // filter-during-ADC-scan, so non-matching candidates never cost
    // an ADC lookup (at 100 TB the predicate pushes into the codes
    // table scan; post-filtering a k-list would instead return fewer
    // than k — the recall hole filtered search exists to close). The
    // PQ codebook trains on the FULL corpus residuals (filtering is a
    // search-time concern; the index is shared across predicates).
    // Exactness: the C89 closed-form oracle with `label` riding
    // assignment → residuals → codes and the same filter in the ADC
    // CTE. Scale shape: strictly cheaper than ann_ivfpq_topk — the
    // same probed-cell joins over a pruned codes scan.
    Q("ann_ivfpq_filtered", ivfpqOracleSqlWith(Some("label < 4"))) { (s, dir) =>
      ivfPqChain(s, dir, keep = Some(col("label") < 4))
    },

    // C43: product quantization + asymmetric-distance search — the
    // memory-compression half of production vector search (Jégou et
    // al. 2011; FAISS IVF-PQ): each 64-dim vector is encoded as m = 4
    // codes of 2 bits here (4-cell codebooks over 16-dim slices), so
    // the corpus-resident representation shrinks from 64 doubles to 4
    // small ints — at 100 TB this is what makes the index RAM-
    // resident. Search is ADC: a per-query 16-entry lookup table
    // (query-to-centroid d² per subspace) broadcast against the CODES
    // table (the corpus vectors are never touched again), summed per
    // candidate in canonical subspace order, top-10 via TopKPerKey.
    // In production PQ composes with IVF cells (ann_ivf_trained) and
    // uses k = 256 per subspace (8-bit codes) — the engine work is
    // identical; k = 4 keeps the Lloyd-round oracle replay tractable.
    // The full-corpus ADC scan here gates the train→encode→search
    // math end-to-end. Everything replays closed-form: per-subspace
    // codebooks are two 6dp Lloyd rounds (KMeans.fit deterministic
    // mode), encode/dt are 6dp-rounded d² with (d2, cid) tie-breaks,
    // and the 4-term ADC sum folds ascending from 0.0 → bit-equal.
    Q("ann_pq_topk", pqOracleSql) { (s, dir) =>
      val m = 4; val sub = 16; val kSub = 4
      val e = table(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val subvecs = e.select(col("vec_id"), explode(array((0 until m).map(si =>
          struct(lit(si).as("sub"), slice(col("v"), si * sub + 1, sub).as("sv"))): _*)).as("p"))
        .select(col("vec_id"), col("p.sub").as("sub"), col("p.sv").as("sv"))
      // all 4 subspace codebooks train in ONE pass per Lloyd round
      // (fitPerGroup) — per-group semantics identical to the
      // kmeans_iterations fit, so the oracle's 4 independent CTE
      // chains replay it unchanged
      val codebook = graft.operators.KMeans.fitPerGroup(
          subvecs, "sub", "vec_id", "sv", k = kSub, iterations = 2,
          roundTo = Some(6))
        .select(col("grp").as("sub"), col("cluster").as("cid"), col("cv"))
        .localCheckpoint()
      val d2 = round(
        VectorOps.dot(col("sv"), col("sv"))
          - lit(2) * VectorOps.dot(col("sv"), col("cv"))
          + VectorOps.dot(col("cv"), col("cv")), 6)
      val codes = subvecs.join(broadcast(codebook), Seq("sub"))
        .select(col("vec_id"), col("sub"), col("cid"), d2.as("d2"))
        .groupBy(col("vec_id"), col("sub"))
        .agg(min_by(col("cid"), struct(col("d2"), col("cid"))).as("cid"))
      val dt = subvecs.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("sub"), col("sv"))
        .join(broadcast(codebook), Seq("sub"))
        .select(col("query_id"), col("sub"), col("cid"), d2.as("term"))
        .localCheckpoint()
      val scored = codes.join(broadcast(dt), Seq("sub", "cid"))
        .filter(col("vec_id") =!= col("query_id"))
        .groupBy(col("query_id"), col("vec_id"))
        .agg(aggregate(
          sort_array(collect_list(struct(col("sub"), col("term")))),
          lit(0.0), (a, x) => a + x.getField("term")).as("adc_d2"))
        .select(col("query_id"), col("vec_id").as("id"), col("adc_d2"))
      graft.plans.TopK.perKey(scored, Seq("query_id"),
        Seq(("adc_d2", true), ("id", true)), 10)
    },

    // C90: hard-negative mining for contrastive embedding training
    // (DPR, Karpukhin et al. 2020; ANCE): per query, the top-5
    // most-similar vectors from OTHER coarse cells — the cell is the
    // weak "same topic" proxy, so cross-cell high-cosine items are
    // exactly the hard negatives a bi-encoder trains against.
    // Exclusion-constrained ANN, not plain top-k: the query's own
    // cell (where the positives live) is banned, and the probe rank
    // runs over the REMAINING cells. Scale shape: identical to the
    // IVF search path (8-row centroid broadcast, 3 probed cells per
    // query, per-cell rerank, TopKPerKey bounded heaps) — at 100 TB
    // negatives mine at index-probe cost, never a corpus scan, and
    // mining is embarrassingly parallel over queries. Replayed
    // closed-form: raw left-fold dots for assign/probes (bit-equal),
    // 6dp cosines with (cosine DESC, id) selection.
    Q("ann_hard_negatives",
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |cent AS (SELECT vec_id AS cell, v AS ccv FROM e WHERE vec_id < 8),
         |asg AS (
         |  SELECT vec_id, v, cell FROM (
         |    SELECT e.vec_id, e.v, c.cell,
         |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |        list_dot_product(e.v, e.v) - 2 * list_dot_product(e.v, c.ccv)
         |          + list_dot_product(c.ccv, c.ccv), c.cell) AS rn
         |    FROM e, cent c) WHERE rn = 1),
         |q AS (SELECT vec_id AS query_id, v AS qv, cell AS qcell
         |      FROM asg WHERE vec_id < 5),
         |probes AS (
         |  SELECT query_id, qv, cell FROM (
         |    SELECT q.query_id, q.qv, c.cell,
         |      row_number() OVER (PARTITION BY q.query_id ORDER BY
         |        list_dot_product(q.qv, q.qv) - 2 * list_dot_product(q.qv, c.ccv)
         |          + list_dot_product(c.ccv, c.ccv), c.cell) AS rn
         |    FROM q JOIN cent c ON c.cell <> q.qcell) WHERE rn <= 3),
         |scored AS (
         |  SELECT p.query_id, a.vec_id AS id,
         |    round(list_dot_product(p.qv, a.v)
         |      / (sqrt(list_dot_product(p.qv, p.qv)) * sqrt(list_dot_product(a.v, a.v))), 6) AS cosine
         |  FROM asg a JOIN probes p USING (cell))
         |SELECT query_id, id, cosine, rnk FROM (
         |  SELECT query_id, id, cosine,
         |    row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, id) AS rnk
         |  FROM scored)
         |WHERE rnk <= 5""".stripMargin) { (s, dir) =>
      val e = table(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val cents = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cell"), col("v").as("ccv"))
      val d2cell = VectorOps.dot(col("v"), col("v")) -
        lit(2) * VectorOps.dot(col("v"), col("ccv")) +
        VectorOps.dot(col("ccv"), col("ccv"))
      val asg = e.crossJoin(broadcast(cents))
        .withColumn("_d2", d2cell)
        .groupBy(col("vec_id"))
        .agg(min_by(col("cell"), struct(col("_d2"), col("cell"))).as("cell"),
          first(col("v")).as("v"))
      val q = asg.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("v").as("qv"),
          col("cell").as("qcell"))
      val qd2 = VectorOps.dot(col("qv"), col("qv")) -
        lit(2) * VectorOps.dot(col("qv"), col("ccv")) +
        VectorOps.dot(col("ccv"), col("ccv"))
      val probes = q.crossJoin(broadcast(cents))
        .filter(col("cell") =!= col("qcell"))
        .withColumn("_r", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("query_id")).orderBy(qd2, col("cell"))))
        .filter(col("_r") <= 3)
        .select(col("query_id"), col("qv"), col("cell"))
      val cosine = round(
        VectorOps.dot(col("qv"), col("v")) /
          (sqrt(VectorOps.dot(col("qv"), col("qv")))
            * sqrt(VectorOps.dot(col("v"), col("v")))), 6)
      val scored = asg.join(broadcast(probes), Seq("cell"))
        .select(col("query_id"), col("vec_id").as("id"), cosine.as("cosine"))
      graft.plans.TopK.perKey(scored, Seq("query_id"),
        Seq(("cosine", false), ("id", true)), 5)
    },

    // C95: CONTRASTIVE TRIPLET CONSTRUCTION — the training-pair table
    // a bi-encoder actually consumes (DPR, Karpukhin et al. 2020 §3:
    // each anchor needs ONE positive and ONE hard negative; C90 mined
    // negatives, this assembles the full (anchor, positive, negative)
    // relation): positive = the anchor's nearest SAME-cell neighbor
    // (the cell is the weak "same topic" proxy), negative = the
    // nearest vector from the 3 nearest OTHER cells (C90's exclusion
    // rule at k=1). Anchors are a bounded training batch (vec_id <
    // 100) — mining is per-batch in every real contrastive setup, so
    // the per-epoch cost is |batch|·(cell size) for positives plus
    // the C90 index-probe cost for negatives, ~linear in the corpus
    // via the broadcast batch, never an all-pairs join. Same 6dp
    // cosine + (cosine DESC, id) selection as the whole ANN family →
    // closed-form replay.
    Q("contrastive_triplets",
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |cent AS (SELECT vec_id AS cell, v AS ccv FROM e WHERE vec_id < 8),
         |asg AS (
         |  SELECT vec_id, v, cell FROM (
         |    SELECT e.vec_id, e.v, c.cell,
         |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |        list_dot_product(e.v, e.v) - 2 * list_dot_product(e.v, c.ccv)
         |          + list_dot_product(c.ccv, c.ccv), c.cell) AS rn
         |    FROM e, cent c) WHERE rn = 1),
         |anch AS (SELECT vec_id AS anchor_id, v AS av, cell AS acell
         |         FROM asg WHERE vec_id < 100),
         |pos AS (
         |  SELECT anchor_id, id AS pos_id, cosine AS pos_cos FROM (
         |    SELECT a.anchor_id, m.vec_id AS id,
         |      round(list_dot_product(a.av, m.v)
         |        / (sqrt(list_dot_product(a.av, a.av))
         |           * sqrt(list_dot_product(m.v, m.v))), 6) AS cosine,
         |      row_number() OVER (PARTITION BY a.anchor_id ORDER BY
         |        round(list_dot_product(a.av, m.v)
         |          / (sqrt(list_dot_product(a.av, a.av))
         |             * sqrt(list_dot_product(m.v, m.v))), 6) DESC, m.vec_id) AS rn
         |    FROM anch a JOIN asg m ON m.cell = a.acell
         |      AND m.vec_id <> a.anchor_id) WHERE rn = 1),
         |probes AS (
         |  SELECT anchor_id, av, cell FROM (
         |    SELECT a.anchor_id, a.av, c.cell,
         |      row_number() OVER (PARTITION BY a.anchor_id ORDER BY
         |        list_dot_product(a.av, a.av) - 2 * list_dot_product(a.av, c.ccv)
         |          + list_dot_product(c.ccv, c.ccv), c.cell) AS rn
         |    FROM anch a JOIN cent c ON c.cell <> a.acell) WHERE rn <= 3),
         |neg AS (
         |  SELECT anchor_id, id AS neg_id, cosine AS neg_cos FROM (
         |    SELECT p.anchor_id, m.vec_id AS id,
         |      round(list_dot_product(p.av, m.v)
         |        / (sqrt(list_dot_product(p.av, p.av))
         |           * sqrt(list_dot_product(m.v, m.v))), 6) AS cosine,
         |      row_number() OVER (PARTITION BY p.anchor_id ORDER BY
         |        round(list_dot_product(p.av, m.v)
         |          / (sqrt(list_dot_product(p.av, p.av))
         |             * sqrt(list_dot_product(m.v, m.v))), 6) DESC, m.vec_id) AS rn
         |    FROM probes p JOIN asg m USING (cell)) WHERE rn = 1)
         |SELECT a.anchor_id, acell AS cell, pos_id, pos_cos, neg_id, neg_cos
         |FROM anch a JOIN pos USING (anchor_id) JOIN neg USING (anchor_id)""".stripMargin) { (s, dir) =>
      val e = table(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val cents = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cell"), col("v").as("ccv"))
      val d2cell = VectorOps.dot(col("v"), col("v")) -
        lit(2) * VectorOps.dot(col("v"), col("ccv")) +
        VectorOps.dot(col("ccv"), col("ccv"))
      val asg = e.crossJoin(broadcast(cents))
        .withColumn("_d2", d2cell)
        .groupBy(col("vec_id"))
        .agg(min_by(col("cell"), struct(col("_d2"), col("cell"))).as("cell"),
          first(col("v")).as("v"))
        .localCheckpoint() // assignment feeds anchors, positives, negatives
      val anch = asg.filter(col("vec_id") < 100)
        .select(col("vec_id").as("anchor_id"), col("v").as("av"),
          col("cell").as("acell"))
      val cosine = round(
        VectorOps.dot(col("av"), col("v")) /
          (sqrt(VectorOps.dot(col("av"), col("av")))
            * sqrt(VectorOps.dot(col("v"), col("v")))), 6)
      // positives: broadcast the batch against ONE corpus pass,
      // cell-equality join keys — |batch|·(cell size) scored rows
      // into bounded per-anchor heaps
      val pos = graft.plans.TopK.perKey(
          asg.join(broadcast(anch), col("cell") === col("acell")
              && col("vec_id") =!= col("anchor_id"))
            .select(col("anchor_id"), col("vec_id").as("id"),
              cosine.as("cosine")),
          Seq("anchor_id"), Seq(("cosine", false), ("id", true)), 1)
        .select(col("anchor_id"), col("id").as("pos_id"),
          col("cosine").as("pos_cos"))
      val ad2 = VectorOps.dot(col("av"), col("av")) -
        lit(2) * VectorOps.dot(col("av"), col("ccv")) +
        VectorOps.dot(col("ccv"), col("ccv"))
      val probes = anch.crossJoin(broadcast(cents))
        .filter(col("cell") =!= col("acell"))
        .withColumn("_r", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("anchor_id")).orderBy(ad2, col("cell"))))
        .filter(col("_r") <= 3)
        .select(col("anchor_id"), col("av"), col("cell"))
      val neg = graft.plans.TopK.perKey(
          asg.join(broadcast(probes), Seq("cell"))
            .select(col("anchor_id"), col("vec_id").as("id"),
              cosine.as("cosine")),
          Seq("anchor_id"), Seq(("cosine", false), ("id", true)), 1)
        .select(col("anchor_id"), col("id").as("neg_id"),
          col("cosine").as("neg_cos"))
      anch.select(col("anchor_id"), col("acell").as("cell"))
        .join(pos, Seq("anchor_id")).join(neg, Seq("anchor_id"))
        .select(col("anchor_id"), col("cell"), col("pos_id"),
          col("pos_cos"), col("neg_id"), col("neg_cos"))
    },

    // C39: distributed first principal component (power iteration) —
    // corpus-scale work is the scatter matrix (map-side combined d²
    // groups) and a map-only projection scan; the d×d eigensolve runs
    // on the driver (see operators/PowerIteration). Both the learned
    // component and every per-vector projection are oracle-replayed
    // closed-form.
    Q("embedding_pca_component",
      s"""${pc1Ctes(3)}
         |SELECT i AS dim_idx, x AS pc FROM v3""".stripMargin) { (s, dir) =>
      val (pc, _) = graft.operators.PowerIteration.pc1(
        table(s, dir, "embeddings"), "vec_id", "embedding", iterations = 3)
      import s.implicits._
      pc.toSeq.zipWithIndex.map { case (x, i) => (i, x) }
        .toDF("dim_idx", "pc")
    },

    Q("embedding_pca_project",
      s"""${pc1Ctes(3)},
         |proj AS (SELECT u.vec_id,
         |  round(list_reduce(list_prepend(0.0, list(u.vi * v3.x ORDER BY u.i)),
         |    (a, b) -> a + b), 6) AS score
         |  FROM u JOIN v3 ON u.i = v3.i GROUP BY u.vec_id)
         |SELECT vec_id, score FROM proj""".stripMargin) { (s, dir) =>
      val (_, proj) = graft.operators.PowerIteration.pc1(
        table(s, dir, "embeddings"), "vec_id", "embedding", iterations = 3)
      proj.withColumnRenamed("id", "vec_id")
    },

    // C7c: the TRAINED vector pipeline end-to-end — k-means fits the
    // codebook (two deterministic Lloyd rounds), IVF indexes and
    // searches on it: what a production vector store actually runs,
    // composed from the same operators kmeans_iterations and
    // ann_ivf_topk gate individually. Exact top-k lists under the
    // closed-form oracle replay of train → index → search.
    Q("ann_ivf_trained", trainedIvfOracleSql) { (s, dir) =>
      val e = table(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val (_, cents) = graft.operators.KMeans.fit(
        e, "vec_id", "v", k = 8, iterations = 2, roundTo = Some(6))
      VectorOps.ivfTopK(
        e, e.filter(col("vec_id") < 5),
        cents.select(col("cluster").as("cid"), col("cv")),
        "vec_id", "v", "cid", "cv", k = 10, nProbe = 3)
    },

    // C139: INCREMENTAL IVF INDEX MAINTENANCE — the daily-ingest
    // path of a production vector store (r10 verdict #6; the
    // C62-incremental-dedup pattern applied to the ANN family): the
    // base corpus (vec_id % 4 < 2) builds the cell-partitioned index
    // + a per-cell stats sidecar, then TWO batches (% 4 = 2, % 4 = 3)
    // append WITHOUT a rebuild — assigned against the frozen
    // centroids, written mode("append") so only touched cell
    // directories gain files (file reuse pinned in
    // IvfIncrementalSpec). Output per cell: member counts, and the
    // DRIFT ratio — mean e6-floored member-to-centroid d² of
    // appended members over base members, all-integer cross products
    // (HUGEINT/decimal(38,0)) into ONE division, 6dp floor — with
    // the retrain trigger at ratio ≥ 1.25 (a cell whose new members
    // fit systematically worse is a cell the codebook no longer
    // covers). `search_match` is the incremental recall gate,
    // computed for real on the Spark side: searching the
    // incrementally-grown index must return EXACTLY the from-scratch
    // ivfTopK result over the full corpus (same centroids ⇒ same
    // assignment ⇒ identical top-k — the strongest possible form of
    // "search quality survives N appends"); the oracle pins 1.
    // The oracle recomputes every stat from scratch over the full
    // table — equality proves the incremental sidecar maintenance is
    // lossless. Scale shape: each append is one batch-linear assign
    // + a cell-pruned write; the sidecar merge is model-sized (one
    // row per cell); nothing ever re-reads the existing index.
    Q("ann_ivf_incremental", {
      val d2 = "list_dot_product(%s, %s) - 2 * list_dot_product(%s, c.cv) + list_dot_product(c.cv, c.cv)"
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
         |asg AS (
         |  SELECT vec_id, cid,
         |    CAST(floor(d2 * 1000000 + 0.5) AS BIGINT) AS d2e6
         |  FROM (
         |    SELECT e.vec_id, c.cid, ${d2.format("e.v", "e.v", "e.v")} AS d2,
         |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |        ${d2.format("e.v", "e.v", "e.v")}, c.cid) AS rn
         |    FROM e, cent c) WHERE rn = 1),
         |st AS (
         |  SELECT cid,
         |    CAST(count(*) AS BIGINT) AS n_total,
         |    CAST(sum(CASE WHEN vec_id % 4 < 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_base,
         |    CAST(sum(CASE WHEN vec_id % 4 >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_appended,
         |    CAST(coalesce(sum(CASE WHEN vec_id % 4 < 2 THEN d2e6 END), 0) AS BIGINT) AS sb,
         |    CAST(coalesce(sum(CASE WHEN vec_id % 4 >= 2 THEN d2e6 END), 0) AS BIGINT) AS sa
         |  FROM asg GROUP BY cid),
         |r AS (
         |  SELECT cid, n_total, n_base, n_appended,
         |    CASE WHEN n_base > 0 AND n_appended > 0 AND sb > 0 THEN
         |      floor(CAST(CAST(sa AS HUGEINT) * n_base AS DOUBLE)
         |        / CAST(CAST(sb AS HUGEINT) * n_appended AS DOUBLE)
         |        * 1000000 + 0.5) / 1000000 END AS drift_ratio
         |  FROM st)
         |SELECT CAST(cid AS INT) AS cid, n_total, n_base, n_appended,
         |  drift_ratio,
         |  CAST(CASE WHEN drift_ratio >= 1.25 THEN 1 ELSE 0 END AS INT)
         |    AS retrain,
         |  CAST(1 AS INT) AS search_match
         |FROM r""".stripMargin }) { (s, dir) =>
      val vecs = table(s, dir, "embeddings")
      val cents = vecs.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding").as("cv"))
      val loc = new org.apache.hadoop.fs.Path(
        s.conf.get("spark.sql.warehouse.dir"), "graft_ivf_incr").toString
      VectorOps.ivfInitIndexIncremental(s,
        vecs.filter(col("vec_id") % 4 < 2), cents,
        "vec_id", "embedding", "cid", "cv", loc)
      VectorOps.ivfAppendIndex(s, loc,
        vecs.filter(col("vec_id") % 4 === 2), cents,
        "vec_id", "embedding", "cid", "cv")
      VectorOps.ivfAppendIndex(s, loc,
        vecs.filter(col("vec_id") % 4 === 3), cents,
        "vec_id", "embedding", "cid", "cv")
      // incremental recall gate: the grown index must search
      // IDENTICALLY to a from-scratch assignment over the full corpus
      val qs = vecs.filter(col("vec_id") < 5)
      val inc = VectorOps.ivfSearchIndex(s, loc, qs, cents,
        "vec_id", "embedding", "cid", "cv", k = 10, nProbe = 3)
      val full = VectorOps.ivfTopK(vecs, qs, cents,
        "vec_id", "embedding", "cid", "cv", k = 10, nProbe = 3)
      val diffs = inc.exceptAll(full).count() + full.exceptAll(inc).count()
      val stats = VectorOps.ivfReadStats(s, loc)
      val ratio = when(
        col("n_base") > 0 && col("n_app") > 0 && col("sum_d2e6_base") > 0,
        floor((col("sum_d2e6_app").cast("decimal(38,0)") * col("n_base"))
            .cast("double")
          / (col("sum_d2e6_base").cast("decimal(38,0)") * col("n_app"))
            .cast("double") * lit(1000000) + lit(0.5)) / lit(1000000))
      stats.select(col("cid").cast("int").as("cid"),
          (col("n_base") + col("n_app")).as("n_total"),
          col("n_base"), col("n_app").as("n_appended"),
          ratio.as("drift_ratio"))
        .withColumn("retrain",
          when(col("drift_ratio") >= 1.25, 1).otherwise(0).cast("int"))
        .withColumn("search_match",
          lit(if (diffs == 0) 1 else 0).cast("int"))
    },

    // C151: IVF TOMBSTONE DELETION (round 12; r11 verdict #6 — C139
    // covers append + drift, real index maintenance also needs
    // deletes): the incrementally-built index (base % 4 < 2, one
    // append of the rest) takes a DELETE of every vec_id % 7 = 3 —
    // tombstones appended, sidecar decremented per cell with the
    // exact assignWithD2 arithmetic, NO cell file rewritten
    // (IvfIncrementalSpec pins file reuse + delete idempotence).
    // Output per cell: live/deleted member counts, the deleted
    // fraction (ONE pinned division, 6dp floor) with the compaction
    // trigger at ≥ 0.15 (a cell mostly tombstones is a cell whose
    // scan wastes its read budget — the FAISS/Lucene "merge when
    // deletes cross the bound" rule), and the LIVE d2e6 mass — the
    // oracle recomputes every number from scratch over the live
    // sub-corpus, so equality proves the decrement chain is
    // lossless. `search_match` is computed for real on the Spark
    // side: searching the tombstoned index must return EXACTLY the
    // from-scratch ivfTopK over the live corpus (deleted vectors
    // invisible, no recall hole); the oracle pins 1. Scale shape:
    // delete = one keyed join against the index + a model-sized
    // sidecar swap; search adds one keyed anti-join.
    Q("ann_ivf_delete", {
      val d2 = "list_dot_product(%s, %s) - 2 * list_dot_product(%s, c.cv) + list_dot_product(c.cv, c.cv)"
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
         |asg AS (
         |  SELECT vec_id, cid,
         |    CAST(floor(d2 * 1000000 + 0.5) AS BIGINT) AS d2e6
         |  FROM (
         |    SELECT e.vec_id, c.cid, ${d2.format("e.v", "e.v", "e.v")} AS d2,
         |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |        ${d2.format("e.v", "e.v", "e.v")}, c.cid) AS rn
         |    FROM e, cent c) WHERE rn = 1),
         |st AS (
         |  SELECT cid,
         |    CAST(count(*) FILTER (vec_id % 7 <> 3) AS BIGINT) AS n_live,
         |    CAST(count(*) FILTER (vec_id % 7 = 3) AS BIGINT) AS n_deleted,
         |    CAST(coalesce(sum(d2e6) FILTER (vec_id % 7 <> 3), 0) AS BIGINT)
         |      AS live_d2e6
         |  FROM asg GROUP BY cid)
         |SELECT CAST(cid AS INT) AS cid, n_live, n_deleted,
         |  floor(CAST(n_deleted AS DOUBLE) / (n_live + n_deleted)
         |    * 1000000 + 0.5) / 1000000 AS del_frac,
         |  live_d2e6,
         |  CAST(CASE WHEN floor(CAST(n_deleted AS DOUBLE)
         |      / (n_live + n_deleted) * 1000000 + 0.5) / 1000000 >= 0.15
         |    THEN 1 ELSE 0 END AS INT) AS compact,
         |  CAST(1 AS INT) AS search_match
         |FROM st""".stripMargin }) { (s, dir) =>
      val vecs = table(s, dir, "embeddings")
      val cents = vecs.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding").as("cv"))
      val loc = new org.apache.hadoop.fs.Path(
        s.conf.get("spark.sql.warehouse.dir"), "graft_ivf_del").toString
      VectorOps.ivfInitIndexIncremental(s,
        vecs.filter(col("vec_id") % 4 < 2), cents,
        "vec_id", "embedding", "cid", "cv", loc)
      VectorOps.ivfAppendIndex(s, loc,
        vecs.filter(col("vec_id") % 4 >= 2), cents,
        "vec_id", "embedding", "cid", "cv")
      VectorOps.ivfDeleteFromIndex(s, loc,
        vecs.filter(col("vec_id") % 7 === 3).select(col("vec_id")),
        "vec_id", cents, "cid", "cv")
      // deletion recall gate: the tombstoned index must search
      // IDENTICALLY to a from-scratch assignment over the LIVE corpus
      val qs = vecs.filter(col("vec_id") < 5)
      val inc = VectorOps.ivfSearchIndex(s, loc, qs, cents,
        "vec_id", "embedding", "cid", "cv", k = 10, nProbe = 3)
      val full = VectorOps.ivfTopK(
        vecs.filter(col("vec_id") % 7 =!= 3), qs, cents,
        "vec_id", "embedding", "cid", "cv", k = 10, nProbe = 3)
      val diffs = inc.exceptAll(full).count() + full.exceptAll(inc).count()
      val stats = VectorOps.ivfReadStats(s, loc)
      val delFrac = floor(col("n_deleted").cast("double")
        / (col("n_live") + col("n_deleted")) * lit(1000000) + lit(0.5)) /
        lit(1000000)
      stats.select(col("cid").cast("int").as("cid"),
          (col("n_base") + col("n_app") - col("n_del")).as("n_live"),
          col("n_del").as("n_deleted"),
          (col("sum_d2e6_base") + col("sum_d2e6_app")
            - col("sum_d2e6_del")).as("live_d2e6"))
        .select(col("cid"), col("n_live"), col("n_deleted"),
          delFrac.as("del_frac"), col("live_d2e6"),
          when(delFrac >= 0.15, 1).otherwise(0).cast("int").as("compact"))
        .withColumn("search_match",
          lit(if (diffs == 0) 1 else 0).cast("int"))
    },

    // C149: DIMENSION-TRUNCATION EVAL (the Matryoshka question —
    // Kusupati et al. NeurIPS 2022: how much retrieval quality
    // survives keeping only the first d' dimensions? — the eval run
    // before shipping truncated embeddings to cut index cost 2-4×):
    // for d' ∈ {16, 32, 64}, brute-force cosine top-10 on the
    // truncated vectors vs the full-dimension top-10 truth, pooled
    // recall per d' (d' = 64 is the built-in identity row — recall
    // 1.0 by construction, a free self-check). Exact: sliced
    // sequential-fold dots replay bit-identically (list slicing both
    // engines), hits are integers, ONE division per row, 6dp. Scale
    // shape: three bounded |Q|-broadcast corpus scans through
    // TopKPerKey heaps + model-sized joins.
    Q("embedding_dim_truncation_eval", {
      def bfCte(tag: String, dp: Int) =
        s"""sc_$tag AS (
           |  SELECT q.query_id, e.vec_id AS id,
           |    round(list_dot_product(q.qv[1:$dp], e.v[1:$dp])
           |      / (sqrt(list_dot_product(q.qv[1:$dp], q.qv[1:$dp]))
           |        * sqrt(list_dot_product(e.v[1:$dp], e.v[1:$dp]))), 6)
           |      AS cosine
           |  FROM e, q WHERE e.vec_id <> q.query_id),
           |top_$tag AS (
           |  SELECT query_id, id FROM (
           |    SELECT query_id, id,
           |      row_number() OVER (PARTITION BY query_id
           |        ORDER BY cosine DESC, id) AS rnk
           |    FROM sc_$tag) WHERE rnk <= 10)""".stripMargin
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |  FROM embeddings),
         |q AS (SELECT vec_id AS query_id, v AS qv FROM e
         |  WHERE vec_id < 5),
         |${bfCte("d16", 16)},
         |${bfCte("d32", 32)},
         |${bfCte("d64", 64)},
         |nq AS (SELECT CAST(count(*) AS BIGINT) AS nq FROM q),
         |h AS (
         |  SELECT 16 AS dim, CAST(count(*) AS BIGINT) AS hits
         |  FROM top_d16 t JOIN top_d64 f USING (query_id, id)
         |  UNION ALL
         |  SELECT 32, CAST(count(*) AS BIGINT)
         |  FROM top_d32 t JOIN top_d64 f USING (query_id, id)
         |  UNION ALL
         |  SELECT 64, CAST(count(*) AS BIGINT)
         |  FROM top_d64 t JOIN top_d64 f USING (query_id, id))
         |SELECT CAST(h.dim AS INT) AS dim, nq.nq AS n_queries, h.hits,
         |  floor(CAST(h.hits AS DOUBLE) / (10 * nq.nq) * 1000000 + 0.5)
         |    / 1000000 AS recall
         |FROM h, nq""".stripMargin
    }) { (s, dir) =>
      val vecs = table(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        .localCheckpoint() // three truncated scans + the truth read it
      def top(dp: Int) = {
        val sliced = vecs.select(col("vec_id"),
          slice(col("v"), 1, dp).as("vd"))
        VectorOps.bruteForceTopK(sliced,
            sliced.filter(col("vec_id") < 5), "vec_id", "vd", k = 10)
          .select(col("query_id"), col("id"))
      }
      val full = top(64).localCheckpoint()
      val nq = full.select(col("query_id")).distinct().count()
      Seq(16, 32, 64).map { dp =>
          val hits = (if (dp == 64) full else top(dp))
            .join(full, Seq("query_id", "id")).count()
          (dp, hits)
        }.foldLeft(Option.empty[org.apache.spark.sql.DataFrame]) {
          case (acc, (dp, hits)) =>
            val row = s.range(1).select(lit(dp).cast("int").as("dim"),
              lit(nq).as("n_queries"), lit(hits).as("hits"),
              (floor(lit(hits).cast("double") / (10 * nq) * lit(1000000)
                + lit(0.5)) / lit(1000000)).as("recall"))
            Some(acc.map(_.unionByName(row)).getOrElse(row))
        }.get
    },

    // C18: elementwise per-label centroid.
    // C107: EMBEDDING OUTLIER DETECTION — distance-to-centroid
    // ranking (the curation screen that catches mis-embedded /
    // corrupted vectors before they poison ANN indexes or k-means):
    // global centroid per dim via the C18 round(avg, 6) convention
    // (model-sized: d = 64 rows, collected driver-side — the BPE
    // top-pair class of collect), broadcast as an array literal;
    // each vector's squared L2 distance is a PINNED dim-ascending
    // left fold from 0.0 over zip_with (the ADC precedent — never a
    // distributed Σ of ulp-order-sensitive doubles); top-20 ranked
    // by the UNROUNDED distance (the dedup_keep_best order-key
    // precedent), vec_id tie-break, displayed at 6dp floor. One
    // map-only scoring pass + TakeOrderedAndProject.
    Q("embedding_outliers",
      """WITH e AS (SELECT vec_id, label,
        |        CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |u AS (SELECT unnest(range(len(v))) AS dim, unnest(v) AS val
        |      FROM e),
        |c AS (SELECT CAST(dim AS INT) AS dim, round(avg(val), 6) AS c
        |      FROM u GROUP BY dim),
        |ca AS (SELECT list(c ORDER BY dim) AS cv FROM c),
        |d AS (
        |  SELECT e.vec_id, e.label,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(range(len(e.v)), i ->
        |        (e.v[CAST(i + 1 AS INT)] - ca.cv[CAST(i + 1 AS INT)])
        |        * (e.v[CAST(i + 1 AS INT)] - ca.cv[CAST(i + 1 AS INT)]))),
        |      (a, x) -> a + x) AS dist2
        |  FROM e, ca)
        |SELECT vec_id, label,
        |  floor(dist2 * 1000000 + 0.5) / 1000000 AS dist2
        |FROM d ORDER BY d.dist2 DESC, vec_id LIMIT 20""".stripMargin) {
      (s, dir) =>
      val e = table(s, dir, "embeddings")
        .select(col("vec_id"), col("label"),
          col("embedding").cast("array<double>").as("v"))
        .localCheckpoint() // centroid pass + scoring pass read it
      val cRows = e
        .select(posexplode(col("v")).as(Seq("dim", "val")))
        .groupBy(col("dim")).agg(round(avg(col("val")), 6).as("c"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).sortBy(_._1)
      val cArr = array(cRows.map(p => lit(p._2)): _*)
      e.select(col("vec_id"), col("label"),
          aggregate(zip_with(col("v"), cArr, (a, b) => (a - b) * (a - b)),
            lit(0.0), (acc, x) => acc + x).as("_d2"))
        .orderBy(col("_d2").desc, col("vec_id")).limit(20)
        .select(col("vec_id"), col("label"),
          (floor(col("_d2") * lit(1000000) + lit(0.5)) / lit(1000000))
            .as("dist2"))
    },

    Q("embedding_centroids",
      """WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |u AS (SELECT label,
        |        unnest(range(len(v))) AS dim,
        |        unnest(v) AS val
        |      FROM e)
        |SELECT label, CAST(dim AS INT) AS dim_idx, round(avg(val), 6) AS c
        |FROM u GROUP BY label, dim""".stripMargin) { (s, dir) =>
      table(s, dir, "embeddings")
        .select(col("label"),
          posexplode(col("embedding").cast("array<double>")).as(Seq("dim_idx", "val")))
        .groupBy(col("label"), col("dim_idx"))
        .agg(round(avg(col("val")), 6).as("c"))
    },

    // C19: nearest-centroid assignment (one Lloyd E-step) against
    // the first 8 vectors as fixed centroids; squared euclidean,
    // deterministic tie-break on centroid id.
    Q("kmeans_assign",
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
        |d AS (
        |  SELECT e.vec_id, c.cid,
        |    round(list_dot_product(e.v, e.v)
        |      - 2 * list_dot_product(e.v, c.cv)
        |      + list_dot_product(c.cv, c.cv), 6) AS d2
        |  FROM e, c),
        |r AS (SELECT vec_id, cid, d2,
        |        row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
        |      FROM d)
        |SELECT vec_id, cid AS assigned, d2 FROM r WHERE rn = 1""".stripMargin) { (s, dir) =>
      val e = table(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val c = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("v").as("cv"))
      val d2 = round(
        VectorOps.dot(col("v"), col("v"))
          - lit(2) * VectorOps.dot(col("v"), col("cv"))
          + VectorOps.dot(col("cv"), col("cv")), 6)
      // min_by aggregation (map-side combinable) rather than a per-id
      // window argmin that would shuffle+sort corpus×k rows; the
      // struct ordering key reproduces the oracle's (d2, cid) tie-break.
      e.join(broadcast(c))
        .select(col("vec_id"), col("cid"), d2.as("d2"))
        .groupBy(col("vec_id"))
        .agg(min_by(struct(col("cid"), col("d2")), struct(col("d2"), col("cid"))).as("m"))
        .select(col("vec_id"), col("m.cid").as("assigned"), col("m.d2").as("d2"))
    },

    // C22: ITERATIVE k-means (two full Lloyd rounds + final E-step)
    // under the DuckDB oracle — the whole loop is closed-form SQL when
    // run in the operator's deterministic cross-engine mode (distances
    // and updated centroids re-quantized to 6dp each round, the same
    // trick kmeans_assign uses): both engines see identical rounded
    // rationals, so assignments after two M-steps match exactly.
    // Init = the 8 lowest-id vectors, tie-break on (d2, cluster).
    kmeansIterationsQuery,

    // C35: distributed scatter matrix (the PCA/whitening building
    // block): S(i,j) = Σ vᵢvⱼ − Σvᵢ·Σvⱼ/n over the upper triangle —
    // the centered Gram / covariance·n, whose eigenvectors are the
    // principal components. The RAW-SUM statistic (not /n) is what
    // ships: this corpus is near-isotropic, so covariances sit at
    // 1e-6, where ANY fixed decimal rounding is at the ulp noise
    // floor of an order-dependent sum; the scatter entry keeps values
    // ~n× above the 4dp boundary at every corpus size.
    // Two chained posexplodes fan each vector into its
    // dim-pairs, but the groupBy combines MAP-SIDE into d(d+1)/2
    // groups — the exchange carries 2080 partial rows per partition
    // regardless of corpus size; per-dim sums are a 64-row broadcast.
    // At 100 TB the d² fan-out is CPU-only amplification ahead of the
    // combine (a fused outer-product aggregate would trade that CPU
    // for custom-expression complexity; the declarative form wins
    // until profiling says otherwise).
    Q("embedding_covariance",
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |n AS (SELECT count(*) AS n FROM e),
        |u AS (
        |  SELECT CAST(i AS INT) AS i, v[CAST(i + 1 AS INT)] AS vi, v
        |  FROM e, unnest(range(len(v))) AS ui(i)),
        |p AS (
        |  SELECT i, CAST(j AS INT) AS j, vi, v[CAST(j + 1 AS INT)] AS vj
        |  FROM u, unnest(range(len(v))) AS uj(j)
        |  WHERE j >= i),
        |g AS (SELECT i, j, sum(vi * vj) AS sxy FROM p GROUP BY i, j),
        |m AS (SELECT CAST(i AS INT) AS i, sum(v[CAST(i + 1 AS INT)]) AS sx
        |      FROM e, unnest(range(len(v))) AS um(i) GROUP BY i)
        |SELECT g.i, g.j,
        |  round(g.sxy - mi.sx * mj.sx / n.n, 4) AS s_ij
        |FROM g, n
        |JOIN m mi ON g.i = mi.i
        |JOIN m mj ON g.j = mj.i""".stripMargin) { (s, dir) =>
      val e = table(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val n = e.agg(count(lit(1)).as("n"))
      val pairs = e
        .select(posexplode(col("v")).as(Seq("i", "vi")), col("v"))
        .select(col("i"), col("vi"), posexplode(col("v")).as(Seq("j", "vj")))
        .filter(col("j") >= col("i"))
      val g = pairs.groupBy(col("i"), col("j")).agg(sum(col("vi") * col("vj")).as("sxy"))
      val m = e.select(posexplode(col("v")).as(Seq("i", "vi")))
        .groupBy(col("i")).agg(sum(col("vi")).as("sx"))
      g.crossJoin(broadcast(n))
        .join(broadcast(m.select(col("i"), col("sx"))), Seq("i"))
        .join(broadcast(m.select(col("i").as("j"), col("sx").as("sy"))), Seq("j"))
        .select(col("i"), col("j"),
          round(col("sxy") - col("sx") * col("sy") / col("n"), 4)
            .as("s_ij"))
    },

    // C37: Johnson-Lindenstrauss random projection — 64 → 16 dims via
    // a fixed Gaussian matrix (deterministic Random(7) literals, the
    // ann_lsh_topk convention: Double.toString round-trips through
    // both engines' decimal parsers to identical bits, and both sum
    // the dot products left-to-right). The standard cheap
    // dimensionality reduction ahead of clustering/ANN at 100 TB: a
    // map-only pass, no shuffle until the (absent) downstream
    // consumer; projections scaled by 1/√16 so distances are
    // approximately preserved.
    Q("embed_random_projection", {
      val rng = new scala.util.Random(7L)
      val mat: Seq[Seq[Double]] = Seq.fill(16)(Seq.fill(64)(rng.nextGaussian()))
      val rows = mat.zipWithIndex.map { case (r, j) =>
        val lst = r.map(java.lang.Double.toString).mkString("[", ", ", "]")
        s"SELECT vec_id, $j AS dim_idx, round(list_dot_product(v, CAST($lst AS DOUBLE[])) * 0.25, 6) AS proj"
      }
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
         |${rows.map(r => s"$r FROM e").mkString("", "\nUNION ALL\n", "")}""".stripMargin
    }) { (s, dir) =>
      val rng = new scala.util.Random(7L)
      val mat: Seq[Seq[Double]] = Seq.fill(16)(Seq.fill(64)(rng.nextGaussian()))
      val e = table(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val projs = mat.zipWithIndex.map { case (r, j) =>
        struct(lit(j).as("dim_idx"),
          round(VectorOps.dot(col("v"),
            lit(r.toArray)) * 0.25, 6).as("proj"))
      }
      e.select(col("vec_id"), explode(array(projs: _*)).as("p"))
        .select(col("vec_id"), col("p.dim_idx").as("dim_idx"), col("p.proj").as("proj"))
    },

    // C23: symmetric int8 quantization of the embedding column —
    // per-vector scale, code aggregates, and the scale/2
    // reconstruction-error bound, all re-derived in DuckDB (identical
    // IEEE arithmetic: max, divide, floor-round-half-up — no rounding
    // needed, the doubles are bit-equal). err_ok is the oracle-visible
    // invariant |code·scale − v| ≤ scale/2 per dimension.
    Q("embed_quantize_int8",
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |s AS (SELECT vec_id, v,
        |        greatest(list_max(list_transform(v, x -> abs(x))), 1e-30) / 127 AS q_scale
        |      FROM e),
        |c AS (SELECT vec_id, v, q_scale,
        |        list_transform(v, x -> floor(x / q_scale + 0.5)) AS codes
        |      FROM s)
        |SELECT vec_id, q_scale,
        |  CAST(list_sum(codes) AS BIGINT) AS sum_codes,
        |  CAST(list_max(list_transform(codes, x -> abs(x))) AS BIGINT) AS max_abs_code,
        |  CAST(CASE WHEN len(list_filter(range(len(v)),
        |      i -> abs(codes[CAST(i + 1 AS INT)] * q_scale - v[CAST(i + 1 AS INT)])
        |           > q_scale * 0.5000001)) = 0 THEN 1 ELSE 0 END AS INT) AS err_ok
        |FROM c""".stripMargin) { (s, dir) =>
      val q = Quantize.quantizeInt8(
        table(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding").cast("array<double>").as("v")), "v")
      q.select(
        col("vec_id"), col("q_scale"),
        aggregate(col("q_codes"), lit(0L), (a, x) => a + x).as("sum_codes"),
        array_max(transform(col("q_codes"), x => abs(x))).cast("bigint").as("max_abs_code"),
        forall(
          zip_with(col("q_codes"), col("v"),
            (c, x) => abs(c * col("q_scale") - x) <= col("q_scale") * lit(0.5000001)),
          b => b).cast("int").as("err_ok"))
    })
}
