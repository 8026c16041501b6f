package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding-vector operators: cosine similarity, exact near-dup
  * pairs, brute-force ANN top-k, and a random-hyperplane LSH ANN.
  *
  * Vectors are `array<float>` columns cast to double for math; dot
  * products are sequential left-folds (`aggregate` over `zip_with`)
  * so an external oracle computing the same fold gets bit-identical
  * doubles.
  *
  * Scale posture:
  *  - brute-force top-k broadcasts the (small) query set against one
  *    scan of the corpus — embarrassingly parallel, no shuffle until
  *    the final per-query top-k window over k·|Q| rows.
  *  - `nearDupPairs` is the exact O(n²) verify/baseline; `AnnLsh`
  *    buckets both sides by hyperplane sign bits so only same-bucket
  *    pairs are compared — the 100 TB path.
  */
object VectorOps {

  /** Sequential-fold dot product (native codegen expression). */
  def dot(a: Column, b: Column): Column = graft.functions.VectorExpressions.arrayDot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Exact all-pairs near-dup: (id_a < id_b, cosine ≥ threshold).
    * O(n²) — the verification baseline; for large corpora use the
    * LSH-bucketed variant. Norms are computed once per vector before
    * the join, so the per-pair work is one fused dot product.
    */
  def nearDupPairs(vecs: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val v = vecs.select(col(idCol), asDouble(col(vecCol)).as("v"))
      .withColumn("nrm", norm(col("v")))
    v.as("x").join(v.as("y"), col(s"x.$idCol") < col(s"y.$idCol"))
      .select(
        col(s"x.$idCol").as("id_a"), col(s"y.$idCol").as("id_b"),
        (dot(col("x.v"), col("y.v")) / (col("x.nrm") * col("y.nrm"))).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Exact all-pairs near-dup, shaped for a cluster. The O(n²)
    * similarity arithmetic is unavoidable for an EXACT result on
    * embeddings with no cluster structure (random-hyperplane LSH at
    * τ≈0.45 misses threshold pairs; metric-tree pruning finds nothing
    * to prune when angles concentrate near 90°), but the *plan* need
    * not be a BroadcastNestedLoopJoin: both sides are hashed into
    * `blocks` id-blocks and joined on explicit (block_a, block_b)
    * pair keys — a uniform shuffle equi-join with B(B+1)/2 keys and
    * (n/B)² work per key. No driver cartesian, no skew, replication
    * factor B per side (the classic triangle-join trade: B ≈
    * sqrt(2 × tasks) balances replication against parallelism).
    * Output is identical to `nearDupPairs` (the spec baseline).
    */
  def blockedNearDupPairs(vecs: DataFrame, idCol: String, vecCol: String,
      threshold: Double, blocks: Int = 16): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val v = vecs.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("nrm", norm(col("v")))
      .withColumn("blk", pmod(xxhash64(col("id")), lit(blocks)).cast("int"))
    val blockPairs = broadcast(
      (for { p <- 0 until blocks; q <- p until blocks } yield (p, q)).toDF("bp", "bq"))
    val left = v.join(blockPairs, col("blk") === col("bp")).drop("blk")
    val right = v.select(col("id").as("id_r"), col("v").as("v_r"),
        col("nrm").as("nrm_r"), col("blk"))
      .join(blockPairs, col("blk") === col("bq")).drop("blk")
    left.join(right, Seq("bp", "bq"))
      // p == q block pairs see both orientations — keep one; p < q
      // pairs appear once with arbitrary id order — normalized below.
      .filter(col("bp") < col("bq") || col("id") < col("id_r"))
      .select(
        least(col("id"), col("id_r")).as("id_a"),
        greatest(col("id"), col("id_r")).as("id_b"),
        (dot(col("v"), col("v_r")) / (col("nrm") * col("nrm_r"))).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Brute-force cosine top-k: for each query vector, the k nearest
    * corpus vectors (excluding itself when ids collide).
    * Deterministic: ranked by round(cosine, 6) desc then id.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("nrm", norm(col("v")))
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
      .withColumn("qnrm", norm(col("qv")))
    val scored = c.join(broadcast(q), col("id") =!= col("query_id"))
      .select(col("query_id"), col("id"),
        round(dot(col("qv"), col("v")) / (col("qnrm") * col("nrm")), 6).as("cosine"))
    // bounded-heap top-k per query (graft.plans.TopK custom operator)
    // instead of a row_number window — no full sort of the corpus×|Q|
    // score rows, map-side combine before the exchange
    graft.plans.TopK.perKey(scored, Seq("query_id"),
      Seq(("cosine", false), ("id", true)), k)
  }

  /** Binary-quantization ANN with exact rerank (the "BQ + rescore"
    * production path: sign-bit codes à la Charikar 2002, but packed
    * per-DIMENSION and scanned exhaustively rather than bucketed —
    * the flat-index complement of the LSH/IVF cell pruning). Each
    * vector's 64 sign bits (v[j] ≥ 0) pack into two 32-bit halves;
    * the coarse stage is a Hamming scan over 8 B/vector codes (at
    * 100 TB: a persisted 800×-smaller index relation, scanned at
    * memory bandwidth with two XOR+popcount per candidate), bounded
    * per-query by a `candidates`-heap (TopKPerKey — no corpus sort);
    * only the survivors touch the raw vectors for the exact cosine
    * rerank. Deterministic end to end: integer codes, integer Hamming
    * with (hd, id) tie-break, 6dp cosine with (cosine desc, id) —
    * closed-form replayable.
    *
    * Requires d ≥ 64 (packs the first 64 dimensions; ANSI
    * element_at fails loudly on shorter vectors).
    */
  def binaryRerankTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, candidates: Int): DataFrame = {
    def half(off: Int): Column = expr(
      s"""aggregate(sequence(0, 31), CAST(0 AS BIGINT), (acc, j) ->
         |  acc + IF(element_at(v, j + ${off + 1}) >= CAST(0 AS DOUBLE),
         |           shiftleft(CAST(1 AS BIGINT), j), CAST(0 AS BIGINT)))""".stripMargin)
    val c = corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("nrm", norm(col("v")))
    // the 8 B/vector code relation — the part a deployment persists
    val codes = c.select(col("id"), half(0).as("lo"), half(32).as("hi"))
    val qv = queries
      .select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
      .withColumn("qnrm", norm(col("qv")))
    val qc = broadcast(qv.select(col("query_id"), col("qv").as("v"))
      .select(col("query_id"), half(0).as("qlo"), half(32).as("qhi")))
    val ham = codes.join(qc, col("id") =!= col("query_id"))
      .select(col("query_id"), col("id"),
        expr("CAST(bit_count(qlo ^ lo) + bit_count(qhi ^ hi) AS INT)").as("hd"))
    val cand = graft.plans.TopK.perKey(ham, Seq("query_id"),
      Seq(("hd", true), ("id", true)), candidates).drop("rnk")
    val rer = cand.join(c, Seq("id")).join(broadcast(qv), Seq("query_id"))
      .select(col("query_id"), col("id"), col("hd"),
        round(dot(col("qv"), col("v")) / (col("qnrm") * col("nrm")), 6).as("cosine"))
    graft.plans.TopK.perKey(rer, Seq("query_id"),
      Seq(("cosine", false), ("id", true)), k)
  }

  /** IVF (inverted-file) ANN: corpus vectors are assigned to their
    * nearest coarse centroid (one broadcast pass); each query probes
    * only the `nProbe` cells nearest to it and reranks within them.
    * Work per query drops from |corpus| to ~nProbe/|cells| of it —
    * the classic recall/cost dial. All steps are declarative
    * (broadcast joins + window argmin), so the corpus scan stays a
    * single pass at any scale.
    *
    * @param centroids coarse quantizer: (cid, vector) rows. In
    *   production these come from k-means (see `kmeans_assign` /
    *   `embedding_centroids`); any deterministic set works.
    */
  private def d2(x: Column, y: Column): Column =
    dot(x, x) - lit(2) * dot(x, y) + dot(y, y)

  def ivfTopK(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, cidCol: String, centroidVecCol: String,
      k: Int, nProbe: Int = 2): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val cent = centroids.select(col(cidCol).as("cid"), asDouble(col(centroidVecCol)).as("cv"))

    // corpus → nearest cell: min_by aggregation, not a window argmin —
    // partial aggregation combines map-side, so the corpus×k expansion
    // never hits the exchange (a per-id window would shuffle+sort it).
    val assigned = c.join(broadcast(cent))
      .withColumn("_d2", d2(col("v"), col("cv")))
      .groupBy(col("id"))
      .agg(
        min_by(col("cid"), struct(col("_d2"), col("cid"))).as("cid"),
        first(col("v")).as("v"))
      .select(col("id"), col("v"), col("cid"))

    // query → nProbe nearest cells
    val probeW = Window.partitionBy(col("query_id")).orderBy(col("_d2"), col("cid"))
    val probes = q.join(broadcast(cent))
      .withColumn("_d2", d2(col("qv"), col("cv")))
      .withColumn("_rn", row_number().over(probeW))
      .filter(col("_rn") <= nProbe)
      .select(col("query_id"), col("qv"), col("cid"))

    // search only probed cells, rerank by cosine (bounded-heap top-k)
    val scored = assigned.join(broadcast(probes), Seq("cid"))
      .filter(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id"),
        round(dot(col("qv"), col("v")) / (norm(col("qv")) * norm(col("v"))), 6).as("cosine"))
    graft.plans.TopK.perKey(scored, Seq("query_id"),
      Seq(("cosine", false), ("id", true)), k)
  }

  /** ATTRIBUTE-FILTERED IVF search (the production vector-store
    * feature every RAG stack needs: "nearest neighbors WHERE
    * tenant/label/date matches"): [[ivfTopK]] with a candidate
    * predicate applied to the indexed side BEFORE the probe join —
    * filter-DURING-search, so the predicate prunes the candidate
    * scan (at 100 TB, pushed into the index relation's scan) instead
    * of post-filtering a k-list down to fewer than k results
    * (post-filtering's recall hole is exactly why stores implement
    * this natively). Assignment is per-vector, so the filtered
    * search returns the true top-k of the filtered sub-corpus within
    * the probed cells. `carryCols` ride the corpus into the
    * predicate.
    */
  def ivfTopKFiltered(corpus: DataFrame, queries: DataFrame,
      centroids: DataFrame, idCol: String, vecCol: String, cidCol: String,
      centroidVecCol: String, k: Int, nProbe: Int,
      carryCols: Seq[String], keep: Column): DataFrame = {
    val c = corpus.select(col(idCol).as("id") +: asDouble(col(vecCol)).as("v")
      +: carryCols.map(col): _*)
    val q = queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("qv"))
    val cent = centroids.select(col(cidCol).as("cid"),
      asDouble(col(centroidVecCol)).as("cv"))
    val aggs = first(col("v")).as("v") +:
      carryCols.map(n => first(col(n)).as(n))
    val assigned = c.join(broadcast(cent))
      .withColumn("_d2", d2(col("v"), col("cv")))
      .groupBy(col("id"))
      .agg(min_by(col("cid"), struct(col("_d2"), col("cid"))).as("cid"),
        aggs: _*)
      .filter(keep) // filter-during-search: prune candidates pre-join
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("_d2"), col("cid"))
    val probes = q.join(broadcast(cent))
      .withColumn("_d2", d2(col("qv"), col("cv")))
      .withColumn("_rn", row_number().over(probeW))
      .filter(col("_rn") <= nProbe)
      .select(col("query_id"), col("qv"), col("cid"))
    val scored = assigned.join(broadcast(probes), Seq("cid"))
      .filter(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id"),
        round(dot(col("qv"), col("v")) / (norm(col("qv")) * norm(col("v"))), 6)
          .as("cosine"))
    graft.plans.TopK.perKey(scored, Seq("query_id"),
      Seq(("cosine", false), ("id", true)), k)
  }

  /** IVF ANN over an int8-QUANTIZED candidate stage with exact rerank
    * — the storage-scale variant of [[ivfTopK]]: cell assignment and
    * candidate scoring read the 1-byte/dim [[Quantize]] image of the
    * corpus (a 4× lighter scan at 100 TB — on a real cluster the codes
    * column is what sits in the hot store; the float32 vectors are
    * fetched for candidates only), then the top `oversample·k`
    * candidates per query are reranked by EXACT cosine on the
    * full-precision vectors. With oversampling the quantization
    * error only affects which borderline candidates reach the rerank;
    * the returned scores are exact.
    */
  def ivfTopKInt8(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, cidCol: String, centroidVecCol: String,
      k: Int, nProbe: Int = 2, oversample: Int = 4): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
    val cq = Quantize.quantizeInt8(c.select(col("id"), col("v")), "v")
      .withColumn("dv", Quantize.dequantize(col("q_codes"), col("q_scale")))
      .select(col("id"), col("dv"))
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val cent = centroids.select(col(cidCol).as("cid"), asDouble(col(centroidVecCol)).as("cv"))

    // assignment + probing on the quantized image (same min_by shape
    // as ivfTopK — map-side combinable)
    val assigned = cq.join(broadcast(cent))
      .withColumn("_d2", d2(col("dv"), col("cv")))
      .groupBy(col("id"))
      .agg(
        min_by(col("cid"), struct(col("_d2"), col("cid"))).as("cid"),
        first(col("dv")).as("dv"))
      .select(col("id"), col("dv"), col("cid"))
    val probeW = Window.partitionBy(col("query_id")).orderBy(col("_d2"), col("cid"))
    val probes = q.join(broadcast(cent))
      .withColumn("_d2", d2(col("qv"), col("cv")))
      .withColumn("_rn", row_number().over(probeW))
      .filter(col("_rn") <= nProbe)
      .select(col("query_id"), col("qv"), col("cid"))

    // candidate stage: approximate cosine from the dequantized codes,
    // keep oversample·k per query (ties broken on id — deterministic;
    // bounded-heap top-k, not a window sort)
    val cands = graft.plans.TopK.perKey(
      assigned.join(broadcast(probes), Seq("cid"))
        .filter(col("id") =!= col("query_id"))
        .select(col("query_id"), col("id"),
          (dot(col("qv"), col("dv")) / (norm(col("qv")) * norm(col("dv")))).as("_acos")),
      Seq("query_id"), Seq(("_acos", false), ("id", true)), k * oversample)
      .select(col("query_id"), col("id"))

    // exact rerank: fetch full-precision vectors for candidates only
    val rerank = cands
      .join(c, Seq("id"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("id"),
        round(dot(col("qv"), col("v")) / (norm(col("qv")) * norm(col("v"))), 6).as("cosine"))
    graft.plans.TopK.perKey(rerank, Seq("query_id"),
      Seq(("cosine", false), ("id", true)), k)
  }

  /** Product-quantization ANN with exact rerank — the FAISS PQ/ADC
    * pattern at production parameters: per-subspace k-means codebooks
    * compress each corpus vector to `m` codes; queries score every
    * candidate through a per-query (m × kSub)-entry lookup table of
    * subspace distances (ADC — corpus VECTORS are never read during
    * scoring, only the codes table), keep a `shortlist`-deep ADC
    * shortlist, and rerank it by EXACT cosine on the full-precision
    * vectors (the ivfTopKInt8 trade: quantization error only decides
    * which borderline candidates reach the rerank; returned scores
    * are exact).
    *
    * Sizing note: ADC resolution is bounded by the code budget — with
    * kSub comparable to the corpus's natural cluster count, ADC
    * separates BETWEEN clusters but ties WITHIN them, so `shortlist`
    * must cover the within-cluster candidate set (in production PQ
    * composes with IVF so the shortlist covers a probed cell, and
    * kSub = 256 splits finer). See `ann_pq_topk` for the
    * oracle-replayable deterministic mode of the same train → encode
    * → ADC chain.
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, m: Int = 4, kSub: Int = 16,
      iterations: Int = 2, shortlist: Int = 256): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
    val dim = c.select(size(col("v"))).head().getInt(0)
    require(dim % m == 0, s"vector dim $dim is not divisible by m = $m subspaces")
    val sub = dim / m
    def subvecs(df: DataFrame, id: String, vc: String): DataFrame =
      df.select(col(id), explode(array((0 until m).map(si =>
          struct(lit(si).as("sub"), slice(col(vc), si * sub + 1, sub).as("sv"))): _*)).as("p"))
        .select(col(id), col("p.sub").as("sub"), col("p.sv").as("sv"))
    // all m codebooks train together — one pass per Lloyd iteration
    // at any m, not m separate fit() scans (KMeans.fitPerGroup)
    val codebook = KMeans.fitPerGroup(
        subvecs(c, "id", "v"), "sub", "id", "sv", k = kSub, iterations = iterations)
      .select(col("grp").as("sub"), col("cluster").as("cid"), col("cv"))
      .localCheckpoint()
    val codes = subvecs(c, "id", "v").join(broadcast(codebook), Seq("sub"))
      .withColumn("_d2", d2(col("sv"), col("cv")))
      .groupBy(col("id"), col("sub"))
      .agg(min_by(col("cid"), struct(col("_d2"), col("cid"))).as("cid"))
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val dt = subvecs(q, "query_id", "qv").join(broadcast(codebook), Seq("sub"))
      .select(col("query_id"), col("sub"), col("cid"),
        d2(col("sv"), col("cv")).as("term"))
      .localCheckpoint()
    val adc = codes.join(broadcast(dt), Seq("sub", "cid"))
      .filter(col("id") =!= col("query_id"))
      .groupBy(col("query_id"), col("id"))
      .agg(sum(col("term")).as("adc_d2"))
    val short = graft.plans.TopK.perKey(adc, Seq("query_id"),
        Seq(("adc_d2", true), ("id", true)), shortlist)
      .select(col("query_id"), col("id"))
    // exact rerank: fetch full-precision vectors for the shortlist only
    val rerank = c.join(broadcast(short), Seq("id"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("id"),
        round(dot(col("qv"), col("v")) / (norm(col("qv")) * norm(col("v"))), 6).as("cosine"))
    graft.plans.TopK.perKey(rerank, Seq("query_id"),
      Seq(("cosine", false), ("id", true)), k)
  }

  /** Random-hyperplane LSH sign bits (deterministic seed). */
  def withLshBucket(df: DataFrame, vecCol: String, planes: Int = 12,
      dim: Int = 64, seed: Long = 42L): DataFrame = {
    val rng = new scala.util.Random(seed)
    val planeVecs: Seq[Seq[Double]] =
      Seq.fill(planes)(Seq.fill(dim)(rng.nextGaussian()))
    // one fused dot per plane against a constant-folded literal array;
    // sign bits OR'd (disjoint powers of two, so + == |)
    val bucket = planeVecs.zipWithIndex.map { case (p, j) =>
      when(dot(array(p.map(lit): _*), col(vecCol)) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    df.withColumn("bucket", bucket)
  }

  /** LSH-bucketed ANN: per-query top-k searched only within the
    * query's bucket plus all Hamming-1 neighbor buckets (multi-probe
    * — a 6-plane space has 64 buckets, so single-probe would leave
    * most queries in a near-empty bucket). Recall < 1 by design —
    * the scale path trades recall for a keyed equi-join over
    * ~(probes/2^planes) of the corpus instead of a cross product.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, planes: Int = 6): DataFrame = {
    val c = withLshBucket(
      corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v")), "v", planes)
    val probes = lit(0L) +: (0 until planes).map(j => lit(1L << j))
    val q = withLshBucket(
        queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv")), "qv", planes)
      .withColumn("qbucket",
        explode(array(probes.map(p => col("bucket").bitwiseXOR(p)): _*)))
      .drop("bucket")
    val scored = c.join(broadcast(q),
        col("bucket") === col("qbucket") && col("id") =!= col("query_id"))
      .select(col("query_id"), col("id"),
        round(dot(col("qv"), col("v")) / (norm(col("qv")) * norm(col("v"))), 6).as("cosine"))
    graft.plans.TopK.perKey(scored, Seq("query_id"),
      Seq(("cosine", false), ("id", true)), k)
  }

  /** PERSIST an IVF index: cell assignments written as a parquet
    * table PARTITIONED BY cell id — the "build once, query many"
    * production shape [[ivfTopK]] computes inline. The partition
    * layout is what makes the index an INDEX at 100 TB: a search
    * probing nProbe of |cells| touches only those directories — the
    * scan does file-level pruning instead of reading the corpus — and
    * appends of new vectors land in their cell directories without
    * rewriting the rest.
    */
  def ivfWriteIndex(corpus: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, cidCol: String, centroidVecCol: String,
      path: String): Unit = {
    val c = corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
    val cent = centroids.select(col(cidCol).as("cid"), asDouble(col(centroidVecCol)).as("cv"))
    val assigned = c.join(broadcast(cent))
      .withColumn("_d2", d2(col("v"), col("cv")))
      .groupBy(col("id"))
      .agg(
        min_by(col("cid"), struct(col("_d2"), col("cid"))).as("cid"),
        first(col("v")).as("v"))
      .select(col("id"), col("v"), col("cid").cast("int").as("cid"))
    assigned.write.mode("overwrite").partitionBy("cid").parquet(path)
  }

  /** Cell assignment carrying the CHOSEN cell's e6-floored squared
    * distance (the member-to-centroid fit statistic the incremental
    * index tracks per cell): min over (d2, cid) structs picks the
    * same cell as [[ivfWriteIndex]]'s min_by, and the struct-min's d2
    * field is the matching distance. d2 is the sequential-fold
    * expression (dot(x,x) − 2·dot(x,y) + dot(y,y)) an external
    * engine replays bit-identically; the e6 floor makes every
    * downstream sum exact integer arithmetic.
    */
  private def assignWithD2(corpus: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, cidCol: String,
      centroidVecCol: String): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
    val cent = centroids.select(col(cidCol).as("cid"),
      asDouble(col(centroidVecCol)).as("cv"))
    c.join(broadcast(cent))
      .withColumn("_d2", d2(col("v"), col("cv")))
      .groupBy(col("id"))
      .agg(
        min_by(col("cid"), struct(col("_d2"), col("cid"))).as("cid"),
        min(struct(col("_d2"), col("cid"))).as("_m"),
        first(col("v")).as("v"))
      .select(col("id"), col("v"), col("cid").cast("int").as("cid"),
        floor(col("_m").getField("_d2") * lit(1000000) + lit(0.5))
          .cast("long").as("d2e6"))
  }

  private def statsPath(path: String): String = path + "_stats"
  private def tombPath(path: String): String = path + "_tombstones"

  /** C139: INITIALIZE an incrementally-maintainable IVF index — the
    * [[ivfWriteIndex]] layout (cell-partitioned parquet, searchable
    * by [[ivfSearchIndex]] verbatim) plus a model-sized per-cell
    * stats sidecar `<path>_stats` with (cid, n_base, sum_d2e6_base,
    * n_app, sum_d2e6_app): the base build's member counts and
    * e6-floored member-to-centroid squared distances, with the
    * append counters zeroed. Both paths are wiped first — the
    * incremental chain's correctness rests on starting from a
    * known-empty directory (appends never rewrite, so stale files
    * would silently survive).
    */
  def ivfInitIndexIncremental(spark: org.apache.spark.sql.SparkSession,
      base: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, cidCol: String, centroidVecCol: String,
      path: String): Unit = {
    // FS resolved from the PATH, not the default scheme: an index on
    // a non-default warehouse (s3a://, hdfs://) must be wiped on ITS
    // filesystem — FileSystem.get(conf) would target the default FS
    // and silently delete nothing (or the wrong tree).
    val idxPath = new org.apache.hadoop.fs.Path(path)
    val fs = idxPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(idxPath, true)
    fs.delete(new org.apache.hadoop.fs.Path(statsPath(path)), true)
    fs.delete(new org.apache.hadoop.fs.Path(tombPath(path)), true)
    val assigned = assignWithD2(
      base, centroids, idCol, vecCol, cidCol, centroidVecCol)
      .localCheckpoint() // one assignment feeds both the index write and the stats seed
    assigned.select(col("id"), col("v"), col("cid"))
      .write.mode("overwrite").partitionBy("cid").parquet(path)
    assigned.groupBy(col("cid"))
      .agg(count(lit(1)).as("n_base"), sum(col("d2e6")).as("sum_d2e6_base"))
      .select(col("cid"), col("n_base"), col("sum_d2e6_base"),
        lit(0L).as("n_app"), lit(0L).as("sum_d2e6_app"))
      .write.mode("overwrite").parquet(statsPath(path))
  }

  /** C139: APPEND a batch into a persisted IVF index WITHOUT a full
    * rebuild — the daily-ingest path of a production vector store.
    * The batch is assigned against the EXISTING centroids (so search
    * results stay identical to a from-scratch assignment — the
    * incremental recall gate in the query), written with
    * mode("append") + partitionBy: only the cell directories that
    * actually receive rows gain files, untouched cells' files are
    * never rewritten (pinned in IvfIncrementalSpec by file listing).
    * The stats sidecar merges the batch's per-cell (count, Σd2e6)
    * into the append counters — the drift signal: a cell whose
    * appended members sit systematically farther from its centroid
    * than its base members is a cell the codebook no longer fits,
    * and the query surfaces the retrain trigger when the exact
    * ratio crosses the bound. The sidecar is model-sized (one row
    * per cell), so the read-merge-rewrite is a guarded driver-side
    * materialization, not a distributed self-overwrite.
    */
  def ivfAppendIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      batch: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, cidCol: String,
      centroidVecCol: String): Unit = {
    val assigned = assignWithD2(
      batch, centroids, idCol, vecCol, cidCol, centroidVecCol)
      .localCheckpoint() // one assignment feeds both the append and the stats merge
    assigned.select(col("id"), col("v"), col("cid"))
      .write.mode("append").partitionBy("cid").parquet(path)
    val batchStats = assigned.groupBy(col("cid"))
      .agg(count(lit(1)).as("n_app"), sum(col("d2e6")).as("sum_d2e6_app"))
      .select(col("cid"), lit(0L).as("n_base"), lit(0L).as("sum_d2e6_base"),
        col("n_app"), col("sum_d2e6_app"))
    val old = readStats(spark, path)
      .select(col("cid"), col("n_base"), col("sum_d2e6_base"),
        col("n_app"), col("sum_d2e6_app"))
    val merged = old.unionByName(batchStats)
      .groupBy(col("cid"))
      .agg(sum(col("n_base")).as("n_base"),
        sum(col("sum_d2e6_base")).as("sum_d2e6_base"),
        sum(col("n_app")).as("n_app"),
        sum(col("sum_d2e6_app")).as("sum_d2e6_app"))
    // Materialize BEFORE overwriting the path being read (a lazy
    // overwrite would delete its own input); loud bound — the
    // sidecar is one row per CELL, never per vector.
    val rows = merged.collect()
    require(rows.length <= 65536,
      s"ivfAppendIndex: ${rows.length} cells exceed the model-size bound")
    writeStatsAtomic(spark, path, spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 1), merged.schema))
  }

  /** Replace the stats sidecar via temp-write + generation swap
    * (crash discipline for the append chain: the parquet append and
    * the sidecar rewrite are two separate commits, and a crash
    * between them must not leave a HALF-WRITTEN sidecar). Sequence:
    * write `_tmp` (complete new generation), retire the canonical
    * dir to `_prev` (never deleted before the new generation is in
    * place), rename `_tmp` into the canonical path, then drop
    * `_prev`. Each rename is a single FS operation on both local
    * and HDFS semantics, so AT EVERY INSTANT a complete generation
    * exists at the canonical path or at `_prev` — a crash inside
    * the swap window leaves the canonical path briefly empty but
    * never truncated, and [[readStats]] recovers by promoting
    * `_prev` back. (A crash between the index append and this swap
    * still leaves the sidecar one batch stale — the documented
    * recovery is re-running the append's stats merge or re-init;
    * the drift query's counters are monitoring, not search
    * correctness, which reads only the index files.) FS is resolved
    * from the path (non-default schemes — see init).
    */
  private def writeStatsAtomic(spark: org.apache.spark.sql.SparkSession,
      path: String, stats: DataFrame): Unit = {
    val sp = new org.apache.hadoop.fs.Path(statsPath(path))
    val tmp = new org.apache.hadoop.fs.Path(statsPath(path) + "_tmp")
    val prev = new org.apache.hadoop.fs.Path(statsPath(path) + "_prev")
    val fs = sp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    stats.write.mode("overwrite").parquet(tmp.toString)
    fs.delete(prev, true) // stale _prev from an earlier completed swap
    if (fs.exists(sp)) require(fs.rename(sp, prev),
      s"writeStatsAtomic: rename $sp -> $prev failed")
    require(fs.rename(tmp, sp),
      s"writeStatsAtomic: rename $tmp -> $sp failed; old generation at $prev")
    fs.delete(prev, true)
  }

  /** Read the stats sidecar, recovering from an interrupted
    * [[writeStatsAtomic]] swap: if the canonical dir is missing but
    * `_prev` exists (crash between the retire and promote renames),
    * promote `_prev` back — the complete OLD generation, the stated
    * staleness contract.
    */
  private def readStats(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame = {
    val sp = new org.apache.hadoop.fs.Path(statsPath(path))
    val prev = new org.apache.hadoop.fs.Path(statsPath(path) + "_prev")
    val fs = sp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(sp) && fs.exists(prev)) require(fs.rename(prev, sp),
      s"readStats: recovery rename $prev -> $sp failed")
    spark.read.parquet(sp.toString)
  }

  /** C151: DELETE vectors from a persisted incremental IVF index
    * WITHOUT rewriting any cell file — the tombstone half of real
    * index maintenance (C139 covers append + drift; a store that
    * can only grow isn't maintainable). Mechanics:
    *
    *   - deletes are IDEMPOTENT: ids already tombstoned are dropped
    *     up front (anti-join against the tombstone relation), so a
    *     retried delete never double-decrements the sidecar;
    *   - the surviving ids' per-cell mass — (count, Σd2e6) against
    *     their ASSIGNED centroid, the exact [[assignWithD2]]
    *     arithmetic, so decrements cancel the init/append increments
    *     exactly — is read from the index via a keyed join (never a
    *     full-index rewrite);
    *   - tombstones are appended FIRST (search correctness: a crash
    *     after this point can at worst leave the sidecar's
    *     monitoring counters one batch stale — same recovery story
    *     as the append chain — while the deleted vectors are already
    *     invisible to search), then the sidecar gains/extends
    *     `n_del`/`sum_d2e6_del` columns via the atomic temp+rename
    *     swap.
    *
    * [[ivfSearchIndex]] is tombstone-aware: live rows are the index
    * anti-joined against the tombstone ids, so search over the
    * deleted index returns EXACTLY the from-scratch result over the
    * live sub-corpus (the `ann_ivf_delete` oracle gate). Physical
    * reclamation is a separate explicit compaction (rewrite the
    * cells whose `n_del/(n_base+n_app)` crossed the bound — the
    * query surfaces that trigger).
    */
  def ivfDeleteFromIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, deleteIds: DataFrame, idCol: String,
      centroids: DataFrame, cidCol: String,
      centroidVecCol: String): Unit = {
    val del = deleteIds.select(col(idCol).cast("long").as("id")).distinct()
    val tp = new org.apache.hadoop.fs.Path(tombPath(path))
    val fs = tp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val fresh =
      if (fs.exists(tp))
        del.join(spark.read.parquet(tombPath(path)), Seq("id"), "left_anti")
      else del
    val cent = centroids.select(col(cidCol).cast("int").as("cid"),
      asDouble(col(centroidVecCol)).as("cv"))
    // only ids actually IN the index count (a delete of an unknown id
    // is a no-op, not an error): the keyed join drops the rest
    val victims = spark.read.parquet(path)
      .join(fresh, Seq("id"))
      .join(broadcast(cent), Seq("cid"))
      .select(col("id"), col("cid"),
        floor(d2(col("v"), col("cv")) * lit(1000000) + lit(0.5))
          .cast("long").as("d2e6"))
      .localCheckpoint() // feeds the tombstone write AND the stats merge
    victims.select(col("id")).write.mode("append").parquet(tombPath(path))
    val delStats = victims.groupBy(col("cid"))
      .agg(count(lit(1)).as("n_del_b"), sum(col("d2e6")).as("sum_d2e6_del_b"))
    val old = readStats(spark, path)
    val old7 =
      if (old.columns.contains("n_del")) old
      else old.withColumn("n_del", lit(0L))
        .withColumn("sum_d2e6_del", lit(0L))
    val merged = old7.join(delStats, Seq("cid"), "left")
      .select(col("cid"), col("n_base"), col("sum_d2e6_base"),
        col("n_app"), col("sum_d2e6_app"),
        (col("n_del") + coalesce(col("n_del_b"), lit(0L))).as("n_del"),
        (col("sum_d2e6_del")
          + coalesce(col("sum_d2e6_del_b"), lit(0L))).as("sum_d2e6_del"))
    val rows = merged.collect()
    require(rows.length <= 65536,
      s"ivfDeleteFromIndex: ${rows.length} cells exceed the model-size bound")
    writeStatsAtomic(spark, path, spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 1), merged.schema))
  }

  /** Read the incremental index's per-cell stats sidecar (recovers
    * from an interrupted generation swap — see [[readStats]]).
    */
  def ivfReadStats(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame =
    readStats(spark, path)

  /** Search a persisted IVF index (written by [[ivfWriteIndex]]):
    * queries rank cells against the same centroids, then join the
    * probed cells against the index scan ON THE PARTITION COLUMN —
    * with the probe set on the broadcast side, Spark's dynamic
    * partition pruning rewrites the scan to read only the probed
    * cell directories (PlanAndSmokeSpecs asserts the dynamicpruning
    * filter). Results are identical to [[ivfTopK]] with the same
    * centroids: same assignment (it was persisted), same probe
    * ranking, same rerank arithmetic.
    */
  def ivfSearchIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      queries: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, cidCol: String, centroidVecCol: String,
      k: Int, nProbe: Int = 2): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val cent = centroids.select(col(cidCol).as("cid"), asDouble(col(centroidVecCol)).as("cv"))
    val probeW = Window.partitionBy(col("query_id")).orderBy(col("_d2"), col("cid"))
    val probes = q.join(broadcast(cent))
      .withColumn("_d2", d2(col("qv"), col("cv")))
      .withColumn("_rn", row_number().over(probeW))
      .filter(col("_rn") <= nProbe)
      .select(col("query_id"), col("qv"), col("cid").cast("int").as("cid"))
    // tombstone-aware (C151): deleted ids are excluded via a keyed
    // anti-join — cell files are never rewritten by a delete, so the
    // raw scan still contains the victims until compaction
    val idxRaw = spark.read.parquet(path)
    val tp = new org.apache.hadoop.fs.Path(tombPath(path))
    val tfs = tp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val idx =
      if (tfs.exists(tp))
        idxRaw.join(spark.read.parquet(tombPath(path)), Seq("id"), "left_anti")
      else idxRaw
    val scored = idx.join(broadcast(probes), Seq("cid"))
      .filter(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id"),
        round(dot(col("qv"), col("v")) / (norm(col("qv")) * norm(col("v"))), 6).as("cosine"))
    graft.plans.TopK.perKey(scored, Seq("query_id"),
      Seq(("cosine", false), ("id", true)), k)
  }
}
