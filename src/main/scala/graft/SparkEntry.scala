package graft

import graft.operators.Multimodal
import graft.queries.{AnalyticsQueries, CorpusQueries, DedupQueries, ExtendedQueries, FrontierQueries, Q, RelationalQueries, SamplingQueries, SessionQueries, StreamingQueries, TextQueries, VectorQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see SURVEY.md §2 for the inventory each query
  * key maps to.
  */
object SparkEntry {

  // C20: frame sampling under the FULL oracle. The frame features are
  // the rolling-hash kernel (h = h·31 + signed_byte mod 2⁶⁴;
  // feats[i%8] += (h & 0xffff)/65536) — every term is an exact
  // multiple of 2⁻¹⁶ with partial sums far below 2⁵³, so the doubles
  // are order-independent and bit-exact across engines. DuckDB replays
  // the hash in closed polynomial form (h_i = C·31^{i+1} +
  // Σ b_k·31^{i−k} mod 2⁶⁴) with precomputed powers-of-31 residues,
  // signed bytes extracted from hex(encode(text)).
  private val frameSampleOracleSql: String = {
    val M = BigInt(1) << 64
    val pow31 = (0 to 65).map(j => BigInt(31).modPow(BigInt(j), M))
    val powLit = pow31.mkString("CAST([", ", ", "] AS HUGEINT[])")
    val byteAt = // unsigned byte at 0-based position frm + k of hex image hx
      "CAST(('0x' || substring(hx, CAST(2 * (frm + k) + 1 AS INT), 2)) AS INT)"
    s"""WITH pw AS (SELECT $powLit AS p),
       |m AS (SELECT doc_id, hex(encode(text)) AS hx,
       |        CAST(octet_length(encode(text)) AS BIGINT) AS n
       |      FROM documents),
       |fr AS (SELECT doc_id, hx, n, unnest(range(0, greatest(n // 64, 1), 2)) AS f
       |       FROM m),
       |ch AS (SELECT doc_id, f, hx, f * 64 AS frm, least(n, f * 64 + 64) AS til
       |       FROM fr),
       |cb AS (SELECT doc_id, f,
       |         list_transform(range(til - frm), k ->
       |           CASE WHEN $byteAt < 128 THEN $byteAt ELSE $byteAt - 256 END) AS bs,
       |         til - frm AS len
       |       FROM ch),
       |hs AS (SELECT doc_id, f, len,
       |         list_transform(range(len), i ->
       |           ((1125899906842597 * p[CAST(i + 2 AS INT)]
       |             + coalesce(list_sum(list_transform(range(i + 1), k ->
       |                 bs[CAST(k + 1 AS INT)] * p[CAST(i - k + 1 AS INT)])), 0))
       |            % 18446744073709551616 + 18446744073709551616)
       |           % 18446744073709551616) AS hl
       |       FROM cb, pw),
       |ft AS (SELECT doc_id, f,
       |         list_transform(range(8), j ->
       |           coalesce(list_sum(list_transform(range(len), i ->
       |             CASE WHEN i % 8 = j
       |               THEN CAST(hl[CAST(i + 1 AS INT)] % 65536 AS DOUBLE) / 65536.0
       |               ELSE 0.0 END)), 0.0)) AS feats
       |       FROM hs)
       |SELECT doc_id AS id, CAST(f AS INT) AS frame_idx,
       |  CAST(unnest(range(8)) AS INT) AS dim_idx,
       |  unnest(feats) AS feat
       |FROM ft""".stripMargin
  }

  // C8/C20: multimodal binary-column plumbing — real javax.imageio
  // pixel decode for image payloads (values pinned in MultimodalSpec);
  // text payloads run the deterministic rolling-hash kernel, which the
  // mm_frame_sample oracle replays bit-exactly. mm_feature_extract's
  // oracle checks the non-kernel surface: one row per media item,
  // exact byte counts, format metadata, feature arity.
  private val multimodalQueries: Seq[Q] = Seq(
    Q("mm_frame_sample", frameSampleOracleSql) { (s, dir) =>
      val docs = GraftSession.table(s, dir, "documents")
      Multimodal.sampleFrames(s,
        Multimodal.asMedia(docs, "text").select(col("doc_id"), col("media")),
        "doc_id", frameBytes = 64, everyN = 2)
        .select(col("id"), col("frame_idx"),
          posexplode(col("features")).as(Seq("dim_idx", "feat")))
    },
    Q("mm_feature_extract",
      """SELECT doc_id AS id,
        |  CAST(strlen(text) AS INT) AS n_bytes,
        |  'fake/raw' AS format,
        |  CAST(8 AS INT) AS n_features
        |FROM documents""".stripMargin) { (s, dir) =>
      val docs = GraftSession.table(s, dir, "documents")
      Multimodal.extractFeatures(
        s, Multimodal.asMedia(docs, "text").select(
          col("doc_id"), col("media"), col("media_meta")),
        "doc_id")
        .select(col("id"), col("n_bytes"), col("format"),
          size(col("features")).as("n_features"))
    })

  val allQueries: Seq[Q] =
    RelationalQueries.all ++ SessionQueries.all ++ TextQueries.all ++
      DedupQueries.all ++ ExtendedQueries.all ++ CorpusQueries.all ++
      VectorQueries.all ++ StreamingQueries.all ++ SamplingQueries.all ++
      AnalyticsQueries.all ++ FrontierQueries.all ++ multimodalQueries

  /** Flagship: the reference's trip pipeline re-expressed — keyed
    * inactivity sessionization over the event stream.
    * Driver smoke-checks rows > 0 on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("sessionize_events")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.spark).toMap

  /** DuckDB-runnable oracle SQL for each SQL-expressible query. */
  def oracleSql: Map[String, String] =
    allQueries.collect { case Q(name, _, Some(sql)) => name -> sql }.toMap
}
