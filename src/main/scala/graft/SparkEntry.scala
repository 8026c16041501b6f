package graft

import graft.operators.Multimodal
import graft.queries.{CorpusQueries, DedupQueries, ExtendedQueries, Q, RelationalQueries, SessionQueries, StreamingQueries, TextQueries, VectorQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see SURVEY.md §2 for the inventory each query
  * key maps to.
  */
object SparkEntry {

  // C8: multimodal binary-column plumbing (decode kernel stubbed —
  // see Multimodal scaladoc). The oracle checks everything that is
  // not the stub: one row per media item, exact byte counts, format
  // metadata, and the fixed feature-vector arity coming out of the
  // batched decode path. Feature VALUES are pinned in MultimodalSpec.
  private val multimodalQueries: Seq[Q] = Seq(
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
      VectorQueries.all ++ StreamingQueries.all ++ multimodalQueries

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
