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
  // see Multimodal scaladoc). Rows-only; values pinned in spec.
  private val multimodalQueries: Seq[Q] = Seq(
    Q.rowsOnly("mm_feature_extract") { (s, dir) =>
      val docs = GraftSession.table(s, dir, "documents")
      Multimodal.extractFeatures(
        s, Multimodal.asMedia(docs, "text").select(
          col("doc_id"), col("media"), col("media_meta")),
        "doc_id")
        .select(col("id"), col("n_bytes"), col("format"),
          round(element_at(col("features"), 1), 6).as("f0"))
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
