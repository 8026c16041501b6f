package graft

import org.apache.spark.sql.functions._

/** C139 `ann_ivf_incremental` — the incremental IVF maintenance
  * contract, pinned:
  *   1. appends REUSE untouched cell files byte-for-byte (only
  *      touched cell directories gain files; nothing is rewritten);
  *   2. the stats sidecar merges exactly (hand-computed counts and
  *      e6-floored distance sums);
  *   3. searching the incrementally-grown index returns EXACTLY the
  *      from-scratch result (same centroids ⇒ same assignment);
  *   4. the full query's drift ratio + retrain trigger on a planted
  *      embeddings table land on hand-solved values.
  */
class IvfIncrementalSpec extends SparkTestBase {
  import spark.implicits._
  import graft.operators.VectorOps

  private def df(rows: Seq[(Long, Array[Float])]) =
    rows.toDF("vec_id", "embedding")

  // two well-separated 2-dim cells
  private val cents = Seq(
    (0L, Array(0f, 0f)), (1L, Array(10f, 10f)))
  private def centDf = df(cents).select(
    col("vec_id").as("cid"), col("embedding").as("cv"))

  private def listFiles(dir: String): Map[String, (Long, Long)] = {
    val d = new java.io.File(dir)
    if (!d.exists()) Map.empty
    else d.listFiles().filter(_.isFile).filterNot(_.getName.startsWith("."))
      .map(f => f.getName -> (f.length(), f.lastModified())).toMap
  }

  test("append rewrites ONLY touched cell directories; sidecar merges exactly") {
    val loc = java.nio.file.Files.createTempDirectory("ivf_incr").toString + "/idx"
    val base = df(Seq(
      (10L, Array(0f, 1f)), (11L, Array(1f, 0f)),     // cell 0, d2 = 1 each
      (12L, Array(10f, 11f)), (13L, Array(11f, 10f)))) // cell 1, d2 = 1 each
    VectorOps.ivfInitIndexIncremental(spark, base, centDf,
      "vec_id", "embedding", "cid", "cv", loc)
    val cell0Before = listFiles(s"$loc/cid=0")
    val cell1Before = listFiles(s"$loc/cid=1")
    assert(cell0Before.nonEmpty && cell1Before.nonEmpty)

    // batch lands ONLY in cell 0 (both vectors nearest the origin)
    val batch = df(Seq((20L, Array(0f, 2f)), (21L, Array(2f, 0f)))) // d2 = 4 each
    VectorOps.ivfAppendIndex(spark, loc, batch, centDf,
      "vec_id", "embedding", "cid", "cv")

    // untouched cell: byte-identical file listing (name, size, mtime)
    assert(listFiles(s"$loc/cid=1") == cell1Before,
      "untouched cell directory must not be rewritten")
    // touched cell: every original file survives unchanged, new files appear
    val cell0After = listFiles(s"$loc/cid=0")
    cell0Before.foreach { case (name, meta) =>
      assert(cell0After.get(name).contains(meta),
        s"base file $name of the touched cell must survive unchanged") }
    assert(cell0After.size > cell0Before.size,
      "touched cell must gain append files")

    // sidecar: hand-computed (d2e6: base 1.0 → 1000000, batch 4.0 → 4000000)
    val st = VectorOps.ivfReadStats(spark, loc)
      .collect().map(r => r.getAs[Int]("cid") ->
        ((r.getAs[Long]("n_base"), r.getAs[Long]("sum_d2e6_base"),
          r.getAs[Long]("n_app"), r.getAs[Long]("sum_d2e6_app")))).toMap
    assert(st(0) == ((2L, 2000000L, 2L, 8000000L)))
    assert(st(1) == ((2L, 2000000L, 0L, 0L)))

    // the index now holds exactly base + batch members
    val members = spark.read.parquet(loc).select("id").as[Long].collect().sorted
    assert(members.toSeq == Seq(10L, 11L, 12L, 13L, 20L, 21L))
  }

  test("incrementally-grown index searches EXACTLY like from-scratch") {
    val loc = java.nio.file.Files.createTempDirectory("ivf_incr2").toString + "/idx"
    val all = Seq(
      (10L, Array(0f, 1f)), (11L, Array(1f, 0f)),
      (12L, Array(10f, 11f)), (13L, Array(11f, 10f)),
      (20L, Array(0f, 2f)), (21L, Array(10f, 12f)), (22L, Array(5f, 5f)))
    VectorOps.ivfInitIndexIncremental(spark, df(all.take(4)), centDf,
      "vec_id", "embedding", "cid", "cv", loc)
    VectorOps.ivfAppendIndex(spark, loc, df(all.drop(4)), centDf,
      "vec_id", "embedding", "cid", "cv")
    val qs = df(all.take(2))
    val inc = VectorOps.ivfSearchIndex(spark, loc, qs, centDf,
      "vec_id", "embedding", "cid", "cv", k = 3, nProbe = 2)
      .collect().map(_.toSeq).toSet
    val scratch = VectorOps.ivfTopK(df(all), qs, centDf,
      "vec_id", "embedding", "cid", "cv", k = 3, nProbe = 2)
      .collect().map(_.toSeq).toSet
    assert(inc == scratch && inc.nonEmpty)
  }

  test("query drift ratio + retrain trigger on a planted corpus") {
    // centroids 0..7 at (100·(i+1), 0) — off the origin, every norm
    // nonzero; members: 8 (base, cell 0, d2 1), 9 (base, cell 1,
    // d2 1), 10 (batch, cell 0, d2 9), 11 (batch, cell 1, d2 4).
    // Centroid ids are corpus members too (d2 0 to themselves):
    // 0,1,4,5 base; 2,6 batch1; 3,7 batch2.
    val dir = java.nio.file.Files.createTempDirectory("ivf_incr3").toString
    val rows = (0L to 7L).map(i => (i, Array(100f * (i + 1), 0f))) ++ Seq(
      (8L, Array(101f, 0f)), (9L, Array(200f, 1f)),
      (10L, Array(103f, 0f)), (11L, Array(200f, 2f)))
    df(rows).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = SparkEntry.queries("ann_ivf_incremental")(spark, dir)
      .collect().map(r => r.getAs[Int]("cid") -> r).toMap
    assert(out.size == 8)
    // cell 0: base {0: d2e6 0, 8: 1e6}, appended {10: 9e6} →
    // ratio = (9e6 · 2) / (1e6 · 1) = 18.0 → retrain
    assert(out(0).getAs[Long]("n_total") == 3L)
    assert(out(0).getAs[Long]("n_base") == 2L)
    assert(out(0).getAs[Long]("n_appended") == 1L)
    assert(out(0).getAs[Double]("drift_ratio") == 18.0)
    assert(out(0).getAs[Int]("retrain") == 1)
    // cell 1: base {1: 0, 9: 1e6}, appended {11: 4e6} → ratio 8.0
    assert(out(1).getAs[Double]("drift_ratio") == 8.0)
    assert(out(1).getAs[Int]("retrain") == 1)
    // lone-member cells: drift undefined, no retrain
    Seq(2, 3, 4, 5, 6, 7).foreach { c =>
      assert(out(c).getAs[Long]("n_total") == 1L)
      assert(out(c).isNullAt(out(c).fieldIndex("drift_ratio")))
      assert(out(c).getAs[Int]("retrain") == 0)
    }
    // the incremental recall gate computed 1 on real data
    assert(out.values.forall(_.getAs[Int]("search_match") == 1))
  }

  test("delete: tombstones hide victims from search, NO cell file rewritten") {
    val loc = java.nio.file.Files.createTempDirectory("ivf_del").toString + "/idx"
    val all = Seq(
      (10L, Array(0f, 1f)), (11L, Array(1f, 0f)),
      (12L, Array(10f, 11f)), (13L, Array(11f, 10f)),
      (20L, Array(0f, 2f)), (21L, Array(10f, 12f)))
    VectorOps.ivfInitIndexIncremental(spark, df(all), centDf,
      "vec_id", "embedding", "cid", "cv", loc)
    val cell0Before = listFiles(s"$loc/cid=0")
    val cell1Before = listFiles(s"$loc/cid=1")
    VectorOps.ivfDeleteFromIndex(spark, loc,
      Seq(11L, 21L).toDF("vec_id"), "vec_id", centDf, "cid", "cv")
    // deletes never touch cell files — only tombstones + sidecar
    assert(listFiles(s"$loc/cid=0") == cell0Before)
    assert(listFiles(s"$loc/cid=1") == cell1Before)
    // search excludes the victims and matches from-scratch over live
    val qs = df(all.take(1))
    val tombed = VectorOps.ivfSearchIndex(spark, loc, qs, centDf,
      "vec_id", "embedding", "cid", "cv", k = 5, nProbe = 2)
      .collect().map(_.toSeq).toSet
    val live = all.filterNot(r => r._1 == 11L || r._1 == 21L)
    val scratch = VectorOps.ivfTopK(df(live), qs, centDf,
      "vec_id", "embedding", "cid", "cv", k = 5, nProbe = 2)
      .collect().map(_.toSeq).toSet
    assert(tombed == scratch && tombed.nonEmpty)
    assert(!tombed.exists(_.contains(11L)) && !tombed.exists(_.contains(21L)))
  }

  test("delete is idempotent: re-deleting tombstoned ids never double-decrements") {
    val loc = java.nio.file.Files.createTempDirectory("ivf_del2").toString + "/idx"
    val base = df(Seq(
      (10L, Array(0f, 1f)), (11L, Array(1f, 0f)),     // cell 0, d2 = 1 each
      (12L, Array(10f, 11f)), (13L, Array(11f, 10f)))) // cell 1, d2 = 1 each
    VectorOps.ivfInitIndexIncremental(spark, base, centDf,
      "vec_id", "embedding", "cid", "cv", loc)
    def stats() = VectorOps.ivfReadStats(spark, loc)
      .collect().map(r => r.getAs[Int]("cid") ->
        ((r.getAs[Long]("n_del"), r.getAs[Long]("sum_d2e6_del")))).toMap
    VectorOps.ivfDeleteFromIndex(spark, loc,
      Seq(10L).toDF("vec_id"), "vec_id", centDf, "cid", "cv")
    val once = stats()
    assert(once(0) == ((1L, 1000000L)) && once(1) == ((0L, 0L)))
    // a RETRIED delete of the same id (plus an id not in the index)
    // must change nothing
    VectorOps.ivfDeleteFromIndex(spark, loc,
      Seq(10L, 999L).toDF("vec_id"), "vec_id", centDf, "cid", "cv")
    assert(stats() == once, "retried delete double-decremented the sidecar")
  }
}
