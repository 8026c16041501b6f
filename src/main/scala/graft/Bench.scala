package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main: times every registered query on
  * `SPARK_GRAFT_SF_DIR`, prints ONE JSON line and also writes it to a
  * file (`SPARK_GRAFT_BENCH_OUT`, default `bench_out.json`) so a
  * truncated log can't lose the result.
  *
  * Methodology:
  *   - queries run in sorted-name order (stable across runs);
  *   - a full untimed warmup pass first, so JVM/JIT/codegen warmup
  *     doesn't land on whichever query happens to run first;
  *   - execution is forced through the `noop` datasource write, which
  *     materializes every output row — `.count()` would let Catalyst
  *     collapse narrow projections to a row-count scan.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
    def run(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        dir: String = sfDir): Double = {
      val t0 = System.nanoTime()
      try fn(spark, dir).write.format("noop").mode("overwrite").save()
      catch {
        case t: Throwable =>
          // A broken query must not vanish silently into the total.
          System.err.println(
            s"[bench] FAILED $name: ${t.getClass.getName}: ${t.getMessage}")
          return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    queries.foreach { case (n, fn) => run(n, fn) } // warmup (untimed)
    val results = queries.map { case (n, fn) => n -> run(n, fn) }

    // ---- sf_x10 scale probe: the dedup family on a 10× corpus ----
    // documents/embeddings duplicated 10× with shifted ids (so every
    // doc gains 9 exact clones — the realistic web-corpus dedup
    // regime). The LSH/SimHash paths must grow ~linearly (caps and
    // banding bound the quadratics); embed-cosine is the exact-
    // by-design O(n²) baseline and is expected to grow ~100×.
    val scaleProbe = sys.env.getOrElse("SPARK_GRAFT_SCALE_PROBE", "1") != "0"
    val sfx10 = if (!scaleProbe) Map.empty[String, Double] else {
      import org.apache.spark.sql.functions.{col, lit, max}
      val x10Dir = sys.env.getOrElse("SPARK_GRAFT_X10_DIR", "/tmp/graft_sfx10")
      def duplicate(tbl: String, idCol: String): Unit = {
        val t = spark.read.parquet(s"$sfDir/$tbl.parquet")
        val shift = t.agg(max(col(idCol))).head().get(0)
          .asInstanceOf[Number].longValue() + 1L
        (0 until 10).map(i => t.withColumn(idCol, col(idCol) + lit(i * shift)))
          .reduce(_ unionByName _)
          .write.mode("overwrite").parquet(s"$x10Dir/$tbl.parquet")
      }
      duplicate("documents", "doc_id")
      duplicate("embeddings", "vec_id")
      Seq("dedup_minhash_pairs", "dedup_simhash", "dedup_embed_cosine",
        "dedup_clusters", "dedup_exact_docs")
        .map(n => n -> run(n, SparkEntry.queries(n), x10Dir)).toMap
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val x10Json = sfx10.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val json =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf_x10":$x10Json,"sf":"$sfDir"}"""
    Files.writeString(
      Paths.get(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")), json)
    println(json)
    spark.stop()
  }
}
