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
    def run(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }

    queries.foreach { case (n, fn) => run(n, fn) } // warmup (untimed)
    val results = queries.map { case (n, fn) => n -> run(n, fn) }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val json =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    Files.writeString(
      Paths.get(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")), json)
    println(json)
    spark.stop()
  }
}
