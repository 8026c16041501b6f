package graft.tools

import graft.GraftSession
import graft.operators.MinHashLSH
import org.apache.spark.sql.functions._

/** Scratch profiler for the minhash pipeline stages. */
object ProbeMinhash {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build(master = "local[16]")
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = GraftSession.table(spark, dir, "documents")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val grams = t("shingles+minhash count") {
      val g = MinHashLSH.withMinHashes(MinHashLSH.withShingles(
        docs.select(col("doc_id"), col("text")), "text"))
      g.cache().count()
    }
    val g = MinHashLSH.withMinHashes(MinHashLSH.withShingles(
      docs.select(col("doc_id"), col("text")), "text")).cache()
    t("grams count (cached)") { g.count() }
    val cand = t("candidatePairs") { MinHashLSH.candidatePairs(g, "doc_id").cache().count() }
    println(s"[probe] candidates: $cand")
    val full = t("full nearDupPairs") {
      MinHashLSH.nearDupPairs(docs, "doc_id", "text", 0.8).count()
    }
    println(s"[probe] pairs: $full")
    spark.stop()
  }
}
