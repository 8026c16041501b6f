package graft

import org.apache.spark.sql.functions._

/** C123 retrieval_eval / C124 knn_classify — planted corpora with
  * hand-computable rankings pin MRR/MAP/NDCG and the vote tie-break.
  */
class RetrievalEvalSpec extends SparkTestBase {
  import spark.implicits._

  /** 1 query (vec 0, label 0) + 12 corpus vectors on the unit circle
    * with strictly decreasing cosine to the query; labels place the
    * relevant hits at ranks 1 and 3 (vecs 1 and 3 carry label 0) and
    * nowhere else → R = 2, RR = 1, AP@10 = (1 + 2/3)/2, NDCG@10 =
    * (w1+w3)/(w1+w2).
    */
  private def plantDir(): String = {
    val dir = java.nio.file.Files.createTempDirectory("reval").toString
    val rows = (0 to 12).map { i =>
      val c = if (i == 0) 1.0 else 1.0 - 0.01 * i // cos to query
      val s = math.sqrt(math.max(0.0, 1.0 - c * c))
      val label = if (i == 0 || i == 1 || i == 3) 0 else 1
      (i.toLong, Array(c.toFloat, s.toFloat, 0.0f, 0.0f), label)
    }
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("retrieval_eval: planted ranking pins rr/ap/ndcg exactly") {
    val dir = plantDir()
    val rows = SparkEntry.queries("retrieval_eval")(spark, dir)
      .filter(col("query_id") === 0).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("n_rel") == 2L)
    assert(r.getAs[Double]("rr") == 1.0)
    assert(r.getAs[Double]("ap") == 0.833333)
    assert(r.getAs[Double]("ndcg") == 0.919721)
  }

  test("knn_classify: planted majority vote with (votes, label) tie-break") {
    val dir = plantDir()
    // vec 0's top-10 = vecs 1..10; labels there: {0: vecs 1,3} {1: rest}
    // → pred 1 (8 votes), true 0, incorrect
    val r = SparkEntry.queries("knn_classify")(spark, dir)
      .filter(col("query_id") === 0).collect().head
    assert(r.getAs[Int]("true_label") == 0)
    assert(r.getAs[Int]("pred_label") == 1)
    assert(r.getAs[Long]("votes") == 8L)
    assert(r.getAs[Int]("correct") == 0)
  }

  test("corpus: metrics bounded in [0,1], knn accuracy consistent") {
    val ev = SparkEntry.queries("retrieval_eval")(spark, sfDir).collect()
    assert(ev.length == 10)
    ev.foreach { r =>
      for (c <- Seq("rr", "ap", "ndcg")) {
        val v = r.getAs[Double](c)
        assert(v >= 0.0 && v <= 1.0, s"$c=$v")
      }
      // AP ≤ RR never holds in general, but NDCG ≥ AP does not either;
      // the only universal order is rr ≥ ap when the first hit is the
      // best precision point — not guaranteed; so only bounds here.
    }
    val kn = SparkEntry.queries("knn_classify")(spark, sfDir).collect()
    assert(kn.length == 25)
    kn.foreach { r =>
      assert((r.getAs[Int]("pred_label") == r.getAs[Int]("true_label"))
        == (r.getAs[Int]("correct") == 1))
      assert(r.getAs[Long]("votes") >= 1L && r.getAs[Long]("votes") <= 10L)
    }
  }
}
