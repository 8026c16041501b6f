package graft

import org.apache.spark.sql.functions._

/** Round-12 seventh-batch specs — modularity and packing audit. */

/** B150 graph_modularity — two planted cliques joined by one bridge
  * edge: label prop finds them, and Q is hand-solved exactly.
  */
class ModularitySpec extends SparkTestBase {
  import spark.implicits._

  test("two 4-cliques + one bridge: hand-solved Q") {
    val dir = java.nio.file.Files.createTempDirectory("mod").toString
    // orders 1-2: clique on parts {1..4} (two orders make it a
    // clique via co-order); orders 3-4: clique on {11..14};
    // order 5 bridges 4-11
    val li = (Seq.tabulate(4)(i => (1L, (i + 1).toLong))
      ++ Seq.tabulate(4)(i => (2L, (i + 1).toLong))
      ++ Seq.tabulate(4)(i => (3L, (i + 11).toLong))
      ++ Seq.tabulate(4)(i => (4L, (i + 11).toLong))
      ++ Seq((5L, 4L), (5L, 11L)))
    li.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val rows = SparkEntry.queries("graph_modularity")(spark, dir)
      .collect().sortBy(_.getAs[Long]("rnk"))
    // graph: two K4s (6 edges each) + 1 bridge = 13 edges
    assert(rows.map(_.getAs[Long]("n_nodes")).sum == 8L)
    val q = rows.head.getAs[Double]("q_modularity")
    // if label prop lands on the two cliques: e_c = 6 each,
    // d_c = 13 each (12 + bridge endpoint): Q = Σ(4·13·6 − 169)/(4·169)
    val expect = math.floor(2.0 * (4 * 13 * 6 - 169) / (4.0 * 169)
      * 1000000 + 0.5) / 1000000
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_nodes") == 4L)
      assert(r.getAs[Long]("intra_edges") == 6L)
      assert(r.getAs[Long]("degree_sum") == 13L)
    }
    assert(q == expect)
  }

  test("corpus: Q in [-0.5, 1], top-10 populated, intra <= degree/2") {
    val rows = SparkEntry.queries("graph_modularity")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val q = rows.head.getAs[Double]("q_modularity")
    assert(q >= -0.5 && q <= 1.0)
    rows.foreach { r =>
      assert(2 * r.getAs[Long]("intra_edges") <= r.getAs[Long]("degree_sum"))
    }
  }
}

/** C122 packing_efficiency — a hand-built doc set pins bins, fill
  * rate, and the straddler rule against the C16 packer.
  */
class PackingEfficiencySpec extends SparkTestBase {
  import spark.implicits._

  test("docs of 1500/1500/1096 tokens: 2 bins, exactly one straddler") {
    val dir = java.nio.file.Files.createTempDirectory("pe").toString
    def doc(n: Int) = Seq.fill(n)("tok").mkString(" ")
    Seq((1L, "en", doc(1500)), (2L, "en", doc(1500)), (3L, "en", doc(1096)))
      .toDF("doc_id", "lang", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("packing_efficiency")(spark, dir)
      .collect().head
    // starts 0/1500/3000 → bins 0, 0, 1; doc 2 spans [1500, 2999]
    // crossing the 2048 boundary → exactly one straddler; 4096
    // tokens over 2 bins → fill exactly 1.0
    assert(r.getAs[Long]("n_docs") == 3L)
    assert(r.getAs[Long]("n_bins") == 2L)
    assert(r.getAs[Long]("total_tokens") == 4096L)
    assert(r.getAs[Long]("n_straddlers") == 1L)
    assert(r.getAs[Double]("fill_rate") == 1.0)
  }

  test("corpus: fill <= 1 is not required (start-bin convention) but " +
    "bins and straddlers are consistent with the packer") {
    val rows = SparkEntry.queries("packing_efficiency")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val packed = SparkEntry.queries("pack_documents")(spark, sfDir)
      .groupBy(col("lang"))
      .agg(countDistinct(col("bin_id")).as("nb"),
        count(lit(1)).as("nd"))
      .collect().map(r => r.getAs[String]("lang")
        -> (r.getAs[Long]("nb"), r.getAs[Long]("nd"))).toMap
    rows.foreach { r =>
      val (nb, nd) = packed(r.getAs[String]("lang"))
      assert(r.getAs[Long]("n_bins") == nb)
      assert(r.getAs[Long]("n_docs") == nd)
      assert(r.getAs[Long]("n_straddlers") <= r.getAs[Long]("n_docs"))
    }
  }
}
