package graft

import graft.operators.Hits
import org.apache.spark.sql.functions._

/** Hits.iterate: hand-computed scores on a tiny bipartite graph,
  * exact-integer L1 invariants, and the graph_hits query shape.
  */
class HitsSpec extends SparkTestBase {
  import spark.implicits._

  // c1 → {s1, s2}, c2 → {s1}: s1 is the stronger authority (both
  // buyers), c1 the stronger hub (buys from both authorities).
  private def edges = Seq(("c1", "s1"), ("c1", "s2"), ("c2", "s1"))
    .toDF("c", "s")

  private def toMap(df: org.apache.spark.sql.DataFrame, k: String,
      v: String): Map[String, Long] =
    df.select(col(k), col(v)).as[(String, Long)].collect().toMap

  test("one iteration reproduces the hand computation exactly") {
    val (h1, a1) = Hits.iterate(edges, "c", "s", iters = 1)
    // h0 = 500000 each; a1 raw (1000000, 500000), Σ=1500000
    assert(toMap(a1, "s", "a") == Map("s1" -> 666666L, "s2" -> 333333L))
    // h1 raw (999999, 666666), Σ=1666665 — both divide exactly
    assert(toMap(h1, "c", "h") == Map("c1" -> 600000L, "c2" -> 400000L))
  }

  test("two iterations reproduce the hand computation exactly") {
    val (h2, a2) = Hits.iterate(edges, "c", "s", iters = 2)
    // a2 raw (1000000, 600000), Σ=1600000
    assert(toMap(a2, "s", "a") == Map("s1" -> 625000L, "s2" -> 375000L))
    // h2 raw (1000000, 625000), Σ=1625000, DIV floors
    assert(toMap(h2, "c", "h") == Map("c1" -> 615384L, "c2" -> 384615L))
  }

  test("L1 mass is unit up to one DIV floor per node") {
    val (h, a) = Hits.iterate(edges, "c", "s", iters = 2)
    for ((df, col_) <- Seq((h, "h"), (a, "a"))) {
      val scores = df.select(col(col_)).as[Long].collect()
      val total = scores.sum
      assert(total <= 1000000L && total > 1000000L - scores.length,
        s"$col_ mass $total outside (unit - n, unit]")
      assert(scores.forall(_ >= 0))
    }
  }

  test("graph_hits emits min(20, nodes) distinct hubs and auths") {
    val rows = SparkEntry.queries("graph_hits")(spark, sfDir).collect()
    val byKind = rows.groupBy(_.getString(0))
    assert(byKind.keySet == Set("hub", "auth"))
    // sf0.001 has 10 suppliers / 150 customers; the top-20 cap binds
    // only where more nodes exist
    val li = GraftSession.table(spark, sfDir, "lineitem")
    val o = GraftSession.table(spark, sfDir, "orders")
    val traded = o.join(li, col("o_orderkey") === col("l_orderkey"))
    val expected = Map(
      "hub" -> math.min(20L, traded.select("o_custkey").distinct().count()),
      "auth" -> math.min(20L, traded.select("l_suppkey").distinct().count()))
    byKind.foreach { case (kind, rs) =>
      assert(rs.length == expected(kind), s"$kind has ${rs.length} rows")
      assert(rs.map(_.getString(1)).distinct.length == rs.length,
        s"$kind entities not distinct")
      assert(rs.forall(_.getLong(2) >= 0L))
      val prefix = if (kind == "hub") "c" else "s"
      assert(rs.forall(_.getString(1).startsWith(prefix)))
    }
  }
}
