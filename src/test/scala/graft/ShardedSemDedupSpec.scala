package graft

import org.apache.spark.sql.functions._

/** semantic_dedup_sharded ≡ the UNSHARDED pipeline run independently
  * on each shard's vectors.
  *
  * That equivalence is the sharded variant's entire contract: hash
  * the corpus into S shards, then each shard behaves exactly like a
  * standalone SemDeDup corpus (own sample, own codebook, own
  * within-cluster pair join). The production query trains ALL shard
  * codebooks in one set of passes (fitPerGroup) — this spec checks it
  * against a literal per-shard loop of the single-codebook
  * fit/assign plus the all-member (pre-collapse) pair join, so both
  * the per-group training and the clone collapse are covered by one
  * independent reference.
  */
class ShardedSemDedupSpec extends SparkTestBase {
  import spark.implicits._

  test("sharded semantic dedup equals the unsharded pipeline per shard") {
    // Clone-bearing corpus (same construction as CloneCollapseSpec):
    // distinct rays cloned 1-4x with interleaved ids, plus scaled
    // near-duplicates, so both drop causes appear inside shards.
    val rng = new scala.util.Random(11)
    val dim = 8
    val base = (0 until 40).map { i =>
      val v = Array.fill(dim)(rng.nextGaussian().toFloat)
      v(i % dim) = v(i % dim) + 4.0f
      v
    }
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Float])]
    var id = 0L
    base.zipWithIndex.foreach { case (v, i) =>
      (0 until 1 + (i % 4)).foreach { _ => rows += ((id, v.toSeq)); id += 1 }
      if (i % 5 == 0) { rows += ((id, v.map(x => x * 1.01f).toSeq)); id += 1 }
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-shard").toString
    rows.toSeq.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val prodRows = SparkEntry.queries("semantic_dedup_sharded")(spark, dir)
      .select($"shard", $"cluster", $"n_members", $"n_kept", $"kept_id_sum")
      .as[(Long, Int, Long, Long, Long)].collect()
    val prod = prodRows.toSet

    // The query's own S/k formulas (n < 4·4096 ⇒ S = 4 here).
    val n = rows.length.toLong
    val s = math.max(4L, math.ceil(n / 4096.0).toLong)
    val k = math.ceil(math.sqrt(n.toDouble / s)).toInt
    assert(s > 1, "corpus produced a single shard — spec is vacuous")

    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val dot = graft.operators.VectorOps.dot _
    val cos = dot(col("va"), col("vb")) /
      (sqrt(dot(col("va"), col("va"))) * sqrt(dot(col("vb"), col("vb"))))
    val ref = (0L until s).flatMap { sh =>
      val es = e.filter($"vec_id" % s === sh).localCheckpoint()
      val train = es.orderBy($"vec_id").limit(32 * k).localCheckpoint()
      val (_, centroids) = graft.operators.KMeans.fit(
        train, "vec_id", "v", k, iterations = 2, roundTo = Some(6))
      val asg = graft.operators.KMeans.assign(
          es, "vec_id", "v", centroids, roundTo = Some(6), keepVectors = true)
        .select($"id".as("vec_id"), $"cluster", $"v").localCheckpoint()
      // all-member (pre-collapse) drop rule — the independent form
      val drops = asg.select($"cluster", $"vec_id".as("id_a"), $"v".as("va"))
        .join(asg.select($"cluster", $"vec_id".as("id_b"), $"v".as("vb")),
          Seq("cluster"))
        .filter($"id_a" < $"id_b" && cos >= 0.45)
        .select($"id_b".as("vec_id")).distinct()
      val kept = asg.join(drops, Seq("vec_id"), "left_anti")
      asg.groupBy($"cluster").agg(count(lit(1)).as("n_members"))
        .join(kept.groupBy($"cluster")
          .agg(count(lit(1)).as("n_kept"), sum($"vec_id").as("kept_id_sum")),
          Seq("cluster"))
        .select(lit(sh).as("shard"), $"cluster", $"n_members", $"n_kept",
          $"kept_id_sum")
        .as[(Long, Int, Long, Long, Long)].collect()
    }.toSet

    assert(prod === ref,
      s"sharded != per-shard unsharded:\nprod=${prod.toSeq.sorted}\nref=${ref.toSeq.sorted}")
    // accounting: every vector lands in exactly one (shard, cluster);
    // the clone corpus guarantees drops actually happened
    assert(prodRows.map(_._3).sum === rows.length.toLong)
    assert(prodRows.map(_._3).sum > prodRows.map(_._4).sum,
      "corpus produced no drops — spec is vacuous")
  }
}
