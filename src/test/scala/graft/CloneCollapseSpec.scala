package graft

import org.apache.spark.sql.functions._

/** Output-identity of semantic_dedup's round-8 exact-clone collapse.
  *
  * The sf test corpora carry no exact-duplicate embeddings, so the
  * oracle gate never exercises the collapsed (g_n > 1) branch — this
  * spec builds a corpus WITH clone groups and checks the production
  * query against an independent all-member reference (the pre-collapse
  * formulation): assignment via the same trained codebook, then the
  * full within-cluster pair join over EVERY member, drop any vector
  * with a lower-id same-cluster neighbor above the cosine threshold.
  * The collapse is only sound if these agree on every (cluster,
  * n_members, n_kept, kept_id_sum) row.
  */
class CloneCollapseSpec extends SparkTestBase {
  import spark.implicits._

  test("semantic_dedup output is identical with and without exact clones collapsed") {
    // 30 base vectors on distinct rays (near-orthogonal directions up
    // to sign/scale noise), cloned 1-4x with interleaved ids so clone
    // groups are not id-contiguous; plus a few near-duplicate (not
    // identical) pairs so both drop causes are present.
    val rng = new scala.util.Random(7)
    val dim = 8
    val base = (0 until 30).map { i =>
      val v = Array.fill(dim)(rng.nextGaussian().toFloat)
      v(i % dim) = v(i % dim) + 4.0f // spread directions
      v
    }
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Float])]
    var id = 0L
    base.zipWithIndex.foreach { case (v, i) =>
      val copies = 1 + (i % 4) // 1..4 exact clones
      (0 until copies).foreach { _ =>
        rows += ((id, v.toSeq)); id += 1
      }
      if (i % 5 == 0) { // a NEAR duplicate: same direction, scaled
        rows += ((id, v.map(x => x * 1.01f).toSeq)); id += 1
      }
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-clone").toString
    rows.toSeq.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val prodRows = SparkEntry.queries("semantic_dedup")(spark, dir)
      .select($"cluster", $"n_members", $"n_kept", $"kept_id_sum")
      .as[(Int, Long, Long, Long)].collect()
    val prod = prodRows.toSet

    // Independent reference: the pre-collapse all-member formulation.
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val n = e.count()
    val k = math.ceil(math.sqrt(n.toDouble)).toInt
    val m = math.min(n, 32L * k).toInt
    val train = e.orderBy($"vec_id").limit(m).localCheckpoint()
    val (_, centroids) = graft.operators.KMeans.fit(
      train, "vec_id", "v", k, iterations = 2, roundTo = Some(6))
    val asg = graft.operators.KMeans.assign(
        e, "vec_id", "v", centroids, roundTo = Some(6), keepVectors = true)
      .select($"id".as("vec_id"), $"cluster", $"v")
      .localCheckpoint()
    val dot = graft.operators.VectorOps.dot _
    val cos = dot(col("va"), col("vb")) /
      (sqrt(dot(col("va"), col("va"))) * sqrt(dot(col("vb"), col("vb"))))
    val drops = asg.select($"cluster", $"vec_id".as("id_a"), $"v".as("va"))
      .join(asg.select($"cluster", $"vec_id".as("id_b"), $"v".as("vb")),
        Seq("cluster"))
      .filter($"id_a" < $"id_b" && cos >= 0.45)
      .select($"id_b".as("vec_id")).distinct()
    val kept = asg.join(drops, Seq("vec_id"), "left_anti")
    val ref = asg.groupBy($"cluster").agg(count(lit(1)).as("n_members"))
      .join(kept.groupBy($"cluster")
        .agg(count(lit(1)).as("n_kept"), sum($"vec_id").as("kept_id_sum")),
        Seq("cluster"))
      .select($"cluster", $"n_members", $"n_kept", $"kept_id_sum")
      .as[(Int, Long, Long, Long)].collect().toSet

    assert(prod === ref,
      s"collapse changed output:\nprod=${prod.toSeq.sorted}\nref=${ref.toSeq.sorted}")
    // the corpus really exercised the collapse: every vector is
    // accounted for, and drops happened (clones guarantee them) —
    // sums over the ROW ARRAY, not the set (Set.map would collapse
    // equal per-cluster counts)
    assert(prodRows.map(_._2).sum === rows.length.toLong)
    assert(prodRows.map(_._2).sum > prodRows.map(_._3).sum,
      "corpus produced no drops — spec is vacuous")
  }
}
