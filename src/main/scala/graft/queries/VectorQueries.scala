package graft.queries

import graft.GraftSession.table
import graft.operators.VectorOps
import org.apache.spark.sql.functions._

/** Embedding-analytics queries (SURVEY.md §2 C18-C19): per-label
  * centroids (the k-means M-step / class-prototype computation) and
  * nearest-centroid assignment (E-step). Both fully declarative:
  * posexplode + keyed aggregation, broadcast centroids × one corpus
  * scan — at 100 TB the centroid table stays tiny and the corpus is
  * touched once.
  */
object VectorQueries {

  val all: Seq[Q] = Seq(

    // C18: elementwise per-label centroid.
    Q("embedding_centroids",
      """WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |u AS (SELECT label,
        |        unnest(range(len(v))) AS dim,
        |        unnest(v) AS val
        |      FROM e)
        |SELECT label, CAST(dim AS INT) AS dim_idx, round(avg(val), 6) AS c
        |FROM u GROUP BY label, dim""".stripMargin) { (s, dir) =>
      table(s, dir, "embeddings")
        .select(col("label"),
          posexplode(col("embedding").cast("array<double>")).as(Seq("dim_idx", "val")))
        .groupBy(col("label"), col("dim_idx"))
        .agg(round(avg(col("val")), 6).as("c"))
    },

    // C19: nearest-centroid assignment (one Lloyd E-step) against
    // the first 8 vectors as fixed centroids; squared euclidean,
    // deterministic tie-break on centroid id.
    Q("kmeans_assign",
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
        |d AS (
        |  SELECT e.vec_id, c.cid,
        |    round(list_dot_product(e.v, e.v)
        |      - 2 * list_dot_product(e.v, c.cv)
        |      + list_dot_product(c.cv, c.cv), 6) AS d2
        |  FROM e, c),
        |r AS (SELECT vec_id, cid, d2,
        |        row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
        |      FROM d)
        |SELECT vec_id, cid AS assigned, d2 FROM r WHERE rn = 1""".stripMargin) { (s, dir) =>
      val e = table(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val c = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("v").as("cv"))
      val d2 = round(
        VectorOps.dot(col("v"), col("v"))
          - lit(2) * VectorOps.dot(col("v"), col("cv"))
          + VectorOps.dot(col("cv"), col("cv")), 6)
      // min_by aggregation (map-side combinable) rather than a per-id
      // window argmin that would shuffle+sort corpus×k rows; the
      // struct ordering key reproduces the oracle's (d2, cid) tie-break.
      e.join(broadcast(c))
        .select(col("vec_id"), col("cid"), d2.as("d2"))
        .groupBy(col("vec_id"))
        .agg(min_by(struct(col("cid"), col("d2")), struct(col("d2"), col("cid"))).as("m"))
        .select(col("vec_id"), col("m.cid").as("assigned"), col("m.d2").as("d2"))
    })
}
