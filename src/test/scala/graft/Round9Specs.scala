package graft

import graft.functions.{BitmapDistinct, HllSketch}
import graft.operators.RangeJoin
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class BitmapDistinctSpec extends SparkTestBase {
  import spark.implicits._

  test("bitmap distinct equals count(DISTINCT) and is partition-independent") {
    val ids = (0L until 5000L).map(i => (i % 7, (i * i) % 4096)) // dups per group
    for (parts <- Seq(1, 7)) {
      val df = spark.createDataset(ids).toDF("g", "id").repartition(parts)
      val got = df.groupBy($"g")
        .agg(BitmapDistinct.bitmapDistinct($"id", 4096).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = df.groupBy($"g").agg(countDistinct($"id").as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"parts=$parts")
    }
  }

  test("nulls are ignored; empty group counts zero") {
    val df = Seq[(Long, java.lang.Long)]((1L, 5L), (1L, null), (1L, 5L))
      .toDF("g", "id")
    val n = df.groupBy($"g").agg(BitmapDistinct.bitmapDistinct($"id", 64).as("n"))
      .head().getLong(1)
    assert(n == 1L)
  }

  test("out-of-domain id fails loudly rather than undercounting") {
    val df = Seq((1L, 70L)).toDF("g", "id")
    val e = intercept[Exception] {
      df.groupBy($"g").agg(BitmapDistinct.bitmapDistinct($"id", 64)).collect()
    }
    assert(e.getMessage != null || e.getCause != null) // surfaced, not masked
  }

  test("SQL registration works") {
    BitmapDistinct.register(spark)
    Seq((1L, 3L), (1L, 3L), (1L, 9L)).toDF("g", "id")
      .createOrReplaceTempView("bm_in")
    val n = spark.sql("SELECT bitmap_distinct(id, 64) FROM bm_in GROUP BY g")
      .head().getLong(0)
    assert(n == 2L)
  }
}

class HllRollupSpec extends SparkTestBase {
  import spark.implicits._

  test("union of per-grain sketches is bit-identical to the direct sketch") {
    val rows = (0L until 20000L).map(i => (i % 10, (i * 2654435761L) % 3000))
    val df = spark.createDataset(rows).toDF("day", "id")
    val merged = df.groupBy($"day").agg(HllSketch.hllSketchBin($"id").as("sk"))
      .agg(HllSketch.hllUnionEstimate($"sk").as("est")).head().getLong(0)
    val direct = df.agg(HllSketch.hllDistinct($"id").as("est")).head().getLong(0)
    assert(merged == direct)
    val exact = df.select($"id").distinct().count()
    assert(math.abs(merged - exact) <= math.max(2L, (exact * 0.05).toLong))
  }

  test("union is partition-independent") {
    val rows = (0L until 5000L).map(i => (i % 4, i % 997))
    val ests = for (parts <- Seq(1, 5)) yield {
      spark.createDataset(rows).toDF("day", "id").repartition(parts)
        .groupBy($"day").agg(HllSketch.hllSketchBin($"id").as("sk"))
        .agg(HllSketch.hllUnionEstimate($"sk").as("est")).head().getLong(0)
    }
    assert(ests.distinct.size == 1)
  }

  test("mismatched sketch width fails loudly") {
    val df = Seq(1L, 2L).toDF("id")
    val sk = df.agg(HllSketch.hllSketchBin($"id", p = 8).as("sk"))
    val e = intercept[Exception] {
      sk.agg(HllSketch.hllUnionEstimate($"sk", p = 12)).collect()
    }
    assert(e.getMessage != null || e.getCause != null)
  }

  test("SQL registration: INIT/MERGE round-trip equals direct estimate") {
    graft.functions.GraftFunctions.registerAll(spark)
    val rows = (0L until 3000L).map(i => (i % 5, (i * 7) % 500))
    spark.createDataset(rows).toDF("day", "id").createOrReplaceTempView("hll_in")
    val merged = spark.sql(
      """SELECT hll_union_estimate(sk) FROM
        |  (SELECT day, hll_sketch_bin(id) AS sk FROM hll_in GROUP BY day)"""
        .stripMargin).head().getLong(0)
    val direct = spark.sql("SELECT hll_distinct(id) FROM hll_in").head().getLong(0)
    assert(merged == direct)
  }
}

class PhashSpec extends SparkTestBase {
  import graft.operators.Multimodal

  private def hamming(a: Array[Int], b: Array[Int]): Int =
    a.zip(b).map { case (x, y) => Integer.bitCount(x ^ y) }.sum

  test("signature depends only on the first 64 bytes") {
    val base = ("The quick brown fox jumps over the lazy dog, again and again!" +
      " tail A").getBytes("UTF-8")
    val longer = (new String(base, "UTF-8") + " completely different suffix content")
      .getBytes("UTF-8")
    assert(base.length >= 64 && longer.length > base.length)
    assert(Multimodal.phashBands(base).sameElements(
      Multimodal.phashBands(longer)))
  }

  test("content changes in the prefix move the signature; clones collide") {
    val a = "abcdefghij".repeat(10).getBytes("UTF-8")
    val b = "abcdefghij".repeat(10).getBytes("UTF-8")
    val c = "abcdefghiX".repeat(10).getBytes("UTF-8")
    assert(hamming(Multimodal.phashBands(a), Multimodal.phashBands(b)) == 0)
    assert(hamming(Multimodal.phashBands(a), Multimodal.phashBands(c)) > 3)
  }

  test("short and empty payloads hash without error") {
    val short = Multimodal.phashBands("tiny".getBytes("UTF-8"))
    assert(short.length == 4)
    assert(Multimodal.phashBands(Array.emptyByteArray).forall(_ == 0))
  }

  test("mean threshold sets roughly half the bits on real-ish text") {
    val bands = Multimodal.phashBands(
      "A realistic sentence of mixed tokens 12345 with punctuation, yes!?".getBytes("UTF-8"))
    val bits = bands.map(Integer.bitCount).sum
    assert(bits > 8 && bits < 56, s"degenerate bit density: $bits")
  }
}

class IntervalOverlapSpec extends SparkTestBase {
  import spark.implicits._

  private def naive(l: Seq[(Long, Long, Long)], r: Seq[(Long, Long, Long)]) =
    (for {
      (li, ls, le) <- l
      (ri, rs, re) <- r
      if ls <= re && rs <= le
    } yield (li, ri)).toSet

  test("bucketed overlap join equals the naive inequality join, each pair once") {
    val rnd = new scala.util.Random(11)
    val left = (0L until 200L).map { i =>
      val s = rnd.nextInt(5000).toLong - 1000; (i, s, s + rnd.nextInt(400))
    }
    val right = (0L until 150L).map { i =>
      val s = rnd.nextInt(5000).toLong - 1000; (i, s, s + rnd.nextInt(700))
    }
    val lf = spark.createDataset(left).toDF("lid", "ls", "le")
    val rf = spark.createDataset(right).toDF("rid", "rs", "re")
    for (w <- Seq(64L, 300L, 1000L)) {
      val got = RangeJoin.intervalOverlap(lf, rf, "ls", "le", "rs", "re", w)
        .select($"lid", $"rid").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length == got.toSet.size, s"duplicate pairs at width $w")
      assert(got.toSet == naive(left, right), s"pair set mismatch at width $w")
    }
  }

  test("empty and inverted intervals match nothing") {
    val lf = Seq((1L, 10L, 5L)).toDF("lid", "ls", "le") // inverted
    val rf = Seq((1L, 0L, 100L)).toDF("rid", "rs", "re")
    assert(RangeJoin.intervalOverlap(lf, rf, "ls", "le", "rs", "re", 10L).count() == 0)
  }

  test("touching endpoints overlap (closed intervals)") {
    val lf = Seq((1L, 0L, 10L)).toDF("lid", "ls", "le")
    val rf = Seq((2L, 10L, 20L)).toDF("rid", "rs", "re")
    val rows = RangeJoin.intervalOverlap(lf, rf, "ls", "le", "rs", "re", 7L).collect()
    assert(rows.length == 1)
  }
}
