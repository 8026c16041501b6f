package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media are opaque `binary` columns plus a typed metadata struct —
  * the lakehouse pattern for 100 TB multimodal sets: parquet keeps
  * binaries out of dictionary encoding, metadata columns stay
  * prunable, and decode work runs batched per partition.
  *
  * The decode kernel is REAL for images: payloads whose magic bytes
  * identify PNG/JPEG/GIF/BMP are decoded with JDK-only
  * `javax.imageio` and summarized into 8 pixel statistics (channel
  * means, luminance stats, dimensions). Non-image payloads (audio/
  * video need codecs this environment lacks) fall back to a
  * deterministic rolling-hash kernel with the same (bytes →
  * fixed-length vector) contract, so the batched per-partition
  * plumbing — schema, binary handling, iterator transform (the
  * `mapInPandas`/Arrow-batch shape) — exercises both paths.
  */
object Multimodal {

  val mediaMetaType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  /** Wraps a string column as fake media: binary payload + metadata
    * derived deterministically from the payload.
    */
  def asMedia(df: DataFrame, srcCol: String): DataFrame =
    df.withColumn("media", col(srcCol).cast("binary"))
      .withColumn("media_meta", struct(
        lit("fake/raw").as("format"),
        (length(col(srcCol)) % 640).cast("int").as("width"),
        (length(col(srcCol)) % 480).cast("int").as("height")))

  /** True iff the payload's magic bytes identify an image format the
    * JDK can decode (PNG, JPEG, GIF, BMP).
    */
  def looksLikeImage(p: Array[Byte]): Boolean =
    (p.length >= 8 &&
      (p(0) & 0xff) == 0x89 && p(1) == 'P' && p(2) == 'N' && p(3) == 'G') ||
    (p.length >= 3 &&
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd8 && (p(2) & 0xff) == 0xff) ||
    (p.length >= 6 && p(0) == 'G' && p(1) == 'I' && p(2) == 'F' && p(3) == '8') ||
    (p.length >= 2 && p(0) == 'B' && p(1) == 'M')

  /** REAL image decode (JDK `javax.imageio`, no native deps): 8 pixel
    * statistics — mean R/G/B, mean luminance (Rec. 601), dark-pixel
    * fraction (lum < 64), bright fraction (lum > 192), width, height.
    * Throws on a corrupt payload that claimed an image magic — a
    * silently-skipped decode error is a data-loss bug at scale.
    */
  def decodeImageFeatures(payload: Array[Byte]): Array[Double] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    require(img != null, s"undecodable image payload (${payload.length} bytes)")
    val w = img.getWidth
    val h = img.getHeight
    var sr = 0.0; var sg = 0.0; var sb = 0.0; var slum = 0.0
    var dark = 0L; var bright = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xff
        val g = (rgb >> 8) & 0xff
        val b = rgb & 0xff
        val lum = 0.299 * r + 0.587 * g + 0.114 * b
        sr += r; sg += g; sb += b; slum += lum
        if (lum < 64) dark += 1
        if (lum > 192) bright += 1
        x += 1
      }
      y += 1
    }
    val n = w.toDouble * h
    Array(sr / n, sg / n, sb / n, slum / n, dark / n, bright / n,
      w.toDouble, h.toDouble)
  }

  /** The decode entry point used by the pipeline: real pixel decode
    * for image payloads, deterministic rolling-hash features for
    * opaque (audio/video) payloads — same 8-double contract.
    */
  def decode(payload: Array[Byte]): Array[Double] =
    if (looksLikeImage(payload)) decodeImageFeatures(payload)
    else decodeStub(payload)

  /** Deterministic fallback kernel for payloads with no JDK codec:
    * 8 "feature" doubles from a rolling hash over the payload bytes —
    * signature (bytes → fixed-length vector) matches the real decoder.
    */
  def decodeStub(payload: Array[Byte]): Array[Double] = {
    val feats = new Array[Double](8)
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) {
      h = h * 31L + payload(i)
      feats(i % 8) += (h & 0xffffL).toDouble / 65536.0
      i += 1
    }
    feats
  }

  /** Deterministic "frame" decomposition of a payload: fixed-size
    * byte chunks stand in for video frames; `everyN` samples every
    * N-th frame (the standard frame-subsampling step). Video
    * containers need codecs the JDK lacks, so chunks run through the
    * fallback kernel — chunking/iteration/schema are the contract,
    * and a chunk that IS a whole image (e.g. an MJPEG-style frame
    * dump) gets the real pixel decode via `decode`.
    */
  def frameSampleStub(payload: Array[Byte], frameBytes: Int,
      everyN: Int): Seq[(Int, Array[Double])] = {
    val nFrames = math.max(1, payload.length / math.max(1, frameBytes))
    (0 until nFrames by everyN).map { f =>
      val from = f * frameBytes
      val until = math.min(payload.length, from + frameBytes)
      (f, decode(java.util.Arrays.copyOfRange(payload, from, until)))
    }
  }

  /** 64-bit PERCEPTUAL HASH (aHash) of a payload, as four 16-bit
    * bands: 64 per-position rolling-hash samples over the first 64
    * bytes (shorter payloads zero-pad — only sub-64-byte items leak
    * any length signal), bit b set iff sample_b > mean(samples). The
    * classic aHash thresholds resized pixels against their mean; this
    * is the same construction over the byte-stream kernel, so the
    * signature tracks CONTENT (near-identical prefixes → small
    * Hamming distance) rather than payload size. Samples are exact
    * dyadic rationals and the mean is an exact /64, so the bits are
    * bit-deterministic across engines (the mm_frame_sample argument).
    */
  def phashBands(payload: Array[Byte]): Array[Int] = {
    val n = math.min(64, payload.length)
    val s = new Array[Double](64)
    var h = 1125899906842597L
    var i = 0
    while (i < n) {
      h = h * 31L + payload(i)
      s(i) = (h & 0xffffL).toDouble / 65536.0
      i += 1
    }
    var tot = 0.0
    i = 0
    while (i < 64) { tot += s(i); i += 1 }
    val mu = tot / 64.0
    val bands = new Array[Int](4)
    i = 0
    while (i < 64) { if (s(i) > mu) bands(i / 16) |= 1 << (i % 16); i += 1 }
    bands
  }

  /** Per-partition perceptual hashing: (id, b0..b3) band columns —
    * batched iterator transform, constant memory, map-only.
    */
  def phash(spark: SparkSession, media: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("b0", IntegerType), StructField("b1", IntegerType),
      StructField("b2", IntegerType), StructField("b3", IntegerType)))
    val idIdx = media.schema.fieldIndex(idCol)
    val mediaIdx = media.schema.fieldIndex("media")
    implicit val enc: Encoder[Row] = Encoders.row(outSchema)
    media.mapPartitions { rows =>
      rows.map { r =>
        val b = phashBands(r.getAs[Array[Byte]](mediaIdx))
        Row(r.getLong(idIdx), b(0), b(1), b(2), b(3))
      }
    }(enc)
  }

  /** Per-partition frame sampling: one media row explodes into
    * (id, frame_idx, features) rows — batched iterator transform,
    * constant memory, no driver involvement.
    */
  def sampleFrames(spark: SparkSession, media: DataFrame, idCol: String,
      frameBytes: Int = 64, everyN: Int = 2): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("frame_idx", IntegerType),
      StructField("features", ArrayType(DoubleType))))
    val idIdx = media.schema.fieldIndex(idCol)
    val mediaIdx = media.schema.fieldIndex("media")
    implicit val enc: Encoder[Row] = Encoders.row(outSchema)
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(idIdx)
        frameSampleStub(r.getAs[Array[Byte]](mediaIdx), frameBytes, everyN)
          .iterator.map { case (f, feats) => Row(id, f, feats) }
      }
    }(enc)
  }

  /** Batched per-partition feature extraction over the binary column.
    * Iterator-to-iterator transform: constant memory per partition,
    * no driver collect — the Spark-side shape a Pandas-UDF/Arrow
    * pipeline would have.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame,
      idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("n_bytes", IntegerType),
      StructField("format", StringType),
      StructField("features", ArrayType(DoubleType))))
    val idIdx = media.schema.fieldIndex(idCol)
    val mediaIdx = media.schema.fieldIndex("media")
    val metaIdx = media.schema.fieldIndex("media_meta")
    implicit val enc: Encoder[Row] = Encoders.row(outSchema)
    media.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](mediaIdx)
        val meta = r.getStruct(metaIdx)
        Row(r.getLong(idIdx), payload.length, meta.getString(0),
          decode(payload))
      }
    }(enc)
  }
}
