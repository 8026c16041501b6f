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
  * The decode kernel itself is a DETERMINISTIC STUB (this environment
  * has no image/audio codecs); everything around it — schema,
  * binary handling, per-partition batched iteration (the
  * `mapInPandas`/Arrow-batch shape), feature vector plumbing — is
  * real and tested. Swap `decodeStub` for a JNI/codec call in
  * production.
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

  /** Deterministic stand-in for a real decoder: 8 "feature" doubles
    * from a rolling hash over the payload bytes. Replace with a codec
    * in production — signature (bytes → fixed-length vector) is the
    * real contract.
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
    * N-th frame (the standard frame-subsampling step). Real codecs
    * slot in here — chunking/iteration/schema are the contract.
    */
  def frameSampleStub(payload: Array[Byte], frameBytes: Int,
      everyN: Int): Seq[(Int, Array[Double])] = {
    val nFrames = math.max(1, payload.length / math.max(1, frameBytes))
    (0 until nFrames by everyN).map { f =>
      val from = f * frameBytes
      val until = math.min(payload.length, from + frameBytes)
      (f, decodeStub(java.util.Arrays.copyOfRange(payload, from, until)))
    }
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
          decodeStub(payload))
      }
    }(enc)
  }
}
