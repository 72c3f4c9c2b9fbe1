package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Functions.dsl._

/** Multimodal column plumbing (SURVEY.md §2.2 op 29): media as opaque
  * binary columns with typed metadata; decode / feature-extract /
  * resize / frame-sample run as Catalyst expressions over the bytes.
  *
  * The decode kernels are DETERMINISTIC STUBS (this environment has no
  * codec libraries): byteHistogram stands in for feature extraction,
  * resizeStub for resampling, frameSample for video frame selection.
  * The Spark-side plumbing — binary schema, metadata struct, map-side
  * batching/partitioning — is real and what the tests/oracle verify;
  * a deployment swaps the kernel body only.
  */
object Multimodal {

  /** Wrap a text frame as a media frame: content bytes + typed
    * metadata (the shape a real image/audio table would have).
    */
  def asMedia(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).as("media_id"),
      encode(col(textCol), "UTF-8").as("content"),
      struct(
        length(col(textCol)).as("n_chars"),
        octet_length(encode(col(textCol), "UTF-8")).as("n_bytes"),
        lit("text/plain").as("mime")).as("meta"))

  /** Stub feature extraction: 16-bin high-nibble byte histogram. */
  def imageFeatures(media: DataFrame): DataFrame =
    media.withColumn("features", byteHistogramC(col("content")))

  /** Batched decode plumbing — the Scala analog of a pandas-UDF /
    * mapInPandas decoder: the partition iterator is re-chunked into
    * `batchSize` groups and the decoder runs once per batch, which is
    * the shape a real codec/JNI/model decoder needs (per-batch
    * initialization amortized; bounded memory per task). The default
    * decoder is the deterministic histogram stub; a deployment passes
    * its own `Seq[bytes] => Seq[features]`.
    */
  def imageFeaturesBatched(
      media: DataFrame, batchSize: Int = 64,
      decode: Seq[Array[Byte]] => Seq[Array[Long]] =
        _.map(graft.functions.Bridge.byteHistogramRaw)): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("string"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          val feats = decode(batch.map(_._2))
          batch.iterator.zip(feats.iterator).map { case ((id, _), f) => (id, f) }
        }
      }
      .toDF("media_id", "features")
  }

  /** Audio frame features over a PCM16-LE binary column: per complete
    * `frameLen`-sample frame, (frame, energy, zero-crossing rate).
    * The decode (bytes → two's-complement samples, minus an optional
    * DC offset `center`) is REAL — PCM needs no codec library — so
    * this path exercises the full decode→feature pipeline the image
    * stubs can only shape.
    */
  def audioFrameFeatures(media: DataFrame, frameLen: Int = 32,
                         center: Int = 0): DataFrame =
    media
      .select(col("media_id"),
        explode(pcmFramesC(col("content"), frameLen, center)).as("f"))
      .select(col("media_id"), col("f.frame").as("frame"),
        col("f.energy").as("energy"), col("f.zcr").as("zcr"))

  /** Stub resize: deterministic stride subsample to outLen bytes. */
  def resize(media: DataFrame, outLen: Int): DataFrame =
    media.withColumn("resized", resizeStubC(col("content"), outLen))

  /** Stub video frame sampling: fixed-size frames, every stride-th. */
  def sampleFrames(media: DataFrame, frameLen: Int, stride: Int): DataFrame =
    media.withColumn("frames", frameSampleC(col("content"), frameLen, stride))
}
