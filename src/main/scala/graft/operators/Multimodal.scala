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

  /** Stub resize: deterministic stride subsample to outLen bytes. */
  def resize(media: DataFrame, outLen: Int): DataFrame =
    media.withColumn("resized", resizeStubC(col("content"), outLen))

  /** Stub video frame sampling: fixed-size frames, every stride-th. */
  def sampleFrames(media: DataFrame, frameLen: Int, stride: Int): DataFrame =
    media.withColumn("frames", frameSampleC(col("content"), frameLen, stride))
}
