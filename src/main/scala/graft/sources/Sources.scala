package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers (SURVEY.md §3): the TESTDATA parquet tables and a
  * binary-file media source for multimodal columns.
  */
object Sources {

  /** One of the TESTDATA tables (region … documents, embeddings). */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    graft.Tables.load(spark, sfDir, name)

  private val mimeByExt: Map[String, String] = Map(
    "jpg" -> "image/jpeg", "jpeg" -> "image/jpeg", "png" -> "image/png",
    "gif" -> "image/gif", "wav" -> "audio/wav", "mp3" -> "audio/mpeg",
    "mp4" -> "video/mp4", "txt" -> "text/plain", "bin" -> "application/octet-stream")

  /** Media files as a multimodal frame: (media_id, content, meta) — the
    * same shape [[graft.operators.Multimodal]] consumes. Built on
    * Spark's binaryFile source, so the scan distributes across
    * executors and prunes on path/length pushdown; pass e.g.
    * `pathGlobFilter = Some("*.png")` to restrict formats.
    */
  def media(spark: SparkSession, path: String,
            pathGlobFilter: Option[String] = None): DataFrame = {
    val reader = spark.read.format("binaryFile")
    val withGlob = pathGlobFilter.fold(reader)(g => reader.option("pathGlobFilter", g))
    val ext = lower(element_at(split(col("path"), "\\."), -1))
    val mimeExpr = mimeByExt.foldLeft(lit("application/octet-stream")) {
      case (acc, (e, m)) => when(ext === e, lit(m)).otherwise(acc)
    }
    withGlob.load(path).select(
      col("path").as("media_id"),
      col("content"),
      struct(
        col("length").as("n_bytes"),
        col("modificationTime").as("modified"),
        mimeExpr.as("mime")).as("meta"))
  }
}
