package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table loading + shared output conventions for the driver's
  * DuckDB-oracle compare (SURVEY.md §5).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS); Spark only reads it as a
    // nanos-since-epoch long (which is also the better equispaced
    // coordinate type). Runtime-settable, but the session builders set
    // it too so the driver's own session works.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$table.parquet")
  }

  /** Fixed-point encode a double column so Spark and DuckDB hash
    * identically: both engines evaluate the same IEEE expression.
    * `scale` trades precision for robustness to cross-engine fp noise
    * (SURVEY.md §5 rule 1).
    */
  def fp(c: Column, scale: Double): Column =
    floor(c * lit(scale) + lit(0.5)).cast("long")

  def fp2(c: Column): Column = fp(c, 100d)
  def fp4(c: Column): Column = fp(c, 1e4)
  def fp6(c: Column): Column = fp(c, 1e6)

  /** SQL-side twin of [[fp]] for oracle queries. */
  def fpSql(e: String, scale: String): String =
    s"CAST(FLOOR(($e) * $scale + 0.5) AS BIGINT)"

  /** Cheap content fingerprint of a table path (file or directory):
    * sorted names + sizes + mtimes. Keys the /tmp materialization
    * caches (pre-grouped series, sliced streams) so a REGENERATED
    * source dataset can never be served a stale materialization built
    * from the old data.
    */
  def pathFingerprint(path: String): String = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles).toSeq.flatten.toSeq.flatMap(walk)
      else Seq(f)
    val h = walk(new java.io.File(path)).sortBy(_.getPath)
      .map(f => s"${f.getName}:${f.length}:${f.lastModified}")
      .mkString("|").hashCode
    (h & 0x7fffffff).toHexString
  }
}
