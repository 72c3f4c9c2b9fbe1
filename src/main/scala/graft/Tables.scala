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
    tsToNanos(spark.read.parquet(s"$sfDir/$table.parquet"))
  }

  /** events.ts has flipped physical parquet type across testdata
    * generations: TIMESTAMP(NANOS) — which Spark can only read as a
    * nanos-since-epoch long (under nanosAsLong, above) — and
    * TIMESTAMP(MICROS), which it reads natively as TimestampType.
    * Every operator and oracle computes on the long-nanos form (the
    * natural equispaced coordinate), so normalize at the read edge:
    * both generations yield the identical column. DuckDB sees a
    * timestamp either way (TIMESTAMP_NS / TIMESTAMP), so `epoch_us`
    * oracles are unaffected. Works on batch and streaming frames
    * (pure projection).
    */
  def tsToNanos(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{TimestampType, TimestampNTZType}
    val tsType = df.schema.fields.find(_.name == "ts").map(_.dataType)
    tsType match {
      case Some(TimestampType) =>
        // internal representation IS epoch micros; unix_micros reads it
        // back timezone-independently.
        df.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
      case Some(TimestampNTZType) =>
        // TIMESTAMP_NTZ's wall clock IS the raw stored micros (what
        // DuckDB's epoch_us reads off the same file). Rebuild epoch
        // micros from timezone-FREE field extraction — the previous
        // cast-to-TimestampType route goes through the session zone,
        // and pinning that zone session-wide as a read side effect
        // changed the semantics of unrelated timestamp expressions
        // (ADVICE r10). date/hour/minute/second extraction on NTZ
        // never consults a timezone; SECOND is DECIMAL(8,6) so the
        // micros survive exactly.
        val micros =
          expr("unix_date(CAST(ts AS DATE))").cast("long") * lit(86400000000L) +
          expr("CAST(date_part('HOUR', ts) AS LONG)") * lit(3600000000L) +
          expr("CAST(date_part('MINUTE', ts) AS LONG)") * lit(60000000L) +
          expr("CAST(date_part('SECOND', ts) * 1000000 AS LONG)")
        df.withColumn("ts", micros * lit(1000L))
      case _ => df
    }
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

  /** Content fingerprint of a table path (file or directory): md5 over
    * the sorted (relative subpath, size, mtime) listing — 64 bits kept,
    * so collisions across regenerations are negligible (a 32-bit
    * String.hashCode would make them merely unlikely). Keys the /tmp
    * materialization caches (pre-grouped series, sliced streams) so a
    * regenerated source dataset is not served a stale materialization.
    * Fails fast on a missing path instead of fingerprinting nothing.
    */
  def pathFingerprint(path: String): String = {
    val root = new java.io.File(path)
    require(root.exists, s"pathFingerprint: $path does not exist")
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles).toSeq.flatten.toSeq.flatMap(walk)
      else Seq(f)
    val listing = walk(root).sortBy(_.getPath)
      .map(f => s"${root.toPath.relativize(f.toPath)}:${f.length}:${f.lastModified}")
      .mkString("|")
    java.security.MessageDigest.getInstance("MD5")
      .digest(listing.getBytes("UTF-8"))
      .take(8).map(b => f"${b & 0xff}%02x").mkString
  }

  /** Remove sibling materialization dirs of `current` that share its
    * `tag-` prefix but carry a different (stale) fingerprint — keeps
    * /tmp bounded to one copy per source instead of one per
    * regeneration.
    */
  def pruneStaleSiblings(current: java.io.File, tag: String): Unit = {
    Option(current.getParentFile).flatMap(p => Option(p.listFiles)).foreach {
      siblings =>
        siblings.filter(f => f.isDirectory && f.getName.startsWith(s"$tag-") &&
            f.getName != current.getName)
          .foreach(rmTree)
        // orphaned build scratch from a crashed JVM (see materializeOnce)
        // — old enough that no live builder can still be writing it
        siblings.filter(f => f.isDirectory && f.getName.startsWith("_build-") &&
            f.lastModified < System.currentTimeMillis - 6 * 3600 * 1000L)
          .foreach(rmTree)
    }
  }

  private def rmTree(f: java.io.File): Unit = {
    Option(f.listFiles).foreach(_.foreach(rmTree)); f.delete(): Unit
  }

  /** Build-once /tmp materialization, safe across concurrent JVMs
    * (bench + verify racing over a regenerated dataset): the readable
    * state is "`target` exists and contains `marker`", and that state
    * only ever appears via an ATOMIC rename of a fully-built
    * process-unique scratch dir — check-then-write on the target
    * itself would let one process read a half-written dir whose
    * marker survives a concurrent `mode("overwrite")`. `build`
    * receives the scratch dir; the marker is created there AFTER
    * `build` returns, then the whole dir renames into place. A
    * concurrent builder that wins the rename makes ours fail
    * (rename(2) onto a non-empty dir), and we just discard the
    * scratch — both processes then read the winner's copy.
    */
  def materializeOnce(target: java.io.File, marker: String)
                     (build: java.io.File => Unit): Unit = {
    if (new java.io.File(target, marker).exists()) return
    val parent = target.getParentFile
    parent.mkdirs()
    val scratch = new java.io.File(parent,
      s"_build-${target.getName}-${java.util.UUID.randomUUID.toString.take(8)}")
    try {
      build(scratch)
      new java.io.File(scratch, marker).createNewFile()
      try java.nio.file.Files.move(scratch.toPath, target.toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      catch { // a concurrent builder won the rename — use its copy
        case _: java.nio.file.FileSystemException => rmTree(scratch)
      }
    } finally if (scratch.exists()) rmTree(scratch)
  }
}
