package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.Files

/** A hand-rolled transaction-log table format on plain parquet — the
  * Delta/Iceberg role (snapshot isolation, time travel, copy-on-write
  * upsert/delete, stats-based file skipping) without any external
  * catalog, feasible in a zero-egress sandbox.
  *
  * Layout:
  * {{{
  *   <table>/data/f-<uuid>.parquet    immutable data files
  *   <table>/_log/v00000000.json      manifest per version
  * }}}
  *
  * A manifest lists the ACTIVE files of that snapshot with per-file
  * row counts and key min/max. Readers resolve a version (or latest),
  * then read exactly the listed files — concurrent writers never
  * disturb a pinned snapshot, because data files are immutable and
  * commits only add new manifest versions.
  *
  * Commit protocol: write the manifest to a temp name, then
  * atomically LINK it to `v{N}.json` — put-if-absent (link(2) fails
  * with EEXIST; POSIX rename would silently replace). Two writers
  * racing to the same version: exactly one link wins, the loser gets
  * a [[java.nio.file.FileAlreadyExistsException]] and must
  * re-resolve and retry (optimistic concurrency, the Delta protocol
  * shape; on S3-class stores the same contract comes from
  * put-if-absent / a commit service).
  *
  * Scale shape (100 TB): the manifest is control-plane metadata —
  * O(file count) not O(rows) — and every data-plane operation is file
  * pruned through it: a keyed upsert rewrites ONLY files whose
  * [min,max] key range intersects the delta's keys (the rest carry
  * forward by reference, zero IO); a range delete DROPS files fully
  * inside the range without reading them and rewrites only boundary
  * files; a range read hands Spark only the overlapping files, so
  * skipping happens before any footer is opened. Per-file stats are
  * computed in one distributed job per commit (groupBy input file),
  * never by driver-side row iteration.
  */
object ManifestTable {

  final case class FileEntry(name: String, rows: Long, minKey: Long, maxKey: Long)
  final case class Snapshot(version: Int, op: String, keyCol: String,
                            files: Seq[FileEntry])

  private def logDir(table: String) = new File(table, "_log")
  private def dataDir(table: String) = new File(table, "data")
  private def manifestFile(table: String, v: Int) =
    new File(logDir(table), f"v$v%08d.json")

  // --- manifest serde (jackson-databind rides in with Spark) ---

  private def render(s: Snapshot): String = {
    val sb = new StringBuilder
    sb.append("{\"version\":").append(s.version)
      .append(",\"op\":\"").append(s.op)
      .append("\",\"keyCol\":\"").append(s.keyCol).append("\",\"files\":[")
    s.files.zipWithIndex.foreach { case (f, i) =>
      if (i > 0) sb.append(',')
      sb.append("{\"name\":\"").append(f.name)
        .append("\",\"rows\":").append(f.rows)
        .append(",\"minKey\":").append(f.minKey)
        .append(",\"maxKey\":").append(f.maxKey).append('}')
    }
    sb.append("]}").toString
  }

  private def parse(json: String): Snapshot = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper
    val root = m.readTree(json)
    val files = scala.collection.mutable.ArrayBuffer.empty[FileEntry]
    val it = root.get("files").elements()
    while (it.hasNext) {
      val n = it.next()
      files += FileEntry(n.get("name").asText, n.get("rows").asLong,
        n.get("minKey").asLong, n.get("maxKey").asLong)
    }
    Snapshot(root.get("version").asInt, root.get("op").asText,
      root.get("keyCol").asText, files.toSeq)
  }

  /** Atomic put-if-absent commit. Throws FileAlreadyExistsException if
    * the version was already committed (optimistic-concurrency loser).
    * POSIX rename() REPLACES an existing destination, so a plain
    * atomic move is last-writer-wins — the wrong contract. Hard-link
    * creation (link(2)) is atomic AND fails with EEXIST, which is
    * exactly put-if-absent; the temp name is then unlinked.
    */
  def commit(table: String, s: Snapshot): Unit = {
    logDir(table).mkdirs()
    val tmp = new File(logDir(table),
      s"_tmp-${java.util.UUID.randomUUID.toString.take(8)}.json")
    Files.write(tmp.toPath, render(s).getBytes(StandardCharsets.UTF_8))
    try Files.createLink(manifestFile(table, s.version).toPath, tmp.toPath)
    finally Files.deleteIfExists(tmp.toPath): Unit
  }

  def latestVersion(table: String): Int = {
    val vs = Option(logDir(table).listFiles()).getOrElse(Array.empty)
      .map(_.getName).filter(n => n.startsWith("v") && n.endsWith(".json"))
      .map(n => n.stripPrefix("v").stripSuffix(".json").toInt)
    require(vs.nonEmpty, s"no manifest in $table/_log")
    vs.max
  }

  def readSnapshot(table: String, version: Int): Snapshot =
    parse(new String(Files.readAllBytes(manifestFile(table, version).toPath),
      StandardCharsets.UTF_8))

  // --- data-file write + stats ---

  /** Write `df` as `buckets` range-partitioned files on `keyCol` and
    * return their manifest entries. Range partitioning gives each
    * file a tight, near-disjoint key range — what makes min/max
    * pruning effective (a hash layout would give every file the full
    * key span and prune nothing). Stats come from ONE distributed
    * pass grouped by output file, not driver iteration.
    */
  def writeFiles(spark: SparkSession, table: String, df: DataFrame,
                 keyCol: String, buckets: Int): Seq[FileEntry] = {
    val dd = dataDir(table); dd.mkdirs()
    val tmp = new File(table, s"_stage-${java.util.UUID.randomUUID.toString.take(8)}")
    df.repartitionByRange(buckets, col(keyCol))
      .write.mode("overwrite").parquet(tmp.getAbsolutePath)
    val moved = tmp.listFiles().filter(_.getName.endsWith(".parquet")).map { p =>
      val dst = new File(dd, s"f-${java.util.UUID.randomUUID.toString.take(12)}.parquet")
      Files.move(p.toPath, dst.toPath)
      dst
    }
    tmp.listFiles().foreach(_.delete()); tmp.delete()
    if (moved.isEmpty) Seq.empty
    else {
      val stats = spark.read.parquet(moved.map(_.getAbsolutePath).toIndexedSeq: _*)
        .groupBy(input_file_name().as("f"))
        .agg(count(lit(1)).as("rows"),
          min(col(keyCol)).as("mn"), max(col(keyCol)).as("mx"))
        .collect() // control-plane: one row per written FILE
      stats.map { r =>
        val name = new File(new java.net.URI(r.getString(0)).getPath).getName
        FileEntry(name, r.getLong(1), r.getLong(2), r.getLong(3))
      }.toSeq.sortBy(_.minKey)
    }
  }

  /** Create version 0 from `df`. */
  def create(spark: SparkSession, table: String, df: DataFrame,
             keyCol: String, buckets: Int): Snapshot = {
    val files = writeFiles(spark, table, df, keyCol, buckets)
    val s = Snapshot(0, "create", keyCol, files)
    commit(table, s)
    s
  }

  private def filePaths(table: String, s: Snapshot): Seq[String] =
    s.files.map(f => new File(dataDir(table), f.name).getAbsolutePath)

  /** Snapshot read — latest version unless pinned. */
  def snapshot(spark: SparkSession, table: String,
               version: Option[Int] = None): DataFrame = {
    val s = readSnapshot(table, version.getOrElse(latestVersion(table)))
    if (s.files.isEmpty) {
      // empty snapshot: preserve schema via an empty frame is not
      // reconstructible without a schema source; disallow for now
      throw new IllegalStateException(s"empty snapshot v${s.version} in $table")
    }
    spark.read.parquet(filePaths(table, s): _*)
  }

  /** Range read with MANIFEST-level file skipping: only files whose
    * [minKey,maxKey] intersects [lo,hi] are handed to Spark at all —
    * data skipping before any parquet footer is opened (the stats
    * predicate any lakehouse read plans with). The residual row
    * filter still applies (file ranges are coarse).
    */
  def snapshotRange(spark: SparkSession, table: String, lo: Long, hi: Long,
                    version: Option[Int] = None): DataFrame = {
    val s = readSnapshot(table, version.getOrElse(latestVersion(table)))
    val hit = s.files.filter(f => f.maxKey >= lo && f.minKey <= hi)
    if (hit.isEmpty) throw new IllegalStateException(
      s"range [$lo,$hi] matches no file in $table v${s.version}")
    spark.read.parquet(hit.map(f =>
        new File(dataDir(table), f.name).getAbsolutePath): _*)
      .filter(col(s.keyCol) >= lo && col(s.keyCol) <= hi)
  }

  /** Copy-on-write upsert: delta rows replace same-key rows, new keys
    * append. Only files whose key range contains at least one delta
    * key are rewritten; every other file carries forward BY REFERENCE
    * into the new manifest (zero IO — the property that makes a daily
    * delta affordable on a 100 TB table). Touched-file detection is a
    * broadcast join of the (small) file-range list against the delta
    * keys, collecting only distinct FILE NAMES (control plane).
    */
  def upsert(spark: SparkSession, table: String, delta: DataFrame,
             buckets: Int): Snapshot = {
    val v = latestVersion(table)
    val cur = readSnapshot(table, v)
    val keyCol = cur.keyCol
    val ranges = spark.createDataFrame(cur.files.map(f =>
      (f.name, f.minKey, f.maxKey))).toDF("_file", "_mn", "_mx")
    val touchedNames = delta.select(col(keyCol).cast("long").as("_k"))
      .join(broadcast(ranges),
        col("_k") >= col("_mn") && col("_k") <= col("_mx"))
      .select("_file").distinct().collect().map(_.getString(0)).toSet
    val (touched, untouched) = cur.files.partition(f => touchedNames(f.name))

    // Keys in untouched files cannot collide with delta keys (no range
    // overlap), so the matched set lives entirely in touched files.
    val touchedDf =
      if (touched.isEmpty) None
      else Some(spark.read.parquet(touched.map(f =>
        new File(dataDir(table), f.name).getAbsolutePath): _*))
    val existingKeys = touchedDf.map(_.select(col(keyCol)).distinct())
    val survivors = touchedDf.map(_.join(delta, Seq(keyCol), "left_anti"))
    val replaced = existingKeys.map(k =>
      delta.join(k, Seq(keyCol), "left_semi"))
    val inserts = existingKeys match {
      case Some(k) => delta.join(k, Seq(keyCol), "left_anti")
      case None => delta
    }
    val rewritten = (survivors.toSeq ++ replaced.toSeq ++ Seq(inserts))
      .reduce(_ unionByName _)
    val newFiles = writeFiles(spark, table, rewritten, keyCol, buckets)
    val s = Snapshot(v + 1, "upsert", keyCol, (untouched ++ newFiles).sortBy(_.minKey))
    commit(table, s)
    s
  }

  /** Compaction as a COMMIT: rewrite the current snapshot's files
    * into `buckets` right-sized ones and commit the new layout as the
    * next version. Old versions keep reading their own (immutable)
    * files — time travel survives maintenance; storage is reclaimed
    * separately by [[vacuum]] once old versions age out. This is the
    * small-files repair the compaction sink does for raw dirs, lifted
    * into the transaction log.
    */
  def compact(spark: SparkSession, table: String, buckets: Int): Snapshot = {
    val v = latestVersion(table)
    val cur = readSnapshot(table, v)
    val all = spark.read.parquet(filePaths(table, cur): _*)
    val newFiles = writeFiles(spark, table, all, cur.keyCol, buckets)
    val s = Snapshot(v + 1, "compact", cur.keyCol, newFiles)
    commit(table, s)
    s
  }

  /** Retention: delete data files referenced ONLY by versions older
    * than `keepVersions` (and their manifests). The kept window keeps
    * time-traveling; anything outside it stops being readable — the
    * Delta VACUUM contract, driven purely off the manifests (never a
    * directory-diff race with an in-flight writer's staged files:
    * only files that were once LISTED and are no longer referenced
    * are touched).
    */
  def vacuum(table: String, keepVersions: Int): Seq[String] = {
    require(keepVersions >= 1, "must keep at least the latest version")
    val latest = latestVersion(table)
    val cutoff = latest - keepVersions + 1
    if (cutoff <= 0) return Seq.empty
    val versions = (0 to latest).filter(v => manifestFile(table, v).exists())
    val live = versions.filter(_ >= cutoff)
      .flatMap(v => readSnapshot(table, v).files.map(_.name)).toSet
    val dead = versions.filter(_ < cutoff)
      .flatMap(v => readSnapshot(table, v).files.map(_.name))
      .distinct.filterNot(live)
    dead.foreach(n => Files.deleteIfExists(new File(dataDir(table), n).toPath))
    versions.filter(_ < cutoff)
      .foreach(v => Files.deleteIfExists(manifestFile(table, v).toPath))
    dead
  }

  /** Copy-on-write range delete. Files FULLY inside [lo,hi] are
    * dropped from the manifest without being read (metadata-only
    * delete); files partially overlapping are rewritten without the
    * doomed rows; disjoint files carry forward by reference.
    */
  def deleteRange(spark: SparkSession, table: String, lo: Long, hi: Long): Snapshot = {
    val v = latestVersion(table)
    val cur = readSnapshot(table, v)
    val keyCol = cur.keyCol
    val dropped = cur.files.filter(f => f.minKey >= lo && f.maxKey <= hi)
    val partial = cur.files.filter(f =>
      f.maxKey >= lo && f.minKey <= hi && !(f.minKey >= lo && f.maxKey <= hi))
    val untouched = cur.files.filter(f => f.maxKey < lo || f.minKey > hi)
    val newFiles =
      if (partial.isEmpty) Seq.empty
      else {
        val keep = spark.read.parquet(partial.map(f =>
            new File(dataDir(table), f.name).getAbsolutePath): _*)
          .filter(col(keyCol) < lo || col(keyCol) > hi)
        writeFiles(spark, table, keep, keyCol, math.max(1, partial.size))
      }
    val s = Snapshot(v + 1, "delete", keyCol, (untouched ++ newFiles).sortBy(_.minKey))
    commit(table, s)
    s
  }
}
