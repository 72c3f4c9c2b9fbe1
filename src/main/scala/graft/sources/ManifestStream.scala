package graft.sources

import java.io.File

import org.apache.spark.internal.Logging
import org.apache.spark.sql.connector.read.streaming.{ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow, Offset => OffsetV2}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.SqlInternals
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}

/** Streaming READ side of the transaction-log table (round 17) — the
  * complement of `ManifestTable.appendBatch`: a Structured Streaming
  * source that TAILS the manifest log, version by version, the way
  * Delta Lake's streaming source tails its commit log (public Delta
  * docs: "Delta table as a source", `readChangeFeed`,
  * `skipChangeCommits`, `startingVersion` — same option names, same
  * semantics, independent implementation).
  *
  * Offsets ARE manifest versions (a `LongOffset` of the last
  * processed version), so exactly-once replay is a property of the
  * log: manifests are immutable once committed, so
  * `getBatch(v1, v2]` re-reads byte-identical data on recovery, and
  * the checkpointed offset is meaningful across restarts.
  *
  * Two modes:
  *  - default (append tail): each batch reads ONLY the data files a
  *    version ADDED (`create`/`append` commits — name-set diff vs the
  *    parent manifest, zero data IO to decide). `compact`/`evolve`
  *    commits rewrite or relist EXISTING rows (dataChange = false in
  *    Delta terms) and are skipped silently. `upsert`/`delete`
  *    commits CHANGE rows a pure append tail cannot represent — the
  *    stream fails loudly (Delta's documented behavior) unless
  *    `skipChangeCommits=true`.
  *  - `readChangeFeed=true` (CDC tail): each batch is
  *    `ManifestTable.snapshotDiff(v-1, v)` — per-key insert/update/
  *    delete rows with `_change_type`, plus `_commit_version` — so an
  *    incremental consumer (the `dedup_incremental`/`ann_incremental`
  *    daily-delta shape) can tail upserts too. The initial `create`
  *    version replays as pure inserts.
  *
  * Scale: per micro-batch the driver parses O(versions-in-batch)
  * manifest files and plans a read over ONLY the added/changed data
  * files — never a log scan, never a table scan. Admission control
  * via `maxVersionsPerTrigger` bounds a batch the same way the
  * ledger source's `maxRecordsPerTrigger` does; one backlogged
  * restart does not plan a million-file read. The planned batch is a
  * plain parquet scan (pushdown/pruning intact) wrapped as a
  * streaming micro-batch via the one `private[sql]` construction the
  * v1 API requires (see [[org.apache.spark.sql.graftshim.SqlInternals]]).
  *
  * Reference shape: FRidh/xarray_scipy has no table format; this
  * extends the pipeline surface the way its users consume growing
  * corpora incrementally (SURVEY §2.2 rows 30ak/30au).
  */
class ManifestStreamProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-manifest-stream"

  private def tablePath(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "manifest stream needs a table path: .load(<table dir>)"))

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): (String, StructType) = {
    require(schema.isEmpty,
      "manifest stream derives its schema from the table's logged schema; " +
      "a user-supplied schema would silently drift from the log — drop .schema(...)")
    (shortName(), ManifestStream.sourceSchema(tablePath(parameters), parameters))
  }

  override def createSource(sqlContext: SQLContext,
                            metadataPath: String,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): Source =
    new ManifestStreamSource(sqlContext.sparkSession, tablePath(parameters), parameters)
}

object ManifestStream {
  val ChangeTypeCol = "_change_type"
  val CommitVersionCol = "_commit_version"

  private[sources] def cdcMode(parameters: Map[String, String]): Boolean =
    parameters.getOrElse("readChangeFeed", "false").toBoolean

  /** Logged schema of the table (loud on pre-schema manifests — a
    * stream cannot guess columns), plus the CDC columns in
    * change-feed mode.
    */
  def sourceSchema(table: String, parameters: Map[String, String]): StructType =
    sourceSchemaOf(table,
      ManifestTable.readSnapshot(table, ManifestTable.latestVersion(table)),
      parameters)

  /** Schema derived from ONE given snapshot — so a caller holding a
    * snapshot can pair schema and colMap from the same version
    * (ADVICE r18: resolving them with two independent reads let a
    * rename land in the window and pair a stale logical schema with a
    * newer map).
    */
  private[sources] def sourceSchemaOf(table: String,
                                      snap: ManifestTable.Snapshot,
                                      parameters: Map[String, String]): StructType = {
    val base = ManifestTable.schemaOf(snap).getOrElse(throw new IllegalStateException(
      s"manifest stream over $table: v${snap.version} logs no schema (pre-schema manifest)"))
    if (cdcMode(parameters))
      StructType(base.fields.toSeq :+
        StructField(ChangeTypeCol, StringType, nullable = false) :+
        StructField(CommitVersionCol, IntegerType, nullable = false))
    else base
  }
}

/** v1 Source + the v2 admission-control interfaces — the public Delta
  * DeltaSource pattern: implementing [[SupportsAdmissionControl]]
  * routes offset resolution through `latestOffset(start, limit)` (the
  * same admission logic `getOffset` used), and
  * [[SupportsTriggerAvailableNow]] (VERDICT r19 #2) makes
  * `Trigger.AvailableNow` a real multi-batch drain — the engine calls
  * [[prepareForTriggerAvailableNow]] once at query start, this source
  * snapshots the then-latest version, and every subsequent batch
  * admits versions under the pacing caps until that snapshot is
  * reached — instead of WARN-falling back to one unbounded
  * single-batch execution that ignores `maxFilesPerTrigger` entirely.
  */
class ManifestStreamSource(spark: SparkSession, table: String,
                           parameters: Map[String, String])
    extends Source with SupportsAdmissionControl
    with SupportsTriggerAvailableNow with Logging {

  private val cdc = ManifestStream.cdcMode(parameters)
  private val skipChangeCommits =
    parameters.getOrElse("skipChangeCommits", "false").toBoolean
  /** `startingTimestamp` (round 18 — Delta's same-named option, on
    * top of the in-commit timestamps): epoch millis; the tail begins
    * at the FIRST version committed at or after it (Delta's
    * documented inclusive semantics). Resolution is a binary search
    * over the O(1)-byte ts headers. Loud when the timestamp is newer
    * than the last commit (nothing to read — Delta errors there too),
    * or when it falls before a vacuumed history's oldest retained
    * version (the true answer aged out — never a silent wrong start).
    * Mutually exclusive with `startingVersion`.
    */
  private val startingVersion: Int =
    parameters.get("startingTimestamp").map(_.toLong) match {
      case Some(t) =>
        require(!parameters.contains("startingVersion"),
          "startingVersion and startingTimestamp are mutually exclusive")
        val latest = ManifestTable.latestVersion(table)
        require(ManifestTable.readTsFast(table, latest) >= t,
          s"startingTimestamp $t is after the last commit of $table " +
          s"(v$latest) — nothing to stream")
        val oldest = ManifestTable.oldestVersion(table)
        if (ManifestTable.readTsFast(table, oldest) >= t) {
          require(oldest == 0,
            s"startingTimestamp $t predates the oldest retained version " +
            s"v$oldest of $table (earlier history vacuumed) — the true " +
            "starting version is unknowable")
          0
        } else {
          var lo = oldest; var hi = latest
          while (lo < hi) { // first version with ts >= t
            val mid = lo + (hi - lo) / 2
            if (ManifestTable.readTsFast(table, mid) >= t) hi = mid
            else lo = mid + 1
          }
          lo
        }
      case None => parameters.getOrElse("startingVersion", "0").toInt
    }
  require(startingVersion >= 0, s"startingVersion must be >= 0, got $startingVersion")
  private val maxVersionsPerTrigger =
    parameters.get("maxVersionsPerTrigger").map(_.toInt)
  maxVersionsPerTrigger.foreach(m =>
    require(m >= 1, s"maxVersionsPerTrigger must be >= 1, got $m"))
  /** `maxFilesPerTrigger` / `maxBytesPerTrigger` (round 19 — Delta's
    * same-named options): admission by DATA volume, not version
    * count — a backlogged restart over a log whose commits vary from
    * one file to thousands gets right-sized batches either way.
    * Offsets stay version-granular (whole commits only, the unit of
    * exactly-once replay), so the caps admit versions until the NEXT
    * one would cross the limit — always at least one (Delta's
    * at-least-one-file rule: a giant commit still flows, it just
    * flows alone). Composes with `maxVersionsPerTrigger`: the
    * tightest cap wins.
    */
  private val maxFilesPerTrigger =
    parameters.get("maxFilesPerTrigger").map(_.toInt)
  maxFilesPerTrigger.foreach(m =>
    require(m >= 1, s"maxFilesPerTrigger must be >= 1, got $m"))
  private val maxBytesPerTrigger =
    parameters.get("maxBytesPerTrigger").map(_.toLong)
  maxBytesPerTrigger.foreach(m =>
    require(m >= 1, s"maxBytesPerTrigger must be >= 1, got $m"))

  /** ONE snapshot read at tail start: schema and colMap MUST be
    * era-consistent (ADVICE r18 — two independent latest-version
    * reads let a rename commit land in between; a swap-rename
    * sequence would then present columns transposed under the old
    * names).
    */
  private val startSnap: ManifestTable.Snapshot =
    ManifestTable.readSnapshot(table, ManifestTable.latestVersion(table))

  override val schema: StructType =
    ManifestStream.sourceSchemaOf(table, startSnap, parameters)

  /** Column mapping captured at tail start (round 18): data files
    * store PHYSICAL names, which never change — so a RENAME COLUMN
    * mid-tail is invisible (this tail keeps presenting its start-time
    * logical names) and files appended after the rename still read
    * correctly under the start-time map.
    */
  private val colMap: Map[String, String] = startSnap.colMap

  // last version handed out by getBatch (inclusive); getOffset never
  // retreats below it, so a stale admission cap after recovery cannot
  // rewind the stream
  @volatile private var lastEnd: Long = startingVersion - 1L

  private def ver(o: V1Offset): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => LongOffset(s).offset
    case other => other.json.trim.toLong
  }

  /** (added-file count, added bytes) of one version: an O(changes)
    * action parse, MEMOIZED — versions are immutable, so a long
    * backlog is costed once, not per getOffset poll. Bytes come from
    * the logged `bytes` field (Delta's add.size — VERDICT r19 #3);
    * a filesystem stat happens ONLY for legacy entries written before
    * the field existed, so a new-format million-file backlog restart
    * costs zero storage round-trips.
    */
  private val costCache = scala.collection.mutable.HashMap.empty[Int, (Long, Long)]
  private def versionCost(v: Int): (Long, Long) = costCache.synchronized {
    costCache.getOrElseUpdate(v, {
      val act = ManifestTable.readAction(table, v)
      val added = act.map(_.add).getOrElse {
        val snap = ManifestTable.readSnapshot(table, v)
        val prev = if (v == 0) Set.empty[String]
          else ManifestTable.readSnapshot(table, v - 1).files.map(_.name).toSet
        snap.files.filterNot(f => prev(f.name))
      }
      (added.size.toLong,
        added.map(f =>
          if (f.bytes >= 0) f.bytes
          else ManifestTable.dataFile(table, f.name).length()).sum)
    })
  }

  /** AvailableNow drain target: the latest version at query start,
    * snapshotted by [[prepareForTriggerAvailableNow]] — later commits
    * belong to the next run, exactly Delta's documented semantics.
    */
  @volatile private var availableNowCap: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit = {
    val cap = ManifestTable.latestVersion(table).toLong
    availableNowCap = Some(cap)
    logInfo(s"manifest stream over $table: Trigger.AvailableNow will " +
      s"drain through v$cap under the configured pacing caps")
  }

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def initialOffset(): OffsetV2 = LongOffset(startingVersion - 1L)

  override def deserializeOffset(json: String): OffsetV2 =
    LongOffset(json.trim.toLong)

  override def reportLatestOffset(): OffsetV2 =
    LongOffset(ManifestTable.latestVersion(table).toLong)

  /** Shared admission: newest version this trigger may end at, given
    * the floor (last handed-out version) and every active cap.
    */
  private def admitEnd(floor: Long): Long = {
    val latest0 = ManifestTable.latestVersion(table).toLong
    val latest = availableNowCap.fold(latest0)(math.min(latest0, _))
    val vCap = maxVersionsPerTrigger match {
      case Some(m) => math.min(latest, floor + m)
      case None => latest
    }
    val end =
      if (maxFilesPerTrigger.isEmpty && maxBytesPerTrigger.isEmpty) vCap
      else {
        // admit whole versions until a cap would be crossed; the
        // FIRST version is admitted unconditionally (at-least-one)
        var v = floor; var nf = 0L; var nb = 0L; var full = false
        while (!full && v < vCap) {
          val (f, b) = versionCost((v + 1).toInt)
          val over = maxFilesPerTrigger.exists(m => nf + f > m) ||
            maxBytesPerTrigger.exists(m => nb + b > m)
          if (over && v > floor) full = true
          else { v += 1; nf += f; nb += b; if (over) full = true }
        }
        v
      }
    math.max(end, floor)
  }

  override def getOffset: Option[V1Offset] = {
    val end2 = admitEnd(math.max(lastEnd, startingVersion - 1L))
    if (end2 < startingVersion) None else Some(LongOffset(end2))
  }

  /** v2 admission-control entry (takes precedence over [[getOffset]]
    * once [[SupportsAdmissionControl]] is implemented): same logic,
    * with the engine-supplied start offset folded into the floor. The
    * configured per-trigger caps ARE the read limit, so the passed
    * `limit` (always allAvailable here) is intentionally unused.
    */
  override def latestOffset(startOffset: OffsetV2, limit: ReadLimit): OffsetV2 = {
    val start = Option(startOffset).map {
      case l: LongOffset => l.offset
      case s: SerializedOffset => LongOffset(s).offset
      case other => other.json.trim.toLong
    }.getOrElse(startingVersion - 1L)
    val end2 = admitEnd(math.max(math.max(lastEnd, start), startingVersion - 1L))
    if (end2 < startingVersion) null else LongOffset(end2)
  }

  /** Versions (vFrom, vTo] as one micro-batch. Deterministic on
    * replay: manifests and their listed files are immutable (vacuum
    * of a still-tailed version surfaces as the loud missing-file
    * precondition below, not a silent wrong answer).
    */
  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val vTo = ver(end)
    val vFrom = start.map(ver).getOrElse(startingVersion - 1L)
    lastEnd = math.max(lastEnd, vTo)
    val perVersion = ((vFrom + 1) to vTo).flatMap(v => batchForVersion(v.toInt))
    val out = perVersion.reduceOption(_ union _)
    out match {
      case Some(df) =>
        // project to the source schema's exact column order; a
        // mid-stream evolution that widened the table past the
        // stream's analyzed schema fails here loudly (Delta stops the
        // stream on schema change too) instead of mis-binding columns
        SqlInternals.streamingDataFrame(spark,
          SqlInternals.toInternalRdd(df.select(schema.fieldNames.map(col).toIndexedSeq: _*)),
          schema)
      case None =>
        SqlInternals.streamingDataFrame(spark,
          spark.sparkContext.emptyRDD[org.apache.spark.sql.catalyst.InternalRow],
          schema)
    }
  }

  /** The batch contribution of one committed version, or None when
    * the commit carries no change a tail must emit.
    */
  private def batchForVersion(v: Int): Option[DataFrame] = {
    // round 18: the commit's ACTION is the change — op and added
    // files come from one O(changes) parse, so a tail batch never
    // reconstructs the parent snapshot just to name-diff it (legacy
    // full-snapshot manifests keep the diff fallback)
    val act = ManifestTable.readAction(table, v)
    val op = act.map(_.op).getOrElse(ManifestTable.readSnapshot(table, v).op)
    def added: Seq[ManifestTable.FileEntry] = act.map(_.add).getOrElse {
      val snap = ManifestTable.readSnapshot(table, v)
      val prev = if (v == 0) Set.empty[String]
        else ManifestTable.readSnapshot(table, v - 1).files.map(_.name).toSet
      snap.files.filterNot(f => prev(f.name))
    }
    op match {
      case "compact" | "evolve" =>
        // rewrites/relists EXISTING rows — dataChange=false; both tail
        // modes skip (snapshotDiff over a compact would read every
        // rewritten file to fingerprint-prove "no change"; the op
        // string proves it for free)
        None
      case "create" | "clone" if cdc =>
        Some(addedFilesDf(v, added)
          .withColumn(ManifestStream.ChangeTypeCol, lit("insert"))
          .withColumn(ManifestStream.CommitVersionCol, lit(v)))
      case "create" | "clone" | "append" if !cdc =>
        Some(addedFilesDf(v, added))
      case "upsert" | "merge" | "delete" | "restore" if !cdc =>
        // restore belongs here too: it re-LISTS previously-removed
        // files, which an append tail would re-emit as double counts
        if (skipChangeCommits) {
          logInfo(s"manifest stream over $table: skipping $op v$v " +
            "(skipChangeCommits=true)")
          None
        } else throw new IllegalStateException(
          s"manifest stream over $table hit a '$op' commit at v$v: a " +
          "plain append tail cannot represent changed rows. Either tail the " +
          "change feed (.option(\"readChangeFeed\", \"true\")) or skip such " +
          "commits explicitly (.option(\"skipChangeCommits\", \"true\"))")
      case _ if cdc =>
        Some(ManifestTable.snapshotDiff(spark, table, v - 1, v)
          .withColumn(ManifestStream.CommitVersionCol, lit(v)))
      case other =>
        throw new IllegalStateException(
          s"manifest stream over $table: unknown commit op '$other' at v$v")
    }
  }

  /** The files version `v` ADDED, read under the source schema —
    * O(added files) IO. Missing files mean a vacuum raced the tail:
    * fail loudly.
    */
  private def addedFilesDf(v: Int,
                           added: Seq[ManifestTable.FileEntry]): DataFrame = {
    val gone = added.filterNot(f =>
      ManifestTable.dataFile(table, f.name).exists()).map(_.name)
    require(gone.isEmpty,
      s"manifest stream over $table: v$v lists ${gone.size} added " +
      s"file(s) that no longer exist (vacuumed?): ${gone.take(3).mkString(", ")}")
    val paths = added.map(f =>
      ManifestTable.dataFile(table, f.name).getAbsolutePath)
    val base = StructType(schema.fields.filterNot(f =>
      f.name == ManifestStream.ChangeTypeCol || f.name == ManifestStream.CommitVersionCol))
    // scan under PHYSICAL names, present the tail's logical names in
    // one projection (column mapping; a sequential rename would
    // corrupt a swap map)
    val basePhys = StructType(base.fields.map(f =>
      f.copy(name = colMap.getOrElse(f.name, f.name))))
    if (paths.isEmpty)
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), base)
    else {
      val raw = spark.read.schema(basePhys).parquet(paths: _*)
      if (colMap.isEmpty) raw
      else raw.select(base.fields.map(f =>
        org.apache.spark.sql.functions.col(
          colMap.getOrElse(f.name, f.name)).as(f.name)).toIndexedSeq: _*)
    }
  }

  override def stop(): Unit = {}

  override def toString: String = s"ManifestStreamSource[$table, cdc=$cdc]"
}
