package graft.sources

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{ByteType, DataType, DoubleType,
  FloatType, IntegerType, LongType, ShortType, StructField, StructType}

/** MINIMAL snapshot/manifest table format — the lakehouse layer the
  * merge family's bare-parquet rewrites lacked (round-14 VERDICT
  * "what's missing" item 1): ACID snapshots, time-travel reads, and
  * snapshot isolation between a writer and its readers, built from
  * two primitives every distributed filesystem offers (write-new,
  * atomic-rename) — the same discipline Iceberg/Delta implement at
  * industrial scale, reduced to its load-bearing core.
  *
  * Layout under `tableDir`:
  * {{{
  *   data/v<N>/part-*.parquet     one immutable file set per commit
  *   _snaplog/v<N>.manifest       newline list of that snapshot's
  *                                data files, relative to tableDir
  * }}}
  *
  * The THREE invariants, each carried by one mechanism:
  *
  *  - '''atomic visibility''': a commit writes its data files FIRST,
  *    then publishes the manifest with one atomic rename — a reader
  *    either sees no v<N> manifest (snapshot not yet committed) or a
  *    manifest whose every listed file is complete. A crash mid-write
  *    leaves orphan data files and NO manifest: invisible debris,
  *    never a half-snapshot ([[commit]]).
  *  - '''snapshot isolation''': committed data files are IMMUTABLE —
  *    a new commit writes a NEW `data/v<N>` set and never touches
  *    prior files, so a reader that resolved version K keeps reading
  *    K's bytes while any number of later commits land ([[read]]
  *    resolves the file list once, at planning time).
  *  - '''linear history''': versions are dense integers; two racing
  *    writers both targeting v<N> serialize on the manifest rename —
  *    the loser's ATOMIC_MOVE fails (target exists), and it retries
  *    its PUBLISH at v<N+1> re-listing its already-written data files
  *    (first-writer-wins at the log, the optimistic-concurrency core;
  *    content conflicts are the caller's domain, as in every table
  *    format).
  *
  * Scale shape: manifests are O(files) text, never data bytes; a
  * time-travel read costs exactly one manifest read + a parquet scan
  * of the listed files. Old snapshots accumulate until [[vacuum]]
  * drops everything no retained manifest references — the
  * compaction/GC contract, kept separate from commit so readers of
  * retained versions are never raced. */
/** Thrown by [[SnapshotTable.commitIfUnchanged]] when another writer
  * committed between the caller's read and its publish — the
  * optimistic-concurrency conflict every table format surfaces rather
  * than silently clobbering. */
class SnapshotConflictException(msg: String)
  extends java.util.ConcurrentModificationException(msg)

/** Thrown by [[SnapshotTable.append]] when the incoming frame's schema
  * drifts INCOMPATIBLY from the table's committed schema (type change
  * that is not a legal widening). Schema errors must fail at WRITE
  * time — an incompatible file in the manifest would poison every
  * later read. */
class SnapshotSchemaException(msg: String)
  extends IllegalArgumentException(msg)

object SnapshotTable {

  private def logDir(tableDir: String) = new File(tableDir, "_snaplog")

  // ---------------------------------------------------------------
  // Schema evolution (round-16 VERDICT item 3 / leave-behind item c)
  //
  // Every commit records the table's RESOLVED schema as a
  // '#schema:<json>' manifest header, and append() validates incoming
  // frames against it at WRITE time:
  //   - ADD-COLUMN: a new column is accepted; the resolved schema
  //     grows, and files that predate it read as NULL for it;
  //   - MISSING-COLUMN: a frame may omit committed columns; its files
  //     read as NULL for them (the column is NOT dropped);
  //   - WIDEN: byte→short→int→long among integrals, float→double, and
  //     byte/short/int→double — the promotions Spark 4's parquet
  //     reader evaluates losslessly from narrower file columns under
  //     a wider read schema (probed; long→double is lossy and
  //     REJECTED);
  //   - anything else (type change, narrowing, nested-type drift)
  //     throws SnapshotSchemaException BEFORE any file is written —
  //     an incompatible file in the manifest would poison every later
  //     read.
  // read() scans with the manifest's recorded schema (one explicit
  // spark.read.schema — no footer sampling, no mergeSchema job), so
  // what a mixed-history union reads is a CONTRACT, not whatever the
  // parquet reader makes of mixed footers. Copy-on-write commit()
  // REDEFINES the schema outright (the frame is the new table state —
  // dropping or retyping a column is a rewrite, by design).
  // ---------------------------------------------------------------

  private val schemaPrefix = "#schema:"

  /** All fields nullable: evolved reads null-fill files that predate
    * a column, so nothing in the resolved schema may claim NOT NULL. */
  private def asNullable(s: StructType): StructType =
    StructType(s.fields.map(f =>
      StructField(f.name, f.dataType, nullable = true, f.metadata)))

  /** Legal widening of two atomic types, or None. Only promotions the
    * parquet reader evaluates exactly from the narrower file bytes. */
  private val intOrder: Seq[DataType] =
    Seq(ByteType, ShortType, IntegerType, LongType)
  private def widen(a: DataType, b: DataType): Option[DataType] =
    if (a == b) Some(a)
    else {
      val (x, y) = (intOrder.indexOf(a), intOrder.indexOf(b))
      if (x >= 0 && y >= 0) Some(intOrder(math.max(x, y)))
      else (a, b) match {
        case (FloatType, DoubleType) | (DoubleType, FloatType) =>
          Some(DoubleType)
        case (t, DoubleType)
          if t == ByteType || t == ShortType || t == IntegerType =>
          Some(DoubleType)
        case (DoubleType, t)
          if t == ByteType || t == ShortType || t == IntegerType =>
          Some(DoubleType)
        case _ => None
      }
    }

  /** Resolve `incoming` against the committed `table` schema:
    * committed columns keep their (possibly widened) types, new
    * columns append in incoming order. Throws on illegal drift. */
  private[sources] def mergeSchemas(table: StructType,
      incoming: StructType, context: String): StructType = {
    val byName = incoming.fields.map(f => f.name -> f).toMap
    val existing = table.fields.map { f =>
      byName.get(f.name) match {
        case None => StructField(f.name, f.dataType, nullable = true)
        case Some(g) =>
          val t = widen(f.dataType, g.dataType).getOrElse(
            throw new SnapshotSchemaException(
              s"$context: column '${f.name}' arrives as " +
                s"${g.dataType.simpleString} which is not a legal " +
                s"widening of the committed " +
                s"${f.dataType.simpleString} — rewrite via commit() " +
                s"to change a column's type"))
          StructField(f.name, t, nullable = true)
      }
    }
    val added = incoming.fields
      .filterNot(f => table.fieldNames.contains(f.name))
      .map(f => StructField(f.name, f.dataType, nullable = true))
    StructType(existing ++ added)
  }

  private def schemaLineOf(tableDir: String, v: Int): Option[String] =
    Files.readAllLines(manifest(tableDir, v).toPath).asScala
      .find(_.startsWith(schemaPrefix))

  /** The committed snapshot's resolved schema: the '#schema:' header
    * when present; for manifests that predate the header (legacy
    * tables), the widened merge of the listed files' footers —
    * O(files) driver-side reads, paid once per legacy read (every new
    * commit records the header). */
  def tableSchema(spark: SparkSession, tableDir: String,
      version: Int = -1): StructType = {
    val v = if (version > 0) version else latestVersion(tableDir)
    require(manifest(tableDir, v).exists(),
      s"snapshot v$v does not exist at $tableDir")
    schemaLineOf(tableDir, v)
      .map(l => DataType.fromJson(l.stripPrefix(schemaPrefix))
        .asInstanceOf[StructType])
      .getOrElse {
        manifestFiles(tableDir, v)
          .map(rel => spark.read.parquet(s"$tableDir/$rel").schema)
          .reduceLeft((a, b) => mergeSchemas(a, b, s"read v$v"))
      }
  }

  private def manifest(tableDir: String, v: Int): File =
    new File(logDir(tableDir), s"v$v.manifest")

  /** Committed versions, ascending (only published manifests count). */
  def versions(tableDir: String): Seq[Int] = {
    val fs = logDir(tableDir).listFiles()
    if (fs == null) Seq.empty
    else fs.toSeq.map(_.getName)
      .collect { case s if s.matches("v\\d+\\.manifest") =>
        s.stripPrefix("v").stripSuffix(".manifest").toInt }
      .sorted
  }

  /** Latest committed version, or 0 when the table is empty. */
  def latestVersion(tableDir: String): Int =
    versions(tableDir).lastOption.getOrElse(0)

  /** Commit `df` as the table's next snapshot (copy-on-write: the
    * frame IS the new table state). Returns the committed version.
    * The data files are written under a version-proposed directory;
    * if the manifest rename loses a race, the publish retries at the
    * next version, re-pointing the SAME data files — no rewrite.
    * Exactly-once batch markers of the base version carry forward
    * (re-derived per retry), so a CoW rewrite or [[compact]] never
    * forgets which batches already landed. */
  def commit(df: DataFrame, tableDir: String): Int = {
    val proposed = latestVersion(tableDir) + 1
    // unique data dir per attempt: two racing writers must never
    // interleave files in one directory
    val dataSub = s"data/v${proposed}_${ProcessHandle.current().pid()}" +
      s"_${System.nanoTime()}"
    df.write.parquet(s"$tableDir/$dataSub")
    val files = new File(tableDir, dataSub).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && f.isFile)
      .map(f => s"$dataSub/${f.getName}").sorted.toSeq
    Files.createDirectories(logDir(tableDir).toPath)
    // CoW: the frame IS the new table state — its schema REDEFINES the
    // table's (dropping/retyping columns is a rewrite, by design)
    val schemaLine = schemaPrefix + asNullable(df.schema).json
    var committed = -1
    while (committed < 0) {
      val base = latestVersion(tableDir)
      val markers =
        if (base > 0) manifestMarkers(tableDir, base) else Seq.empty
      val tmp = new File(logDir(tableDir), s".tmp-" +
        s"${ProcessHandle.current().pid()}-${System.nanoTime()}")
      Files.write(tmp.toPath,
        (schemaLine +: (markers ++ files)).mkString("\n").getBytes("UTF-8"))
      try {
        Files.createLink(manifest(tableDir, base + 1).toPath, tmp.toPath)
        committed = base + 1
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => () // re-derive
      } finally Files.deleteIfExists(tmp.toPath)
    }
    committed
  }

  /** Copy-on-write commit WITH optimistic content-conflict detection —
    * the check Iceberg/Delta make that plain [[commit]] (by documented
    * design) does not: the caller states the version its new state was
    * DERIVED FROM, and if any other writer has committed since, the
    * publish FAILS with [[SnapshotConflictException]] instead of
    * silently last-writer-winning over content it never saw. The check
    * is the atomic link itself — we link at exactly
    * `expectedVersion + 1` and never retry at a later slot, so there
    * is no TOCTOU window between "check latest" and "publish".
    * Orphaned data files of a failed attempt are invisible (no
    * manifest) and get swept by the next [[vacuum]]. */
  def commitIfUnchanged(df: DataFrame, tableDir: String,
      expectedVersion: Int): Int = {
    if (latestVersion(tableDir) != expectedVersion)
      throw new SnapshotConflictException(
        s"stale base: expected v$expectedVersion, table is at " +
          s"v${latestVersion(tableDir)} — re-read and re-derive")
    val dataSub = s"data/v${expectedVersion + 1}_" +
      s"${ProcessHandle.current().pid()}_${System.nanoTime()}"
    df.write.parquet(s"$tableDir/$dataSub")
    val files = new File(tableDir, dataSub).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && f.isFile)
      .map(f => s"$dataSub/${f.getName}").sorted.toSeq
    val markers = if (expectedVersion > 0)
      manifestMarkers(tableDir, expectedVersion) else Seq.empty
    Files.createDirectories(logDir(tableDir).toPath)
    val schemaLine = schemaPrefix + asNullable(df.schema).json
    val tmp = new File(logDir(tableDir), s".tmp-" +
      s"${ProcessHandle.current().pid()}-${System.nanoTime()}")
    Files.write(tmp.toPath,
      (schemaLine +: (markers ++ files)).mkString("\n").getBytes("UTF-8"))
    try {
      Files.createLink(
        manifest(tableDir, expectedVersion + 1).toPath, tmp.toPath)
      expectedVersion + 1
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new SnapshotConflictException(
          s"concurrent commit: expected to publish " +
            s"v${expectedVersion + 1} at $tableDir but another writer " +
            s"got there first (table now at v${latestVersion(tableDir)})")
    } finally Files.deleteIfExists(tmp.toPath)
  }

  /** Publish a manifest listing `files` at the first free version ≥
    * `startV` — the optimistic-concurrency core, exposed for the
    * collision spec. The commit point is a HARD LINK from the fully
    * written temp file to the versioned name: link creation is atomic
    * and FAILS if the target exists — unlike rename, which POSIX
    * defines to silently REPLACE an existing target (the collision
    * spec caught exactly that: a losing writer would have clobbered
    * the winner's manifest and rewritten history). A loser retries at
    * the next slot with its data files untouched; readers only ever
    * see complete manifests (the link springs into existence with the
    * temp file's full content). */
  private[sources] def publishManifest(tableDir: String,
      files: Seq[String], startV: Int): Int = {
    Files.createDirectories(logDir(tableDir).toPath)
    val tmp = new File(logDir(tableDir), s".tmp-" +
      s"${ProcessHandle.current().pid()}-${System.nanoTime()}")
    Files.write(tmp.toPath, files.mkString("\n").getBytes("UTF-8"))
    var v = startV
    var published = false
    while (!published) {
      try {
        Files.createLink(manifest(tableDir, v).toPath, tmp.toPath)
        published = true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          // lost the race for v: another commit claimed the slot
          // first. Our data files are untouched; retry the log entry
          // at the next free version.
          v += 1
      }
    }
    Files.deleteIfExists(tmp.toPath)
    v
  }

  /** The data-file lines of one manifest ('#'-prefixed metadata
    * headers — e.g. the exactly-once batch marker — and '-'-prefixed
    * delete-file lines excluded). */
  private def manifestFiles(tableDir: String, v: Int): Seq[String] =
    Files.readAllLines(manifest(tableDir, v).toPath).asScala
      .filter(l => l.nonEmpty && !l.startsWith("#") &&
        !l.startsWith("-")).toSeq

  /** The delete-file lines of one manifest (prefix stripped). */
  private def manifestDeleteFiles(tableDir: String,
      v: Int): Seq[String] =
    Files.readAllLines(manifest(tableDir, v).toPath).asScala
      .filter(_.startsWith("-")).map(_.stripPrefix("-")).toSeq

  /** Every non-header line of one manifest, delete prefixes intact —
    * what an [[append]] or [[delete]] must carry forward verbatim. */
  private def manifestCarryLines(tableDir: String,
      v: Int): Seq[String] =
    Files.readAllLines(manifest(tableDir, v).toPath).asScala
      .filter(l => l.nonEmpty && !l.startsWith("#")).toSeq

  /** The metadata-header lines ('#'-prefixed, e.g. exactly-once batch
    * markers) of one manifest. Markers CARRY FORWARD through every
    * later commit (append, delete, CoW rewrite, compaction), so the
    * LATEST manifest always holds the complete marker set — that is
    * what keeps [[appendOnce]] exactly-once after a [[vacuum]] has
    * deleted the manifest that introduced a marker (the round-15
    * durability edge: markers that lived only in their birth manifest
    * silently died with it). O(batches) text lines per manifest — the
    * same order as Delta's per-source txn versions. */
  private def manifestMarkers(tableDir: String, v: Int): Seq[String] =
    Files.readAllLines(manifest(tableDir, v).toPath).asScala
      .filter(l => l.startsWith("#") && !l.startsWith(schemaPrefix))
      .toSeq

  /** MERGE-ON-READ row-level DELETE: `keys` (a single-column frame
    * whose column names the delete key) is written as a DELETE FILE
    * and the new snapshot's manifest lists it with a '-' prefix —
    * the base data files are NEVER rewritten (contrast
    * merge_delete_apply's copy-on-write). [[read]] applies the listed
    * delete files at scan time — one anti-join per distinct key
    * column, each file joining on its own key; [[compact]]
    * folds the deletes into a rewritten file set (the MoR→CoW
    * handoff every table format schedules); prior versions still
    * read the undeleted rows (snapshot isolation holds — a delete is
    * just a new manifest). Same optimistic commit loop as [[append]]
    * (re-derives against the new latest on collision), and delete
    * lines carry forward through later appends/deletes verbatim.
    *
    * Scale shape: a delete costs O(delete keys) written bytes —
    * nothing is read, nothing is rewritten; the deferred cost is one
    * anti-join per read until a compaction folds it. */
  def delete(keys: DataFrame, tableDir: String): Int = {
    require(latestVersion(tableDir) > 0,
      s"cannot delete from an empty table (no committed snapshot " +
        s"at $tableDir)")
    val dataSub = s"data/d${ProcessHandle.current().pid()}" +
      s"_${System.nanoTime()}"
    require(keys.columns.length == 1,
      "delete keys must be a single-column frame (the key column)")
    keys.write.parquet(s"$tableDir/$dataSub")
    val delFiles = new File(tableDir, dataSub).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && f.isFile)
      .map(f => s"-$dataSub/${f.getName}").sorted.toSeq
    Files.createDirectories(logDir(tableDir).toPath)
    var committed = -1
    while (committed < 0) {
      val base = latestVersion(tableDir)
      val markers =
        if (base > 0) manifestMarkers(tableDir, base) else Seq.empty
      val prior =
        if (base > 0) manifestCarryLines(tableDir, base) else Seq.empty
      // a delete changes no data schema: carry the base's forward
      val schemaLine = schemaPrefix +
        tableSchema(keys.sparkSession, tableDir, base).json
      val lines = schemaLine +: (markers ++ prior ++ delFiles)
      val tmp = new File(logDir(tableDir), s".tmp-" +
        s"${ProcessHandle.current().pid()}-${System.nanoTime()}")
      Files.write(tmp.toPath, lines.mkString("\n").getBytes("UTF-8"))
      try {
        Files.createLink(manifest(tableDir, base + 1).toPath, tmp.toPath)
        committed = base + 1
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => ()
      } finally Files.deleteIfExists(tmp.toPath)
    }
    committed
  }

  /** APPEND commit: the new snapshot = the latest snapshot's file set
    * plus `df`'s new files — the continuous-ingestion shape, where
    * CoW [[commit]] is the rewrite shape. Unlike commit, an append's
    * CONTENT depends on the base version, so the optimistic retry
    * must RE-DERIVE it: on a manifest collision the loop re-reads the
    * new latest manifest and re-publishes (the table-format commit
    * loop), never blindly re-linking a stale file list — two racing
    * appenders both land, neither loses the other's files.
    *
    * `marker`: optional metadata header (`#`-prefixed in the
    * manifest) — the exactly-once hook: [[appendOnce]] passes the
    * micro-batch id, and a replayed batch is detected by its marker
    * IN the atomically-published manifest itself, so there is no
    * commit-then-mark window where a crash double-appends. */
  def append(df: DataFrame, tableDir: String,
      marker: Option[String] = None): Int = {
    // fail-fast schema gate BEFORE any bytes are written: illegal
    // drift must never reach the manifest (the resolved schema is
    // re-derived inside the commit loop in case the base moves)
    if (latestVersion(tableDir) > 0)
      mergeSchemas(tableSchema(df.sparkSession, tableDir), df.schema,
        s"append at $tableDir")
    val dataSub = s"data/a${ProcessHandle.current().pid()}" +
      s"_${System.nanoTime()}"
    df.write.parquet(s"$tableDir/$dataSub")
    val newFiles = new File(tableDir, dataSub).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && f.isFile)
      .map(f => s"$dataSub/${f.getName}").sorted.toSeq
    Files.createDirectories(logDir(tableDir).toPath)
    var committed = -1
    while (committed < 0) {
      val base = latestVersion(tableDir)
      val resolved =
        if (base > 0)
          mergeSchemas(tableSchema(df.sparkSession, tableDir, base),
            df.schema, s"append at $tableDir")
        else asNullable(df.schema)
      val priorMarkers =
        if (base > 0) manifestMarkers(tableDir, base) else Seq.empty
      val prior =
        if (base > 0) manifestCarryLines(tableDir, base) else Seq.empty
      val lines = (schemaPrefix + resolved.json) +:
        ((marker.map(m => s"#$m").toSeq ++ priorMarkers)
          .distinct ++ prior ++ newFiles)
      val tmp = new File(logDir(tableDir), s".tmp-" +
        s"${ProcessHandle.current().pid()}-${System.nanoTime()}")
      Files.write(tmp.toPath, lines.mkString("\n").getBytes("UTF-8"))
      try {
        Files.createLink(manifest(tableDir, base + 1).toPath, tmp.toPath)
        committed = base + 1
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => () // re-derive
      } finally Files.deleteIfExists(tmp.toPath)
    }
    committed
  }

  /** Exactly-once append for replayable sources: `append` keyed by a
    * batch id — a batch whose marker already sits in a published
    * manifest is skipped (returns that version), so an at-least-once
    * replay (restarted stream, stale checkpoint) commits each batch's
    * rows exactly once. The marker rides INSIDE the atomically-linked
    * manifest, so commit and mark are one filesystem operation — no
    * crash window between them; and markers CARRY FORWARD through
    * every later commit/append/delete/compact, so the guarantee
    * survives a [[vacuum]] that deleted the marker's birth manifest
    * (a stale checkpoint replaying across a vacuum still finds the
    * marker in every retained manifest). */
  def appendOnce(df: DataFrame, tableDir: String, batchId: Long): Int = {
    val m = s"#batch:$batchId"
    versions(tableDir).find { v =>
      Files.readAllLines(manifest(tableDir, v).toPath).asScala
        .takeWhile(_.startsWith("#")).contains(m)
    }.getOrElse(append(df, tableDir, Some(s"batch:$batchId")))
  }

  /** Read snapshot `version` (≤ 0 ⇒ latest). The manifest's file list
    * is resolved HERE, once — later commits cannot change what this
    * frame scans, and committed files are immutable, so the read is
    * a consistent snapshot no matter how long the caller holds it.
    * The scan uses the manifest's RECORDED schema (see the schema-
    * evolution block above): files that predate an added column read
    * NULL for it, narrower files widen to the resolved type, and no
    * footer sampling runs at planning time. */
  def read(spark: SparkSession, tableDir: String,
      version: Int = -1): DataFrame = {
    val v = if (version > 0) version else latestVersion(tableDir)
    require(manifest(tableDir, v).exists(),
      s"snapshot v$v does not exist at $tableDir " +
        s"(committed: ${versions(tableDir).mkString(",")})")
    val files = manifestFiles(tableDir, v).map(rel => s"$tableDir/$rel")
    val base = spark.read.schema(tableSchema(spark, tableDir, v))
      .parquet(files: _*)
    applyDeletes(spark, base,
      manifestDeleteFiles(tableDir, v).map(rel => s"$tableDir/$rel"))
  }

  /** Merge-on-read delete application: ONE anti-join per distinct
    * delete-key COLUMN, never one mixed-schema union — two delete
    * commits keyed on different columns (say `o_orderkey` then
    * `o_custkey`) each anti-join on their own key; a single-frame
    * union would null the second file's column under the first's
    * schema and silently resurrect its rows (the round-15 advisory's
    * medium finding). Grouping is by the files' parquet schema, read
    * driver-side from the footers (no job); files sharing a key
    * column coalesce into one distinct + one anti-join, so the read
    * pays O(distinct key columns) joins, not O(delete commits). */
  private def applyDeletes(spark: SparkSession, base: DataFrame,
      delPaths: Seq[String]): DataFrame =
    if (delPaths.isEmpty) base
    else delPaths
      .groupBy(p => spark.read.parquet(p).schema.fieldNames.head)
      .toSeq.sortBy(_._1)
      .foldLeft(base) { case (acc, (kc, paths)) =>
        acc.join(
          spark.read.parquet(paths: _*)
            .select(org.apache.spark.sql.functions.col(kc)).distinct(),
          Seq(kc), "left_anti")
      }

  /** CHANGE FEED between two committed versions: the rows of every
    * data file listed by `toV`'s manifest but NOT by `fromV`'s — the
    * manifest-set difference that makes incremental consumption
    * O(appended bytes) instead of O(table): no row-level diff, no
    * scan of the base, just the log. This is row-accurate for
    * APPEND-log history (each append's delta is exactly its new
    * files — the Delta/Iceberg change-data-feed mechanism for
    * append-only tables); across a copy-on-write [[commit]] or
    * [[compact]] the file-set difference is the whole rewritten
    * snapshot, and a row-accurate delta needs the relational diff
    * (the merge_snapshot_diff operator) instead. Returns an empty
    * frame in `toV`'s schema when no files were added (e.g. a
    * replayed [[appendOnce]] batch).
    *
    * Row-level deletes: the feed is INSERT-ONLY — a [[delete]] in
    * `(fromV, toV]` adds no data files and therefore emits no rows
    * for the deletion itself (a retraction feed needs the relational
    * diff); but `toV`'s delete files ARE applied to the appended-file
    * scan, so a row that is invisible in `read(toV)` (its key sits in
    * a carried-forward delete file) is never emitted as a change —
    * the feed is a subset of the snapshot it claims to lead to. */
  def changes(spark: SparkSession, tableDir: String, fromV: Int,
      toV: Int): DataFrame = {
    Seq(fromV, toV).foreach(v => require(manifest(tableDir, v).exists(),
      s"snapshot v$v does not exist at $tableDir " +
        s"(committed: ${versions(tableDir).mkString(",")})"))
    val before = manifestFiles(tableDir, fromV).toSet
    val added = manifestFiles(tableDir, toV).filterNot(before)
    if (added.isEmpty) read(spark, tableDir, toV).limit(0)
    else applyDeletes(spark,
      spark.read.schema(tableSchema(spark, tableDir, toV))
        .parquet(added.map(rel => s"$tableDir/$rel"): _*),
      manifestDeleteFiles(tableDir, toV).map(rel => s"$tableDir/$rel"))
  }

  /** MANIFEST-DRIVEN COMPACTION: rewrite the latest snapshot's file
    * set into `targetFiles` files and commit the result as a NEW
    * snapshot. Readers of prior versions are untouched (immutable
    * file sets); the fragmented files stay on disk serving their
    * versions until [[vacuum]] passes the retention floor — the
    * compaction/GC split every table format makes, so a compactor
    * can run concurrently with readers at any version. Returns the
    * committed version. */
  def compact(spark: SparkSession, tableDir: String,
      targetFiles: Int = 1): Int =
    commit(read(spark, tableDir).repartition(targetFiles), tableDir)

  /** Drop every data file not referenced by a manifest ≥
    * `retainFrom`, and the manifests below it. Callers guarantee no
    * reader still holds an older snapshot (the retention-window
    * contract every table format has). */
  def vacuum(tableDir: String, retainFrom: Int): Unit = {
    val keep = versions(tableDir).filter(_ >= retainFrom)
    val referenced = keep.flatMap(v => manifestFiles(tableDir, v) ++
        manifestDeleteFiles(tableDir, v))
      .map(rel => new File(tableDir, rel).getCanonicalPath).toSet
    val dataRoot = new File(tableDir, "data")
    val subdirs = dataRoot.listFiles()
    if (subdirs != null) subdirs.foreach { d =>
      val fs = d.listFiles()
      if (fs != null) fs.foreach { f =>
        if (f.isFile && !referenced.contains(f.getCanonicalPath) &&
          !f.getName.startsWith("_")) f.delete()
      }
      val rest = d.listFiles()
      if (rest == null || rest.forall(f => f.getName.startsWith("_"))) {
        val leftover = d.listFiles(); if (leftover != null)
          leftover.foreach(_.delete())
        d.delete()
      }
    }
    versions(tableDir).filter(_ < retainFrom)
      .foreach(v => manifest(tableDir, v).delete())
  }
}
