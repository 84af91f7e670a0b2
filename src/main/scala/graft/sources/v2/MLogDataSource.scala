package graft.sources.v2

import java.util.{Map => JMap, UUID}

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{
  SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.MicroBatchStream
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.{
  DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual,
  LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

/** `mlog` — a DataSource V2 ledger format with MANIFEST-COMMITTED writes:
  * the miniature of a table format's snapshot commit (Iceberg/Delta), and
  * the WRITE-side counterpart of the read-only [[PcapDataSource]]
  * (SURVEY §2.1 S2/S9; the reference's sink stage is
  * `KafkaKpiPipeline.scala`'s partitioned parquet write — this source
  * re-states the commit DISCIPLINE such a sink needs at 100 TB, where
  * "the files that happen to exist" is not a table).
  *
  * Layout under one directory:
  *  - `part-<partition>-<task>-<uuid>.mlog` — fixed ledger triples
  *    (id, k, v: all BIGINT), 8-byte magic/version header then 24-byte
  *    big-endian rows. Executors write STAGED files named uniquely per
  *    task attempt; nothing refers to them yet.
  *  - `_mlog_manifest.json` — the current pointer: committed file names
  *    with row counts and per-file (id, k) min/max. A reader plans from
  *    a manifest ALONE (never a directory listing), so aborted or
  *    orphaned part files are invisible by construction.
  *  - `_mlog_vNNNNN.json` — one immutable snapshot per commit (written
  *    before the current-pointer swap): `.option("versionAsOf", n)`
  *    plans from snapshot n — time travel (`.option("timestampAsOf",
  *    ts)` resolves by the stamped commit wall-clock the same way the
  *    catalog's TIMESTAMP AS OF does); [[MLog.expireVersions]]
  *    drops old snapshots and [[MLog.vacuum]] then reclaims data files
  *    no retained snapshot references.
  *
  * Exactly-once batch commit: each `DataWriter.commit()` returns its
  * file's stats as the commit message; `BatchWrite.commit(messages)` runs
  * once on the driver and publishes the manifest OPTIMISTICALLY
  * CONCURRENTLY ([[MLog.commitAppend]]: read → txn-replay check →
  * re-merge → CAS on the snapshot slot, retrying a lost race against the
  * re-read state; mutators instead conflict-detect via
  * [[MLog.publishExclusive]]). `BatchWrite.abort()` deletes every staged
  * file the failed job managed to report. SaveMode.Append merges entries
  * into the existing manifest; SaveMode.Overwrite arrives as truncate +
  * append (`SupportsTruncate`), publishing a manifest with only the new
  * entries — superseded files become unreferenced garbage for a vacuum
  * pass.
  *
  * Read path: `SupportsPushDownFilters` accepts range/equality filters on
  * `id`/`k` and prunes FILES by manifest min/max before planning (one
  * InputPartition per surviving file; all filters are also returned as
  * residuals — min/max pruning is sound but inexact);
  * `SupportsPushDownRequiredColumns` prunes the 3 columns. The reader
  * consumes exactly `rows` triples per the manifest — the manifest, not
  * the byte stream, decides where a file's data ends.
  *
  * SCOPE: the ledger schema `(id, k, v): BIGINT` is FIXED by design.
  * mlog exists to state the table-format DISCIPLINES — manifest-committed
  * atomic visibility, optimistic concurrency, snapshots/time travel,
  * deletion vectors, row-level SQL, retention, streaming both directions,
  * per-file stats — in their smallest complete form; a general row
  * encoding (arbitrary StructType, per-column stats, column evolution)
  * is parquet's job, and the production shape for that is these same
  * commit/manifest protocols OVER parquet files (Delta/Iceberg). Every
  * write path validates the fixed schema loudly, so the boundary is an
  * error message, never a silent coercion.
  *
  * SNAPSHOT-LOG SCALING, scope-pinned like the schema: the HOT path —
  * planning a read — goes through the current pointer (one manifest
  * read) or one named snapshot, never a history walk; commit CAS-es one
  * slot. What is O(#retained-commits) is the log itself: [[versions]]
  * lists the snapshot directory, so history/expire/vacuum/timestamp
  * resolution are listing-bound (timestamp resolution then reads
  * newest-first and stops at the first hit, so a near-head timestamp —
  * the common pin — opens O(1) manifests). A store carried to 10⁶
  * retained commits makes those MAINTENANCE operations listing-bound;
  * the production answer is the retention loop this format already has
  * (expireVersions keeps the listed set bounded — Delta/Iceberg ship the
  * same contract: log retention is what keeps their history enumerable),
  * not a second index over the log. */
class MLogDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "mlog"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    MLog.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new MLogTable(properties)

  override def supportsExternalMetadata(): Boolean = false
}

object MLog {
  val Schema: StructType = StructType(Seq(
    StructField("id", LongType), StructField("k", LongType),
    StructField("v", LongType)))

  val ManifestName = "_mlog_manifest.json"
  val Magic = 0x4D4C4731 // "MLG1"
  val Version = 1

  /** The `_file` METADATA column (Iceberg's column of the same name): the
    * data file a row lives in. Exposed on every scan via
    * `SupportsMetadataColumns`; row-level SQL commands key their rewrite
    * groups on it (`requiredMetadataAttributes` + runtime group
    * filtering). */
  val FileColumn = "_file"

  /** A deletion-vector sidecar: `name` is a `.dvec` file holding `rows`
    * sorted physical row POSITIONS of its data file that are logically
    * deleted. The data file's bytes are untouched; readers skip the
    * positions at scan time — the MERGE-ON-READ delete (Delta deletion
    * vectors / Iceberg positional deletes), the flavor that makes a
    * small delete O(matches) instead of O(touched-file bytes). */
  case class DvRef(name: String, rows: Long)

  /** One committed file: name + PHYSICAL row count + (id, k) min/max,
    * plus the optional deletion vector masking some of those rows. With
    * a `dv`, `rows` still counts physical rows (the byte-stream bound)
    * and min/max still bound ALL physical rows — conservative but sound
    * for pruning; the logical row count is `rows - dv.rows`.
    *
    * `bytes` is the file's on-disk size, recorded at write time — what
    * scan statistics ([[MLogScan.estimateStatistics]]) and the streaming
    * `maxBytesPerTrigger` budget meter. -1 = a legacy manifest that
    * predates the field; [[sizeBytes]] then derives it from the fixed
    * row width (header + 24 B/row — exact for this format, which is why
    * the fallback is safe rather than a guess).
    *
    * `vb` is the file's (min, max) over the `v` column — recorded by
    * every writer since the field existed, None for legacy manifest
    * entries (unknown bounds: a `v` filter keeps the file, MIN/MAX(`v`)
    * declines to push). Like the id/k bounds it covers ALL physical
    * rows, masked included — conservative but sound for pruning. */
  case class FileEntry(name: String, rows: Long, minId: Long, maxId: Long,
                       minK: Long, maxK: Long, dv: Option[DvRef] = None,
                       bytes: Long = -1L,
                       vb: Option[(Long, Long)] = None) {
    def sizeBytes: Long = if (bytes >= 0) bytes else 8L + 24L * rows
    /** Rows a reader actually surfaces: physical minus DV-masked. */
    def logicalRows: Long = rows - dv.fold(0L)(_.rows)
  }

  /** The full table state one manifest publishes: the committed files
    * plus the TRANSACTION LEDGER — per writer-application id, the highest
    * version (e.g. a streaming batchId) that application has committed.
    * This is Delta's SetTransaction/txnAppId primitive: because the
    * ledger rides in the SAME atomic manifest publish as the data files,
    * "did batch N land?" has exactly one answer, and a replayed
    * foreachBatch commit (sink wrote, checkpoint didn't advance, batch
    * re-runs) can be refused without any window where data and marker
    * disagree. Carried forward across appends, overwrites, deletes and
    * compactions — idempotence records must survive table rewrites.
    *
    * `commitTimeMs` is the publishing driver's wall clock at CAS time —
    * what `TIMESTAMP AS OF` resolves against ([[resolveTimestamp]]) and
    * `CALL …history` surfaces. -1 = a legacy snapshot that predates the
    * field; resolution then falls back to the snapshot FILE's
    * modification time (the store's clock, close enough for a
    * reproducibility pin and the same fallback Delta applies to its
    * checkpointed commits). */
  case class Manifest(files: Seq[FileEntry], txn: Map[String, Long],
                      version: Int = 0, commitTimeMs: Long = -1L)

  /** (files planned after manifest min/max pruning, files the manifest
    * names) for the mlog scan inside `df`'s physical plan — read from the
    * scan INSTANCE itself, so the measurement is scan-local: two
    * concurrent reads of two stores cannot race it (the round-15 shape, a
    * shared `lastPlanned` static, could). The plan is inspected
    * pre-adaptive (`sparkPlan`), where the DSv2 `BatchScanExec` is always
    * visible; building it re-runs the scan builder, which is
    * deterministic for a pinned manifest (versionAsOf/changesSince, or a
    * write-once store). */
  def planned(df: org.apache.spark.sql.DataFrame): (Int, Int) = {
    val scan = df.queryExecution.sparkPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec
          if b.scan.isInstanceOf[MLogScan] => b.scan.asInstanceOf[MLogScan]
    }.getOrElse(throw new IllegalStateException(
      "no mlog scan in this DataFrame's plan"))
    (scan.files.length, scan.total)
  }

  /** The current table state. Normally the `_mlog_manifest.json` pointer;
    * if the pointer is ABSENT but committed snapshots exist (a crash
    * between delete and rename under a non-atomic-overwrite filesystem,
    * or manual damage), recovers from the NEWEST snapshot rather than
    * silently serving an empty table — an existing table must never read
    * as zero files. Only a directory with neither pointer nor snapshots
    * (a brand-new table) is legitimately empty. */
  def readManifest(fs: FileSystem, dir: Path): Seq[FileEntry] =
    readManifestFull(fs, dir).files

  /** [[readManifest]] plus the transaction ledger and version. The
    * pointer is a CACHE of the newest snapshot: concurrent winners of
    * different versions can swap it out of order (and a crash can leave
    * it lagging or absent), so when snapshots newer than the pointer's
    * recorded version exist, the newest snapshot — the log, not the
    * cache — is served.
    *
    * The returned [[Manifest.version]] is the commit protocol's CONFLICT
    * TOKEN: it is always the version of the content actually served, and
    * it is derived from observations taken AT OR BEFORE the content read
    * (the log is listed FIRST, then the pointer is read). A commit that
    * lands after this read therefore always targets a version this
    * token's successor collides with — never a fresh slot built on stale
    * files, which was round 15's lost-update gap (the base was re-listed
    * AFTER the read, so an interleaved commit advanced the base past the
    * served content and its files silently vanished from the publish). */
  def readManifestFull(fs: FileSystem, dir: Path): Manifest = {
    val newest = versions(fs, dir).lastOption
    val current = new Path(dir, ManifestName)
    // The local-FS pointer swap is delete-then-rename, and the local
    // CHECKSUMMED filesystem renames the data file and its .crc sidecar
    // in two steps: a reader racing the swap can miss the open entirely
    // (FileNotFoundException) or read one version's bytes against the
    // other's checksum (ChecksumException — observed live under mixed
    // append/compact/delete concurrency). Both are the same condition —
    // the pointer CACHE is mid-swap — and both degrade the same way:
    // treat the pointer as absent and let the snapshot log arbitrate
    // (snapshots are write-once, their checksums never change). On HDFS
    // the swap is one atomic replace and neither window exists.
    val pointer =
      try {
        if (fs.exists(current)) Some(readManifestFile(fs, current)) else None
      } catch {
        case _: java.io.FileNotFoundException => None
        case _: org.apache.hadoop.fs.ChecksumException => None
      }
    (pointer, newest) match {
      // Pointer serves only when at least as new as the newest LISTED
      // snapshot (it can be newer — a swap that landed after our listing;
      // its snapshot exists, written before the swap, so the token is
      // still exactly the served content's version). A legacy pointer
      // recording no version (0) loses to any listed snapshot.
      case (Some(p), Some(v)) if p.version >= v => p
      case (_, Some(v)) => readManifestVersionFull(fs, dir, v)
      case (Some(p), None) => p
      case (None, None) => Manifest(Seq.empty, Map.empty)
    }
  }

  /** Snapshot read: the manifest exactly as commit `v` published it.
    * Fails (rather than silently serving current) when the version was
    * never written or has been expired. */
  def readManifestVersion(fs: FileSystem, dir: Path, v: Int): Seq[FileEntry] =
    readManifestVersionFull(fs, dir, v).files

  private def readManifestVersionFull(fs: FileSystem, dir: Path, v: Int): Manifest = {
    val f = versionPath(dir, v)
    require(fs.exists(f),
      s"mlog version $v does not exist (expired or never committed) under $dir")
    // The snapshot file IS version v by its path — stamp it so a legacy
    // snapshot body (recorded v = 0) still carries the correct conflict
    // token; the path, not the body, is what the CAS contended on.
    readManifestFile(fs, f).copy(version = v)
  }

  /** Committed snapshot versions still on disk, ascending. */
  def versions(fs: FileSystem, dir: Path): Seq[Int] =
    try {
      if (!fs.exists(dir)) Seq.empty
      else fs.listStatus(dir).toSeq.map(_.getPath.getName)
        .collect { case VersionRe(n) => n.toInt }.sorted
    } catch {
      // The directory itself vanished between the probe and the listing
      // (a racing DROP): no directory, no snapshots — same answer the
      // probe would have given a moment later. The local filesystem
      // reports the mid-unlink window as FileNotFound OR AccessDenied
      // (File.list() returns null and Hadoop wraps it); a failure with
      // the directory still present is a real error and propagates.
      case _: java.io.FileNotFoundException => Seq.empty
      case e: java.io.IOException =>
        if (!fs.exists(dir)) Seq.empty else throw e
    }

  // \d{5,}: versionPath pads to 5 digits but emits 6+ past v99999 —
  // parsing must tolerate every width %05d can produce.
  private val VersionRe = """_mlog_v(\d{5,})\.json""".r
  private def versionPath(dir: Path, v: Int): Path =
    new Path(dir, f"_mlog_v$v%05d.json")

  private def readManifestFile(fs: FileSystem, mf: Path): Manifest = {
    if (!fs.exists(mf)) return Manifest(Seq.empty, Map.empty)
    val in = fs.open(mf)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(text)
    require(root.get("format").asText() == "mlog" &&
      root.get("version").asInt() == Version, s"unreadable manifest $mf")
    val files = root.get("files")
    val entries = (0 until files.size()).map { i =>
      val f = files.get(i)
      // "dv" is OPTIONAL: pre-deletion-vector manifests parse as None.
      val dv = Option(f.get("dv")).map(d =>
        DvRef(d.asText(), f.get("dvRows").asLong()))
      // "bytes" is OPTIONAL: legacy manifests derive it (fixed row width).
      // "minV"/"maxV" are OPTIONAL: legacy entries parse as unbounded
      // (None) — a v filter keeps them, MIN/MAX(v) declines to push.
      val vb = (Option(f.get("minV")), Option(f.get("maxV"))) match {
        case (Some(lo), Some(hi)) => Some((lo.asLong(), hi.asLong()))
        case _ => None
      }
      FileEntry(f.get("name").asText(), f.get("rows").asLong(),
        f.get("minId").asLong(), f.get("maxId").asLong(),
        f.get("minK").asLong(), f.get("maxK").asLong(), dv,
        Option(f.get("bytes")).fold(-1L)(_.asLong()), vb)
    }
    // "txn" is OPTIONAL: manifests written before the transaction ledger
    // existed (and by writers that never set one) parse as empty.
    val txn = Option(root.get("txn")).fold(Map.empty[String, Long]) { t =>
      val b = Map.newBuilder[String, Long]
      t.properties().forEach(e => b += (e.getKey -> e.getValue.asLong()))
      b.result()
    }
    // "v" (this manifest's own snapshot number) is absent in legacy
    // manifests — 0 means "unknown", and the pointer-vs-snapshot
    // arbitration falls back to pointer-wins. "ts" (commit wall-clock,
    // ms) is likewise absent in legacy snapshots: -1 = unknown,
    // timestamp resolution falls back to the snapshot file's mtime.
    Manifest(entries, txn, Option(root.get("v")).fold(0)(_.asInt()),
      Option(root.get("ts")).fold(-1L)(_.asLong()))
  }

  /** Snapshot `v`'s commit wall-clock (ms since epoch): the manifest
    * body's recorded "ts", falling back to the snapshot FILE's
    * modification time for legacy snapshots that predate the field. */
  def commitTimeMs(fs: FileSystem, dir: Path, v: Int): Long = {
    val f = versionPath(dir, v)
    require(fs.exists(f),
      s"mlog version $v does not exist (expired or never committed) under $dir")
    val recorded = readManifestFile(fs, f).commitTimeMs
    if (recorded >= 0) recorded else fs.getFileStatus(f).getModificationTime
  }

  /** Snapshot `v`'s commit time, or None when the snapshot file is no
    * longer there — a concurrent [[expireVersions]] can remove it
    * between a versions() listing and the manifest read; to a resolver
    * that version is simply EXPIRED, not an error. */
  private def commitTimeIfRetained(fs: FileSystem, dir: Path,
                                   v: Int): Option[Long] =
    try {
      val f = versionPath(dir, v)
      if (!fs.exists(f)) None
      else {
        val recorded = readManifestFile(fs, f).commitTimeMs
        Some(if (recorded >= 0) recorded
             else fs.getFileStatus(f).getModificationTime)
      }
    } catch { case _: java.io.FileNotFoundException => None }

  /** `TIMESTAMP AS OF` resolution: the NEWEST retained snapshot whose
    * commit time is <= `tsMs` — Delta's semantics (a timestamp pins the
    * table state a reader at that wall-clock would have seen). Walks the
    * retained snapshot list NEWEST-FIRST and stops at the first
    * qualifying version, so a near-head timestamp (the common
    * reproducibility pin) reads O(1) snapshot manifests, not O(history).
    * Snapshots a concurrent [[expireVersions]] removed mid-walk are
    * skipped as expired; if the entire listing vanished, the walk
    * re-lists ONCE before concluding the store is empty. Fails loudly
    * when `tsMs` predates the first retained snapshot — serving the
    * oldest anyway would silently hand back a state that did not exist
    * at that time (or whose true state was expired).
    *
    * ORDERING: stamped commit times are monotonic BY CONSTRUCTION — the
    * publish clamps each snapshot's ts to strictly after its
    * predecessor's (Delta's in-commit-timestamp rule), so first-hit
    * newest-first IS the clamped resolution. The one residual anomaly is
    * a PRE-STAMP legacy store whose mtime-fallback times interleave
    * non-monotonically with stamped ones (or were back-dated by a copy):
    * there the first newest-first hit can pin a version even though an
    * OLDER version carries a later commit time; resolution stays
    * first-hit (re-reading the whole history every pin would forfeit the
    * O(1) near-head walk for a case only legacy stores can exhibit). */
  def resolveTimestamp(fs: FileSystem, dir: Path, tsMs: Long): Int = {
    var relisted = false
    while (true) {
      val vs = versions(fs, dir)
      require(vs.nonEmpty, s"no committed mlog snapshots under $dir")
      val walk = vs.reverseIterator
        .flatMap(v => commitTimeIfRetained(fs, dir, v).map(t => (v, t)))
      var oldestSeen: (Int, Long) = null
      while (walk.hasNext) {
        val vt = walk.next()
        oldestSeen = vt
        if (vt._2 <= tsMs) return vt._1
      }
      if (oldestSeen != null)
        throw new IllegalArgumentException(
          s"mlog TIMESTAMP AS OF $tsMs ms predates the first retained " +
            s"snapshot under $dir (v${oldestSeen._1} committed at " +
            s"${oldestSeen._2} ms) — the state at that time is unknown " +
            "or expired")
      // Every listed snapshot vanished mid-walk (a racing expire, or a
      // racing DROP): one fresh listing sees either the survivors / a
      // fresh commit, or a genuinely empty store.
      require(!relisted, s"no committed mlog snapshots under $dir")
      relisted = true
    }
    -1 // unreachable
  }

  /** Optimistically-concurrent APPEND/OVERWRITE commit: loop { read the
    * current state; refuse a replayed (appId, version); re-merge `fresh`
    * into it (or replace it, for truncate); CAS-publish as the next
    * snapshot }. Losing the CAS means a concurrent commit landed — a
    * blind re-merge of fresh files against the NEW state is always
    * valid (they reference only this committer's staged files), so the
    * retry is safe where a mutator's would not be. Returns false when
    * the txn ledger refused the commit (caller cleans its staged
    * files). */
  def commitAppend(fs: FileSystem, dir: Path, fresh: Seq[FileEntry],
                   txnUpdate: Option[(String, Long)],
                   truncate: Boolean): Boolean = {
    var attempts = 0
    while (true) {
      val full = readManifestFull(fs, dir)
      if (txnUpdate.exists { case (app, ver) =>
          full.txn.get(app).exists(_ >= ver) }) return false
      // The base is the version of the content ACTUALLY READ — never a
      // fresher listing: a commit interleaving after the read must
      // collide on slot base + 1 (CAS loss → re-read → re-merge), not
      // publish this attempt's stale file set into a free fresh slot.
      val base = full.version
      val state = if (truncate) fresh else full.files ++ fresh
      val newTxn = txnUpdate.fold(full.txn) { case (app, ver) =>
        full.txn + (app -> ver)
      }
      commitRaceHook()
      if (tryPublish(fs, dir, base + 1, state, newTxn)) return true
      attempts += 1
      require(attempts < 50,
        s"mlog append lost $attempts version races under $dir — " +
          "a runaway concurrent committer?")
    }
    false // unreachable
  }

  /** TEST-ONLY interleaving hook, invoked on every commit attempt between
    * the state read (the conflict token's observation) and the publish.
    * A spec installs a one-shot competing commit here to FORCE the
    * interleaving the protocol must survive — CAS loss → re-merge retry
    * for appends, ConcurrentModificationException for mutators — instead
    * of hoping a free-running race catches it. Default no-op; never set
    * outside tests. */
  @volatile private[v2] var commitRaceHook: () => Unit = () => ()

  // Same-JVM committers to one store serialize here: HDFS's namenode
  // makes create(overwrite = false) a true CAS across processes, but
  // RawLocalFileSystem's is check-then-act — atomic enough for separate
  // processes only by luck. In-process (a driver running concurrent
  // write jobs — the case local mode actually has) the lock closes it.
  private val publishLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** CAS-create for `CREATE TABLE` (and, with `entries`, the atomic
    * publish of a staged CTAS): publish snapshot v1 naming exactly
    * `entries` iff the store does not exist yet. Unlike [[commitAppend]]
    * this NEVER retries a lost race — a competing creator (or any
    * commit) winning slot v1 means the table exists, which is exactly
    * the condition CREATE must report, not absorb. Returns false when
    * the store already exists or the v1 CAS was lost. */
  private[v2] def createEmpty(fs: FileSystem, dir: Path): Boolean =
    createWith(fs, dir, Seq.empty)

  private[v2] def createWith(fs: FileSystem, dir: Path,
                             entries: Seq[FileEntry]): Boolean = {
    if (fs.exists(new Path(dir, ManifestName)) || versions(fs, dir).nonEmpty)
      return false
    fs.mkdirs(dir)
    tryPublish(fs, dir, 1, entries, Map.empty)
  }

  /** CAS-publish `entries` + `txn` as snapshot `v`: the snapshot file is
    * created with overwrite = false, which is the ONE atomically
    * contended resource — two committers whose reads were both current
    * race to the same version number, and exactly one create() wins
    * (atomic on HDFS/object stores; same-JVM local committers serialize
    * on [[publishLocks]]). Returns false when this committer lost (the
    * version exists). On a win, the current-pointer cache is swapped
    * after the snapshot lands; because concurrent winners of DIFFERENT
    * versions can swap the pointer out of order, the pointer records
    * its own version and [[readManifestFull]] serves whichever of
    * {pointer, newest snapshot} is newer — the pointer is a cache, the
    * snapshots are the log. */
  private def tryPublish(fs: FileSystem, dir: Path, v: Int,
      entries: Seq[FileEntry], txn: Map[String, Long]): Boolean =
    publishLocks.computeIfAbsent(dir.toString, _ => new Object)
      .synchronized { tryPublishLocked(fs, dir, v, entries, txn) }

  private def tryPublishLocked(fs: FileSystem, dir: Path, v: Int,
      entries: Seq[FileEntry], txn: Map[String, Long]): Boolean = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("format", "mlog")
    root.put("version", Version)
    root.put("v", v) // which snapshot this state IS (pointer-lag arbiter)
    // Commit wall-clock: what TIMESTAMP AS OF resolves against. The
    // publishing driver's clock, stamped at CAS time and CLAMPED to
    // strictly after the predecessor snapshot's commit time (Delta's
    // in-commit-timestamp monotonicity rule): cross-driver clock skew —
    // or a stamped snapshot landing after a legacy mtime-fallback one —
    // can otherwise publish v+1 with an EARLIER time than v, and a
    // timestamp pin between the two would resolve to state that includes
    // neither-or-both commits depending on walk order. One extra O(1)
    // manifest read per commit buys resolveTimestamp its first-hit walk.
    root.put("ts", math.max(System.currentTimeMillis(),
      (if (v > 1) commitTimeIfRetained(fs, dir, v - 1).getOrElse(-1L)
       else -1L) + 1L))
    val arr = root.putArray("files")
    // Name-sorted: the manifest is deterministic up to the files' uuids.
    entries.sortBy(_.name).foreach { e =>
      val n = arr.addObject()
      n.put("name", e.name); n.put("rows", e.rows)
      n.put("minId", e.minId); n.put("maxId", e.maxId)
      n.put("minK", e.minK); n.put("maxK", e.maxK)
      n.put("bytes", e.sizeBytes): Unit
      e.vb.foreach { case (lo, hi) =>
        n.put("minV", lo); n.put("maxV", hi): Unit }
      e.dv.foreach { d => n.put("dv", d.name); n.put("dvRows", d.rows): Unit }
    }
    if (txn.nonEmpty) {
      val t = root.putObject("txn")
      txn.toSeq.sortBy(_._1).foreach { case (a, m) => t.put(a, m): Unit }
    }
    val bytes = mapper.writeValueAsBytes(root)
    // Snapshot file FIRST (crash after it = a committed version whose
    // pointer lags — readers arbitrate by version), then the pointer.
    // The snapshot is NEVER written in place: content goes to a hidden
    // temp (its name cannot match VersionRe, so listers never see it),
    // then ONE rename claims the version slot — readers see a version
    // file only complete, never mid-write (the claimed-but-empty window
    // an in-place create(false)+write would expose to a concurrent
    // reader's versions() listing, on HDFS as much as locally). The
    // rename is the CAS: on HDFS it atomically fails when the slot is
    // taken; same-JVM local committers already hold [[publishLocks]],
    // making the exists() check under the lock authoritative.
    val slot = versionPath(dir, v)
    if (fs.exists(slot)) return false // lost: that version committed first
    val vTmp = new Path(dir, s".mlog_vtmp-${UUID.randomUUID()}")
    val vOut = fs.create(vTmp, true)
    try vOut.write(bytes) finally vOut.close()
    if (!fs.rename(vTmp, slot)) {
      fs.delete(vTmp, false)
      return false // lost the race on the slot itself
    }
    val tmp = new Path(dir, s".${ManifestName}.tmp-${UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try out.write(bytes) finally out.close()
    val target = new Path(dir, ManifestName)
    // Pointer swap via FileContext.rename(Rename.OVERWRITE). On HDFS this
    // is a single atomic replace — no window where the pointer is absent.
    // On the LOCAL filesystem it is NOT: Hadoop's default
    // AbstractFileSystem.renameInternal(src, dst, overwrite) is
    // delete-then-rename and RawLocalFs does not override it, so a crash
    // inside the window can strand the table pointer-less — which is
    // exactly the case readManifest's newest-snapshot recovery covers.
    // The FileContext is derived from the FileSystem HANDLE's own URI
    // (never the scheme-less target resolved against fs.defaultFS, which
    // can name a different filesystem than the one the tmp file was just
    // written to), and both paths are qualified against it.
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      fs.getUri, fs.getConf)
    fc.rename(fs.makeQualified(tmp), fs.makeQualified(target),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    true
  }

  /** Conflict-DETECTING publish for table mutators (delete, compact,
    * merge): the caller read the table at `baseVersion` and computed a
    * whole-state rewrite from it; if ANY other commit landed since —
    * equivalently, if snapshot `baseVersion + 1` is taken — that rewrite
    * is stale (it would silently drop the concurrent commit's files), so
    * this fails with a retryable conflict instead of publishing. This is
    * the mutator half of optimistic concurrency; appends re-merge and
    * retry ([[writeManifest]]) because a blind re-merge of fresh files
    * is always valid. */
  private[v2] def publishExclusive(fs: FileSystem, dir: Path,
      baseVersion: Int, entries: Seq[FileEntry],
      txn: Map[String, Long]): Unit = {
    commitRaceHook()
    if (versions(fs, dir).lastOption.getOrElse(0) != baseVersion ||
        !tryPublish(fs, dir, baseVersion + 1, entries, txn))
      throw new java.util.ConcurrentModificationException(
        s"mlog table under $dir changed since snapshot $baseVersion was " +
          "read; the computed rewrite is stale — re-read and retry the " +
          "operation")
  }

  /** Destructive maintenance must name a REAL store: a directory with
    * neither a manifest pointer nor any committed snapshot (a typo'd
    * path, or a directory that is simply not an mlog table) has an empty
    * live set, so a vacuum there would delete every `.mlog`/`.dvec` file
    * it finds — refuse loudly instead. A brand-new store becomes
    * maintainable at its first commit. */
  private[v2] def requireStore(fs: FileSystem, dir: Path, what: String): Unit =
    require(fs.exists(new Path(dir, ManifestName)) ||
        versions(fs, dir).nonEmpty,
      s"$dir is not an mlog store (no manifest pointer and no committed " +
        s"snapshots) — refusing to $what a directory this format does " +
        "not own")

  /** Drop all but the newest `keepLast` snapshot manifests (never the
    * current pointer) — the expire-snapshots half of retention; returns
    * how many were removed. Files an expired snapshot referenced become
    * vacuum-able once no retained snapshot names them. */
  def expireVersions(fs: FileSystem, dir: Path, keepLast: Int): Int = {
    requireStore(fs, dir, "expire snapshots under")
    val vs = versions(fs, dir)
    val drop = vs.dropRight(math.max(0, keepLast))
    drop.foreach(v => fs.delete(versionPath(dir, v), false))
    drop.length
  }

  /** In-flight-commit fence for [[vacuum]]: a staged-but-unpublished file
    * (an executor wrote it; the driver has not yet published the manifest
    * naming it) is unreferenced BY DESIGN until its commit lands, so a
    * concurrent vacuum must not reclaim it. Files younger than the grace
    * are spared regardless of reference state. 24 HOURS: the fence must
    * exceed the longest stage-to-publish window any write job can have —
    * at the scale this format targets, a large append/merge can stage
    * files for hours before its single publish (Delta's equivalent fence
    * defaults to 7 days), and the fence trusts store mtimes against the
    * vacuuming driver's clock, so it also has to absorb clock skew.
    * A vacuum concurrent with a writer whose job runs LONGER than the
    * grace still needs an explicitly larger min_age. Deterministic tests
    * and single-writer maintenance pass 0 explicitly. */
  val DefaultVacuumGraceMs: Long = 24L * 3600000L

  /** Garbage-collect every `.mlog` data file that NO retained snapshot
    * manifest (nor the current pointer) references — the debris of
    * mid-write deaths, and of superseded commits once
    * [[expireVersions]] has dropped the snapshots naming them. A file
    * referenced by any retained version stays: time travel to that
    * version must keep working. Readers plan from manifests alone, so a
    * vacuum never races a READ; concurrent WRITERS are fenced by
    * `minAgeMs` — only unreferenced files whose modification time is at
    * least that old are reclaimed, sparing files a concurrent committer
    * has staged but not yet published. Returns the number removed. */
  def vacuum(fs: FileSystem, dir: Path,
             minAgeMs: Long = DefaultVacuumGraceMs): Long = {
    requireStore(fs, dir, "vacuum")
    val entries = readManifest(fs, dir) ++
      versions(fs, dir).flatMap(readManifestVersion(fs, dir, _))
    // Deletion-vector sidecars are referenced state too: a superseded
    // .dvec (its file re-vectored or rewritten) ages out with the
    // snapshots naming it, exactly like a superseded data file.
    val live = (entries.map(_.name) ++ entries.flatMap(_.dv).map(_.name)).toSet
    val cutoff = System.currentTimeMillis() - math.max(0L, minAgeMs)
    val junk = fs.listStatus(dir).filter { st =>
      val n = st.getPath.getName
      st.isFile && (n.endsWith(".mlog") || n.endsWith(".dvec")) &&
        !live(n) && st.getModificationTime <= cutoff
    }
    junk.foreach(st => fs.delete(st.getPath, false))
    junk.length.toLong
  }

  /** Outcome of a [[delete]]: how many files the predicate's manifest
    * bounds touched (each rewritten without its matching rows), how many
    * were carried into the new manifest untouched, rows removed, and the
    * snapshot version the delete committed. NO-OP CASE: when the bounds
    * touch nothing (`rewritten == 0`), NOTHING is committed — no new
    * snapshot exists — and `newVersion` reports the pre-existing latest
    * version (0 for an empty table), not a version the delete created. */
  case class DeleteStats(rewritten: Int, carried: Int, removedRows: Long,
                         newVersion: Int)

  /** Predicate DELETE with FILE-LEVEL pruning — the Delta/Iceberg
    * copy-on-write delete: only files whose manifest min/max COULD hold a
    * matching row (`mayMatch`, the conservative file-bounds test) are
    * rewritten, each by one task, without the rows `matches` selects;
    * every other file is carried into the new manifest by reference —
    * zero bytes moved. The rewrite commits as a normal snapshot: readers
    * are atomic-swapped to the new manifest, the PRE-delete snapshot
    * still names the replaced files (time travel to before the delete
    * keeps working until it is expired + vacuumed — the GDPR caveat a
    * real table documents). At 100 TB a targeted delete touches the few
    * files its key range clusters into, not the table. */
  def delete(spark: SparkSession, dir: Path,
             mayMatch: FileEntry => Boolean,
             matches: (Long, Long, Long) => Boolean): DeleteStats = {
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val full = readManifestFull(fs, dir)
    val base = full.version // the version of the content actually read
    val cur = full.files
    val (touched, carried) = cur.partition(mayMatch)
    if (touched.isEmpty)
      return DeleteStats(0, cur.size, 0L, base)
    val conf = hadoopConf()
    val dirStr = dir.toString
    val results = spark.sparkContext
      .parallelize(touched, math.max(1, math.min(touched.size,
        spark.sparkContext.defaultParallelism)))
      .map(e => rewriteWithout(conf, dirStr, e, matches)).collect()
    val kept = results.flatMap(_._1)
    publishExclusive(fs, dir, base, carried ++ kept, full.txn)
    DeleteStats(touched.size, carried.size, results.map(_._2).sum, base + 1)
  }

  /** One task's copy-on-write rewrite: stream `e`, drop the rows its
    * deletion vector already masks (NOT counted as removed — they were
    * deleted before this rewrite) and the live rows `matches` selects,
    * restate min/max/rows for the replacement. The replacement carries
    * no vector — a rewrite MATERIALIZES the DV. An all-deleted file
    * yields no replacement at all. */
  private def rewriteWithout(conf: SerializableConfiguration, dir: String,
      e: FileEntry, matches: (Long, Long, Long) => Boolean)
      : (Option[FileEntry], Long) = {
    val d = new Path(dir)
    val fs = d.getFileSystem(conf.value)
    val masked = e.dv.map(dv => readDv(fs, d, dv)).getOrElse(Array.empty[Long])
    val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
      fs.open(new Path(d, e.name))))
    try {
      require(in.readInt() == Magic && in.readInt() == Version,
        s"not an mlog file: ${e.name}")
      val name = s"part-del-${UUID.randomUUID()}.mlog"
      var out: java.io.DataOutputStream = null
      var rows = 0L; var removed = 0L
      var minId = 0L; var maxId = 0L; var minK = 0L; var maxK = 0L
      var minV = 0L; var maxV = 0L
      var i = 0L; var mi = 0
      while (i < e.rows) {
        val id = in.readLong(); val k = in.readLong(); val v = in.readLong()
        if (mi < masked.length && masked(mi) == i) mi += 1 // already deleted
        else if (matches(id, k, v)) removed += 1
        else {
          if (out == null) {
            out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
              fs.create(new Path(d, name), false)))
            out.writeInt(Magic); out.writeInt(Version)
          }
          if (rows == 0L) {
            minId = id; maxId = id; minK = k; maxK = k; minV = v; maxV = v
          } else {
            if (id < minId) minId = id; if (id > maxId) maxId = id
            if (k < minK) minK = k; if (k > maxK) maxK = k
            if (v < minV) minV = v; if (v > maxV) maxV = v
          }
          out.writeLong(id); out.writeLong(k); out.writeLong(v)
          rows += 1
        }
        i += 1
      }
      if (out != null) out.close()
      (if (rows > 0) Some(FileEntry(name, rows, minId, maxId, minK, maxK,
         bytes = 8L + 24L * rows, vb = Some((minV, maxV))))
       else None, removed)
    } finally in.close()
  }

  val DvMagic = 0x4D4C4456 // "MLDV"

  /** Read a deletion-vector sidecar: sorted physical row positions. */
  private[v2] def readDv(fs: FileSystem, dir: Path, dv: DvRef): Array[Long] = {
    val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
      fs.open(new Path(dir, dv.name))))
    try {
      require(in.readInt() == DvMagic && in.readInt() == Version,
        s"not an mlog deletion vector: ${dv.name}")
      val n = in.readLong()
      require(n == dv.rows,
        s"deletion vector ${dv.name} holds $n positions; manifest says ${dv.rows}")
      // Bound BEFORE allocating: a corrupt/hostile count would otherwise
      // throw NegativeArraySizeException or silently mis-size via the
      // toInt wrap instead of naming the file.
      require(n >= 0 && n <= Int.MaxValue.toLong,
        s"deletion vector ${dv.name} declares $n positions — negative or " +
          "beyond the Int.MaxValue positions a single vector can hold")
      val out = new Array[Long](n.toInt)
      var i = 0
      while (i < out.length) { out(i) = in.readLong(); i += 1 }
      out
    } finally in.close()
  }

  private def writeDv(fs: FileSystem, dir: Path,
                      positions: Array[Long]): DvRef = {
    val name = s"dv-${UUID.randomUUID()}.dvec"
    val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
      fs.create(new Path(dir, name), false)))
    try {
      out.writeInt(DvMagic); out.writeInt(Version)
      out.writeLong(positions.length.toLong)
      positions.foreach(out.writeLong)
    } finally out.close()
    DvRef(name, positions.length.toLong)
  }

  /** Outcome of a [[deleteMor]]: files the bounds touched (each gaining
    * or extending a deletion vector — ZERO data bytes rewritten), files
    * carried untouched, rows newly masked, and the committed snapshot.
    * Same no-op contract as [[DeleteStats]]. */
  case class MorDeleteStats(vectored: Int, carried: Int, removedRows: Long,
                            newVersion: Int)

  /** MERGE-ON-READ predicate delete (Delta deletion vectors / Iceberg
    * positional deletes) — same pruning and same result rows as
    * [[delete]], different cost shape: instead of REWRITING each touched
    * file, one task per file records the matching physical row POSITIONS
    * in a `.dvec` sidecar (union'd with any existing vector; a file whose
    * every row ends up masked leaves the manifest entirely), and the
    * manifest entry points at the vector. Data bytes are never copied —
    * a delete that touches few rows of many large files costs O(matched
    * positions), not O(file bytes), which is the 100 TB reason this
    * flavor exists; the read-side price (skip-while-scanning) is paid
    * until a rewrite (delete/merge) or explicit rewrite materializes the
    * vector. Commits as a normal snapshot: the pre-delete snapshot still
    * serves the masked rows. */
  def deleteMor(spark: SparkSession, dir: Path,
                mayMatch: FileEntry => Boolean,
                matches: (Long, Long, Long) => Boolean): MorDeleteStats = {
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val full = readManifestFull(fs, dir)
    val base = full.version // the version of the content actually read
    val (touched, carried) = full.files.partition(mayMatch)
    if (touched.isEmpty)
      return MorDeleteStats(0, full.files.size, 0L, base)
    val conf = hadoopConf()
    val dirStr = dir.toString
    val results = spark.sparkContext
      .parallelize(touched, math.max(1, math.min(touched.size,
        spark.sparkContext.defaultParallelism)))
      .map(e => vectorize(conf, dirStr, e, matches)).collect()
    publishExclusive(fs, dir, base, carried ++ results.flatMap(_._1),
      full.txn)
    MorDeleteStats(touched.size, carried.size, results.map(_._2).sum,
      base + 1)
  }

  /** One task's vectorization: scan `e`'s live rows, collect the physical
    * positions `matches` selects, publish old ∪ new as a fresh sidecar
    * (the old one becomes snapshot-retained garbage). Returns the updated
    * entry — None when every physical row is now masked — and the count
    * of NEWLY masked rows. */
  private def vectorize(conf: SerializableConfiguration, dir: String,
      e: FileEntry, matches: (Long, Long, Long) => Boolean)
      : (Option[FileEntry], Long) = {
    val d = new Path(dir)
    val fs = d.getFileSystem(conf.value)
    val old = e.dv.map(dv => readDv(fs, d, dv)).getOrElse(Array.empty[Long])
    val fresh = scala.collection.mutable.ArrayBuffer.empty[Long]
    val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
      fs.open(new Path(d, e.name))))
    try {
      require(in.readInt() == Magic && in.readInt() == Version,
        s"not an mlog file: ${e.name}")
      var i = 0L; var oi = 0
      while (i < e.rows) {
        val id = in.readLong(); val k = in.readLong(); val v = in.readLong()
        if (oi < old.length && old(oi) == i) oi += 1 // already masked
        else if (matches(id, k, v)) fresh += i
        i += 1
      }
    } finally in.close()
    if (fresh.isEmpty) (Some(e), 0L)
    else {
      val union = (old ++ fresh).sorted.toArray
      if (union.length.toLong == e.rows) (None, fresh.length.toLong)
      else (Some(e.copy(dv = Some(writeDv(fs, d, union)))),
        fresh.length.toLong)
    }
  }

  /** Outcome of a [[merge]]: files the source's id bounds touched (each
    * rewritten without the matched rows), files carried by reference,
    * rows the source REPLACED (matched ids removed from base files), new
    * files staged from the source, and the snapshot the merge committed.
    * NO-OP CASE: an empty source commits nothing and `newVersion` is the
    * pre-existing latest version. */
  case class MergeStats(rewritten: Int, carried: Int, updatedRows: Long,
                        insertedFiles: Int, newVersion: Int)

  /** Driver-side budget for [[merge]]'s broadcast key set: 10 M longs ≈
    * 80 MB plus set overhead — comfortably inside a production driver,
    * far beyond any CDC slice or micro-batch. */
  val DefaultMaxMergeSourceKeys: Long = 10000000L

  /** MERGE INTO keyed on `id` (upsert): every base row whose id appears
    * in `source` is replaced by the source row; source rows with new ids
    * are inserted — WHEN MATCHED THEN UPDATE ∘ WHEN NOT MATCHED THEN
    * INSERT, the Delta/Iceberg upsert. Composition of the two lifecycle
    * primitives in ONE snapshot commit: (1) file-level pruning — only
    * base files whose manifest id bounds overlap the source's id range
    * are rewritten (one task each, dropping rows whose id is in the
    * source key set); every other file is carried by reference; (2) the
    * source rows are staged as new ledger files by their own tasks; (3)
    * a single manifest publish swaps in carried + rewritten + staged —
    * readers see the whole merge or none of it, and the pre-merge
    * snapshot keeps serving the old rows. The source key set is
    * collected and broadcast: a merge SOURCE is a bounded batch (a CDC
    * slice, a micro-batch) by construction — Delta's low-shuffle merge
    * makes the same assumption; an unbounded source would use a
    * join-based rewrite instead. At 100 TB the cost is the source's id
    * range's files plus the source itself, never the table. */
  def merge(spark: SparkSession, dir: Path,
            source: org.apache.spark.sql.DataFrame,
            maxSourceKeys: Long = DefaultMaxMergeSourceKeys): MergeStats = {
    require(source.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      Schema.fields.map(f => (f.name, f.dataType)).toSeq,
      s"mlog merge takes the fixed ledger schema (id, k, v: BIGINT); " +
        s"got ${source.schema.simpleString}")
    // The bounded-batch assumption, ENFORCED (not just documented): one
    // distributed agg pass proves (a) no duplicate source keys — two
    // source rows for one id would both insert after the matched base row
    // is removed, the ambiguity Delta/Iceberg MERGE refuse as "multiple
    // source rows matched" — and (b) the key set fits the driver-side
    // broadcast budget. An over-budget source must be split (or merged
    // via a join-based full rewrite) — failing LOUDLY here beats an OOM
    // mid-collect. The source is PERSISTED first so the guard, the key
    // collect, and the staging write all see ONE materialization: a
    // non-deterministic source (sample, limit, unordered dedup) could
    // otherwise pass the distinct-count check yet yield different rows
    // when collected or staged, letting a duplicate slip past the guard.
    // A DISK-BACKED caller persist is used as-is (a stored partition
    // survives memory pressure, so guard/collect/staging read one
    // materialization) and left cached on exit. A MEMORY-ONLY caller
    // persist is NOT one materialization — an evicted partition is
    // RECOMPUTED, reopening the non-deterministic-source window the
    // persist exists to close — but re-persisting the caller's plan at a
    // different level throws and unpersisting it behind the caller's
    // back changes their cost model; instead the source is re-anchored
    // through a fresh LogicalRDD (a distinct plan the cache manager does
    // not identify with the caller's) and THAT copy is disk-persisted:
    // each partition is computed once — through the caller's cache while
    // it is warm — and every later read hits this merge's own store.
    val ownPersist = !source.storageLevel.useDisk
    val src =
      if (!ownPersist) source
      else {
        val anchored =
          if (source.storageLevel ==
              org.apache.spark.storage.StorageLevel.NONE) source
          else spark.createDataFrame(source.rdd, source.schema)
        anchored.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      }
    try {
      val shape = src.selectExpr("count(*)", "count(DISTINCT id)").head
      val (nSrc, nKeys) = (shape.getLong(0), shape.getLong(1))
      require(nSrc == nKeys,
        s"mlog merge source has duplicate ids ($nSrc rows over $nKeys " +
          "distinct) — a target key would match multiple source rows; " +
          "de-duplicate the source first")
      require(nKeys <= maxSourceKeys,
        s"mlog merge collects the source key set to the driver (the " +
          s"bounded-batch low-shuffle-merge shape); $nKeys keys exceed " +
          s"maxSourceKeys = $maxSourceKeys — split the source into bounded " +
          "batches, or raise the budget deliberately")
      val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
      val full = readManifestFull(fs, dir)
      val base = full.version // the version of the content actually read
      val ids = src.select("id").collect().map(_.getLong(0))
      if (ids.isEmpty)
        return MergeStats(0, full.files.size, 0L, 0, base)
      val keySet = spark.sparkContext.broadcast(ids.toSet)
      val (lo, hi) = (ids.min, ids.max)
      val (touched, carried) =
        full.files.partition(e => e.minId <= hi && e.maxId >= lo)
      val conf = hadoopConf()
      val dirStr = dir.toString
      val results =
        if (touched.isEmpty) Array.empty[(Option[FileEntry], Long)]
        else spark.sparkContext
          .parallelize(touched, math.max(1, math.min(touched.size,
            spark.sparkContext.defaultParallelism)))
          .map(e => rewriteWithout(conf, dirStr, e,
            (id, _, _) => keySet.value(id))).collect()
      val staged = writeFiles(dir, src)
      publishExclusive(fs, dir, base,
        carried ++ results.flatMap(_._1) ++ staged, full.txn)
      MergeStats(touched.size, carried.size, results.map(_._2).sum,
        staged.size, base + 1)
    } finally if (ownPersist) src.unpersist(blocking = false)
  }

  /** Stage a DataFrame's partitions as ledger files WITHOUT publishing a
    * manifest — the building block [[merge]] composes with a rewrite
    * into one commit. One file per non-empty partition, attempt-unique
    * names, stats from the writer; a failed task aborts its own file and
    * Spark's task retry stages a fresh one (the orphan is invisible:
    * nothing references it until the caller's single publish). */
  private def writeFiles(dir: Path,
      df: org.apache.spark.sql.DataFrame): Seq[FileEntry] = {
    val conf = hadoopConf()
    val dirStr = dir.toString
    df.queryExecution.toRdd.mapPartitionsWithIndex { (pid, rows) =>
      val w = MLogWriterFactory(dirStr, conf).createWriter(pid, pid.toLong)
      var ok = false
      try {
        rows.foreach(w.write)
        val m = w.commit().asInstanceOf[MLogCommit]
        ok = true
        if (m.name != null) Iterator.single(m.entry) else Iterator.empty
      } finally if (!ok) w.abort()
    }.collect().toSeq
  }

  /** Outcome of a [[rewriteDvs]]: files whose deletion vector was
    * materialized (each rewritten without its masked rows, vector
    * dropped), rows physically removed by the materialization, and the
    * committed snapshot. NO-OP CASE: a table with no vectored files
    * commits nothing and `newVersion` reports the pre-existing latest
    * version. */
  case class RewriteDvStats(rewritten: Int, materializedRows: Long,
                            newVersion: Int)

  /** MATERIALIZE deletion vectors (Delta's `REORG TABLE … APPLY (PURGE)`
    * / Iceberg's rewrite_position_delete_files): every file carrying a
    * `.dvec` is rewritten WITHOUT its masked rows by one task, and the
    * replacement carries no vector — paying the copy cost once to retire
    * the per-read skip cost, and returning the file to [[compact]]'s
    * bin-packing (which deliberately carries DV'd files, since its merge
    * is a pure byte-copy). The superseded data files and sidecars stay
    * snapshot-retained until expire + vacuum, like any rewrite. This is
    * the missing third step of the merge-on-read lifecycle: delete cheap
    * (vector), read with skips, then materialize when the skip cost has
    * been paid often enough to matter. */
  def rewriteDvs(spark: SparkSession, dir: Path): RewriteDvStats = {
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val full = readManifestFull(fs, dir)
    val base = full.version // the version of the content actually read
    val (vectored, clean) = full.files.partition(_.dv.isDefined)
    if (vectored.isEmpty)
      return RewriteDvStats(0, 0L, base)
    val conf = hadoopConf()
    val dirStr = dir.toString
    // rewriteWithout with a never-matching predicate: masked rows are
    // dropped as "already deleted" (not counted), live rows copy through
    // with restated stats — exactly a materialization.
    val results = spark.sparkContext
      .parallelize(vectored, math.max(1, math.min(vectored.size,
        spark.sparkContext.defaultParallelism)))
      .map(e => rewriteWithout(conf, dirStr, e, (_, _, _) => false)).collect()
    publishExclusive(fs, dir, base, clean ++ results.flatMap(_._1), full.txn)
    RewriteDvStats(vectored.size, vectored.flatMap(_.dv).map(_.rows).sum,
      base + 1)
  }

  /** Outcome of a [[compact]]: manifest entry counts before/after, how
    * many small files were merged away, and the committed version.
    * NO-OP CASE: when no bin holds ≥ 2 files (`merged == 0`), nothing is
    * committed and `newVersion` reports the pre-existing latest version
    * (0 for an empty table), mirroring [[DeleteStats]]. */
  case class CompactStats(before: Int, after: Int, merged: Int,
                          newVersion: Int)

  /** Bin-packing compaction (Delta OPTIMIZE): files under `targetRows`
    * are first-fit packed (name order — deterministic for a given
    * manifest) into bins of ≤ `targetRows`, each multi-file bin merged
    * by one task into one replacement file; files already ≥ target, and
    * bins of one, are carried by reference. The merge is a pure payload
    * concatenation (the ledger format is order-free rows behind a fixed
    * header) and the replacement's stats are manifest ALGEBRA — sum of
    * rows, min of mins, max of maxes — so compaction never re-parses a
    * row. Commits as a normal snapshot: content is provably unchanged
    * (same rows, new layout), the pre-compaction snapshot keeps the old
    * layout readable. The 100 TB point: small-file debris from
    * fine-grained commits is what kills O(files) planning; OPTIMIZE
    * restores it without touching row content. */
  def compact(spark: SparkSession, dir: Path, targetRows: Long,
              clusterBy: Option[String] = None): CompactStats = {
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val full = readManifestFull(fs, dir)
    if (clusterBy.isDefined)
      return compactClustered(spark, fs, dir, full, targetRows, clusterBy.get)
    val base = full.version // the version of the content actually read
    val cur = full.files
    // Files carrying a deletion vector are CARRIED, not packed: the bin
    // merge is a pure byte-copy and must stay one; materializing DVs is
    // the rewrite job of delete/merge (Delta's OPTIMIZE rewrites DVs —
    // this one defers to the rewriting primitives, documented).
    val (small, large) = cur.sortBy(_.name)
      .partition(e => e.rows < targetRows && e.dv.isEmpty)
    val bins = scala.collection.mutable.ArrayBuffer
      .empty[scala.collection.mutable.ArrayBuffer[FileEntry]]
    small.foreach { e =>
      bins.find(b => b.map(_.rows).sum + e.rows <= targetRows) match {
        case Some(b) => b += e; ()
        case None =>
          bins += scala.collection.mutable.ArrayBuffer(e); ()
      }
    }
    val (multi, single) = bins.map(_.toSeq).toSeq.partition(_.size >= 2)
    if (multi.isEmpty)
      return CompactStats(cur.size, cur.size, 0, base)
    val conf = hadoopConf()
    val dirStr = dir.toString
    val merged = spark.sparkContext
      .parallelize(multi, math.max(1, math.min(multi.size,
        spark.sparkContext.defaultParallelism)))
      .map(b => mergeBin(conf, dirStr, b)).collect()
    publishExclusive(fs, dir, base, large ++ single.flatten ++ merged,
      full.txn)
    CompactStats(cur.size, large.size + single.size + merged.length,
      multi.map(_.size).sum, base + 1)
  }

  /** Cluster-by-key compaction (Delta's OPTIMIZE ZORDER analogue for a
    * single key): instead of first-fit byte-copy bins — whose merged
    * minId/maxId/minK/maxK/vb union across unrelated inputs, so pruning
    * and metadata MIN/MAX get strictly COARSER after maintenance — the
    * under-target vector-free files are globally SORT-REWRITTEN by the
    * chosen column. The shape is a real distributed sort (one partition
    * per input file feeding RDD.sortBy's range-partitioned shuffle into
    * ceil(rows/targetRows) writers, each emitting one file), so at 100 TB
    * this is the same plan Spark gives any sort: sampled range bounds, no
    * driver-side row traffic. Each output file owns a contiguous slice of
    * the key space — per-file bounds are disjoint (a run of EQUAL keys
    * can straddle a boundary, touching at that one value, exactly like
    * Delta's clustering), so a key-predicate scan plans FEWER files after
    * OPTIMIZE than before, and the per-file bounds are recomputed from
    * the rows actually written (exact, never the carried union). Files
    * with deletion vectors are carried, as in bin-packing: materializing
    * masks is rewrite_dvs's job. The sort key is the full (key, rest…)
    * triple, so output content is deterministic, not just the ranges. */
  private def compactClustered(spark: SparkSession, fs: FileSystem,
                               dir: Path, full: Manifest, targetRows: Long,
                               key: String): CompactStats = {
    val keyFn: ((Long, Long, Long)) => (Long, Long, Long) = key match {
      case "id" => identity
      case "k" => t => (t._2, t._1, t._3)
      case "v" => t => (t._3, t._1, t._2)
      case other => throw new IllegalArgumentException(
        s"cluster_by must be one of id|k|v, got '$other'")
    }
    val base = full.version
    val cur = full.files
    val (small, large) = cur.sortBy(_.name)
      .partition(e => e.rows < targetRows && e.dv.isEmpty)
    // A lone under-target file gains nothing from a self-sort that the
    // manifest can see (its BOUNDS are already its own); same no-op
    // contract as bin-packing's bin-of-one.
    if (small.size < 2) return CompactStats(cur.size, cur.size, 0, base)
    val conf = hadoopConf()
    val dirStr = dir.toString
    val nOut = math.max(1, math.ceil(
      small.map(_.rows).sum.toDouble / targetRows).toInt)
    val entries = spark.sparkContext
      .parallelize(small, math.max(1, math.min(small.size,
        spark.sparkContext.defaultParallelism)))
      .flatMap(e => readRowsPlain(conf, dirStr, e))
      .sortBy(keyFn, ascending = true, numPartitions = nOut)
      .mapPartitions(it => writeRowsFile(conf, dirStr, "part-clu", it))
      .collect().toSeq
    publishExclusive(fs, dir, base, large ++ entries, full.txn)
    CompactStats(cur.size, large.size + entries.size, small.size, base + 1)
  }

  /** All rows of a vector-free data file, manifest-bounded (EOF before
    * `rows` triples is corruption). Bounded per input by the compaction
    * target: callers only pass under-target files. */
  private def readRowsPlain(conf: SerializableConfiguration, dir: String,
                            e: FileEntry): Array[(Long, Long, Long)] = {
    require(e.dv.isEmpty, s"readRowsPlain on a vectored file: ${e.name}")
    val d = new Path(dir)
    val fs = d.getFileSystem(conf.value)
    val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
      fs.open(new Path(d, e.name))))
    try {
      require(in.readInt() == Magic && in.readInt() == Version,
        s"not an mlog file: ${e.name}")
      Array.fill(e.rows.toInt)((in.readLong(), in.readLong(), in.readLong()))
    } finally in.close()
  }

  /** One task's sorted-slice write: stream the partition's rows into one
    * fresh data file, tracking exact (id, k, v) bounds as written. An
    * empty partition (range sampling can under-fill) emits nothing. */
  private def writeRowsFile(conf: SerializableConfiguration, dir: String,
                            prefix: String, it: Iterator[(Long, Long, Long)])
      : Iterator[FileEntry] = {
    if (!it.hasNext) return Iterator.empty
    val d = new Path(dir)
    val fs = d.getFileSystem(conf.value)
    val name = s"$prefix-${UUID.randomUUID()}.mlog"
    val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
      fs.create(new Path(d, name), false)))
    var rows = 0L
    var minId, maxId, minK, maxK, minV, maxV = 0L
    try {
      out.writeInt(Magic); out.writeInt(Version)
      it.foreach { case (id, k, v) =>
        if (rows == 0L) {
          minId = id; maxId = id; minK = k; maxK = k; minV = v; maxV = v
        } else {
          if (id < minId) minId = id; if (id > maxId) maxId = id
          if (k < minK) minK = k; if (k > maxK) maxK = k
          if (v < minV) minV = v; if (v > maxV) maxV = v
        }
        out.writeLong(id); out.writeLong(k); out.writeLong(v)
        rows += 1
      }
    } finally out.close()
    Iterator.single(FileEntry(name, rows, minId, maxId, minK, maxK,
      bytes = 8L + 24L * rows, vb = Some((minV, maxV))))
  }

  /** One task's bin merge: header, then each input's payload copied
    * byte-for-byte (exactly rows×24 bytes — the manifest, not EOF,
    * bounds each copy). */
  private def mergeBin(conf: SerializableConfiguration, dir: String,
                       bin: Seq[FileEntry]): FileEntry = {
    val d = new Path(dir)
    val fs = d.getFileSystem(conf.value)
    val name = s"part-cmp-${UUID.randomUUID()}.mlog"
    val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
      fs.create(new Path(d, name), false)))
    try {
      out.writeInt(Magic); out.writeInt(Version)
      val buf = new Array[Byte](1 << 16)
      bin.foreach { e =>
        val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
          fs.open(new Path(d, e.name))))
        try {
          require(in.readInt() == Magic && in.readInt() == Version,
            s"not an mlog file: ${e.name}")
          var left = e.rows * 24L
          while (left > 0) {
            val n = in.read(buf, 0, math.min(left, buf.length.toLong).toInt)
            require(n > 0, s"truncated mlog file ${e.name}")
            out.write(buf, 0, n)
            left -= n
          }
        } finally in.close()
      }
    } finally out.close()
    val rows = bin.map(_.rows).sum
    // v bounds are manifest algebra too — but only when EVERY input
    // carries them (one legacy unbounded input makes the union unbounded).
    val vb = if (bin.forall(_.vb.isDefined))
      Some((bin.map(_.vb.get._1).min, bin.map(_.vb.get._2).max)) else None
    FileEntry(name, rows, bin.map(_.minId).min,
      bin.map(_.maxId).max, bin.map(_.minK).min, bin.map(_.maxK).max,
      bytes = 8L + 24L * rows, vb = vb)
  }

  private[v2] def hadoopConf(): SerializableConfiguration =
    new SerializableConfiguration(
      SparkSession.active.sessionState.newHadoopConf())

  private[v2] def pathOf(options: Map[String, String]): Path = {
    val p = options.get("path").map(_.trim).filter(_.nonEmpty)
    new Path(p.getOrElse(throw new IllegalArgumentException(
      "mlog needs a path: .format(\"mlog\").save(dir) / .load(dir)")))
  }
}

object MLogTable {
  /** `timestampAsOf` option value -> epoch ms. Accepted shapes, in try
    * order: all-digits epoch MILLISECONDS — but only at a plausible
    * width (10–13 digits, ~Nov 1970 through ~Nov 2286), so a compact
    * digit-only date like `20260816` (8 digits) OR a compact datetime
    * like `20260816120000` (14 digits, would read as ~year 2612) raises
    * a PARSE error instead of silently reading as a wildly-off epoch-ms
    * and surfacing as a baffling "predates the first retained snapshot"
    * / "no snapshot" refusal; ISO-8601 carrying a zone or offset
    * (`2026-08-16T12:00:00Z`); zone-less SQL/ISO date or datetime, read
    * as UTC. */
  private[v2] def parseTsMs(t: String): Long =
    if (t.length >= 10 && t.length <= 13 && t.forall(_.isDigit)) t.toLong
    else try java.time.Instant.parse(t).toEpochMilli
    catch {
      case _: java.time.format.DateTimeParseException =>
        val local =
          try java.time.LocalDateTime.parse(t.replace(' ', 'T'))
          catch {
            case _: java.time.format.DateTimeParseException =>
              java.time.LocalDate.parse(t).atStartOfDay()
          }
        local.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
    }
}

class MLogTable(properties: JMap[String, String])
  extends Table with SupportsRead with SupportsWrite
  with org.apache.spark.sql.connector.catalog.SupportsDelete
  with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns
  with org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations {

  import scala.jdk.CollectionConverters._

  override def name(): String = "mlog"
  override def schema(): StructType = MLog.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
      TableCapability.TRUNCATE)

  /** A time-travel (or diff) load must never be a mutation target. */
  private def pinnedRead: Boolean = properties.asScala.keys.exists(k =>
    k.equalsIgnoreCase("versionAsOf") || k.equalsIgnoreCase("changesSince") ||
      k.equalsIgnoreCase("timestampAsOf"))

  /** `_file` (Iceberg's metadata column of the same name): which data
    * file a row lives in — selectable from any scan, and the group key
    * SQL row-level commands rewrite by. NOT preserved through row-level
    * rewrites: the replace-data write takes exactly the ledger schema. */
  override def metadataColumns()
      : Array[org.apache.spark.sql.connector.catalog.MetadataColumn] =
    Array(new org.apache.spark.sql.connector.catalog.MetadataColumn {
      override def name(): String = MLog.FileColumn
      override def dataType(): org.apache.spark.sql.types.DataType =
        org.apache.spark.sql.types.StringType
      override def isNullable(): Boolean = false
      override def comment(): String = "data file this row lives in"
      override def metadataInJSON(): String =
        """{"__preserve_on_delete": false, "__preserve_on_update": false,
          | "__preserve_on_reinsert": false}""".stripMargin
    })

  /** Metadata-only DELETE (`SupportsDelete`, Iceberg's fast path): a
    * WHERE whose every node evaluates exactly over the ledger triple AND
    * whose top-level conjuncts include at least one manifest-prunable
    * id/k bound runs through [[MLog.delete]] — manifest-pruned
    * copy-on-write, no query executed. A predicate with no id/k
    * bound (e.g. only on `v`, or an Or/In tree) is DECLINED even though
    * it is exactly evaluable: legacy entries carry no `v` bounds, so
    * `mayMatch` could mark every file touched and this "fast path" would
    * byte-rewrite files containing zero matches, where the group-based
    * rewrite below (runtime `_file` group filtering) touches only the
    * files that actually contain matches. (An id/k-bounded delete still
    * prunes on `v` bounds too, where the entries carry them.) The one trivial
    * shape, an unqualified DELETE (all AlwaysTrue), IS taken: it
    * publishes an empty manifest directly — O(1), no row read; the
    * superseded files age out through expire + vacuum exactly like an
    * overwrite's. Spark's OptimizeMetadataOnlyDeleteFromTable asks
    * [[canDeleteWhere]] first and falls back to the group-based
    * row-level rewrite when this path declines. */
  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    !pinnedRead && filters.forall(MLogFilterEval.evaluable) &&
      (filters.forall(_.isInstanceOf[org.apache.spark.sql.sources.AlwaysTrue]) ||
        filters.exists(f => MLogScanBuilder.bound(f).exists(_._1 != "v")))

  override def deleteWhere(filters: Array[Filter]): Unit = {
    val spark = SparkSession.active
    val p = MLog.pathOf(properties.asScala.toMap)
    if (filters.forall(_.isInstanceOf[org.apache.spark.sql.sources.AlwaysTrue])) {
      // Unqualified DELETE = manifest truncate: one snapshot commit
      // naming zero files, zero rows read.
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      val full = MLog.readManifestFull(fs, p)
      if (full.files.nonEmpty)
        MLog.publishExclusive(fs, p, full.version, Seq.empty, full.txn)
    } else {
      MLog.delete(spark, p,
        e => filters.forall(f => MLogScanBuilder.accepts(e, f)),
        (id, k, v) =>
          filters.forall(f => MLogFilterEval.eval(f, id, k, v))): Unit
    }
  }

  /** Group-based row-level operations (`SupportsRowLevelOperations`) —
    * what makes SQL `DELETE`/`UPDATE`/`MERGE INTO` against an mlog table
    * plan through Spark's own RewriteDeleteFromTable / RewriteUpdateTable
    * / RewriteMergeIntoTable: the rewrite reads the affected GROUPS
    * (files, runtime-filtered via `_file`), recomputes their rows, and
    * [[MLogReplaceDataWrite]] swaps exactly those files in one snapshot
    * commit. See [[MLogRowLevelOperation]]. */
  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
      : org.apache.spark.sql.connector.write.RowLevelOperationBuilder = {
    require(!pinnedRead,
      "mlog row-level operations target the CURRENT table state; a " +
        "versionAsOf/changesSince load is a pinned read, not a mutation " +
        "target")
    () => new MLogRowLevelOperation(
      MLog.pathOf(properties.asScala.toMap).toString, MLog.hadoopConf(),
      info.command())
  }

  private def merged(options: CaseInsensitiveStringMap): Map[String, String] = {
    val m = new java.util.HashMap[String, String](properties)
    options.asCaseSensitiveMap().forEach((k, v) => m.put(k, v))
    m.asScala.toMap
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val m = merged(options)
    // Time travel: .option("versionAsOf", n) plans from snapshot n's
    // manifest instead of the current pointer; .option("timestampAsOf",
    // ts) resolves ts to a version the same way the catalog's TIMESTAMP
    // AS OF does ([[MLog.resolveTimestamp]]: newest snapshot <= ts,
    // loud before-first refusal) — Delta ships both options under these
    // names. ts is epoch MILLISECONDS (all digits), ISO-8601 with a
    // zone/offset, or a zone-less `yyyy-MM-dd[ HH:mm:ss[.S]]` read as
    // UTC (the library pins the session zone to UTC; a zone-less string
    // must not silently depend on the JVM default).
    val tsOf = m.collectFirst {
      case (k, v) if k.equalsIgnoreCase("timestampAsOf") => v.trim
    }
    val explicitVersion = m.collectFirst {
      case (k, v) if k.equalsIgnoreCase("versionAsOf") => v.trim.toInt
    }
    require(explicitVersion.isEmpty || tsOf.isEmpty,
      "mlog takes versionAsOf OR timestampAsOf, not both")
    val version = explicitVersion.orElse(tsOf.map { t =>
      val p = MLog.pathOf(m)
      MLog.resolveTimestamp(p.getFileSystem(MLog.hadoopConf().value), p,
        MLogTable.parseTsMs(t))
    })
    // Incremental read: .option("changesSince", n) plans ONLY the files
    // the end manifest (current, or versionAsOf's) names that snapshot n
    // does not — the appended data, without rescanning history.
    val since = m.collectFirst {
      case (k, v) if k.equalsIgnoreCase("changesSince") => v.trim.toInt
    }
    // Streaming-read relaxation (Delta's option of the same name): accept
    // rewritten files re-surfacing instead of failing on non-append
    // changes between snapshots.
    val ignoreChanges = m.exists { case (k, v) =>
      k.equalsIgnoreCase("ignoreChanges") && v.trim.equalsIgnoreCase("true")
    }
    // Streaming admission control (Delta's maxFilesPerTrigger shape):
    // bound a micro-batch by snapshot versions and/or added files; see
    // [[MLogMicroBatchStream]]. Batch reads ignore both.
    val maxVersions = m.collectFirst {
      case (k, v) if k.equalsIgnoreCase("maxVersionsPerTrigger") => v.trim.toInt
    }
    val maxFiles = m.collectFirst {
      case (k, v) if k.equalsIgnoreCase("maxFilesPerTrigger") => v.trim.toInt
    }
    val maxBytes = m.collectFirst {
      case (k, v) if k.equalsIgnoreCase("maxBytesPerTrigger") => v.trim.toLong
    }
    new MLogScanBuilder(MLog.pathOf(m), MLog.hadoopConf(), version, since,
      ignoreChanges, maxVersions, maxFiles, maxBytes)
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val s = info.schema()
    require(s.fields.map(f => (f.name, f.dataType)).toSeq ==
      MLog.Schema.fields.map(f => (f.name, f.dataType)).toSeq,
      s"mlog writes the fixed ledger schema (id, k, v: BIGINT); got ${s.simpleString}")
    val m = merged(info.options())
    // Idempotent-writer options (Delta's txnAppId/txnVersion): the commit
    // records (appId -> version) in the manifest's transaction ledger and
    // REFUSES a version the ledger has already seen — the exactly-once
    // contract a replayed streaming foreachBatch relies on.
    val app = m.collectFirst {
      case (k, v) if k.equalsIgnoreCase("txnAppId") => v
    }
    val ver = m.collectFirst {
      case (k, v) if k.equalsIgnoreCase("txnVersion") => v.trim.toLong
    }
    require(app.isDefined == ver.isDefined,
      "mlog txnAppId and txnVersion must be set together")
    new MLogWriteBuilder(MLog.pathOf(m), MLog.hadoopConf(),
      truncateFirst = false, txn = app.zip(ver).headOption,
      queryId = info.queryId())
  }
}

// ---------------------------------------------------------------- write

class MLogWriteBuilder(dir: Path, conf: SerializableConfiguration,
                       truncateFirst: Boolean,
                       txn: Option[(String, Long)] = None,
                       queryId: String = "")
  extends WriteBuilder with SupportsTruncate {

  override def truncate(): WriteBuilder =
    new MLogWriteBuilder(dir, conf, truncateFirst = true, txn, queryId)

  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      MLogBatchWrite(dir.toString, conf, truncateFirst, txn)
    // Native streaming sink (`df.writeStream.format("mlog")` — the Delta
    // ingest idiom, STREAMING_WRITE): identity is (queryId, epochId).
    // The engine's queryId is the StreamingQuery's STABLE id (persisted
    // in the checkpoint, unchanged across restarts), so a replayed epoch
    // after a commit-then-crash restart hits the same ledger slot the
    // original commit recorded — exactly-once without the user wiring
    // txnAppId/txnVersion through foreachBatch (that route still exists
    // for multi-sink batches; its options are batch-write-only).
    override def toStreaming
        : org.apache.spark.sql.connector.write.streaming.StreamingWrite =
      MLogStreamingWrite(dir.toString, conf, truncateFirst,
        s"mlog-stream-$queryId")
  }
}

/** Epoch-committed streaming sink: each micro-batch's staged files
  * publish through [[MLog.commitAppend]] with (appId, epochId) recorded
  * in the manifest's transaction ledger — ONE atomic snapshot per epoch,
  * Delta's streaming-sink shape. A replayed epoch (sink committed, the
  * checkpoint didn't advance, the restart re-runs it) is REFUSED by the
  * ledger and its staged files are deleted — the exactly-once contract,
  * native instead of via foreachBatch. OutputMode.Complete arrives as
  * `truncate()` on the builder: every epoch then replaces the table
  * (prior snapshots keep serving history until retention). */
case class MLogStreamingWrite(dir: String, conf: SerializableConfiguration,
                              truncateEachEpoch: Boolean, appId: String)
  extends org.apache.spark.sql.connector.write.streaming.StreamingWrite
  with org.apache.spark.internal.Logging {

  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.streaming
        .StreamingDataWriterFactory =
    MLogStreamingWriterFactory(dir, conf)

  override def commit(epochId: Long,
                      messages: Array[WriterCommitMessage]): Unit = {
    val d = new Path(dir)
    val fs = d.getFileSystem(conf.value)
    fs.mkdirs(d)
    val fresh = messages.toSeq.collect {
      case m: MLogCommit if m.name != null => m.entry
    }
    if (!MLog.commitAppend(fs, d, fresh, Some((appId, epochId)),
        truncateEachEpoch)) {
      logInfo(s"mlog streaming sink: epoch $epochId of $appId already in " +
        s"the ledger (a replay); dropping ${fresh.size} staged files")
      abort(epochId, messages)
    }
  }

  override def abort(epochId: Long,
                     messages: Array[WriterCommitMessage]): Unit =
    MLogBatchWrite(dir, conf, truncateFirst = false).abort(messages)
}

case class MLogStreamingWriterFactory(dir: String,
                                      conf: SerializableConfiguration)
  extends org.apache.spark.sql.connector.write.streaming
    .StreamingDataWriterFactory {
  // The batch writer is epoch-safe as-is: staged names are attempt-unique
  // (partition, task, uuid), and nothing references a staged file until
  // its epoch's commit publishes it.
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    MLogWriterFactory(dir, conf).createWriter(partitionId, taskId)
}

/** Driver-side commit: publish the manifest naming exactly the files the
  * committed tasks reported. Until the rename lands, readers see the OLD
  * manifest — the atomic-visibility contract. With a `txn` identity, the
  * commit is IDEMPOTENT: a (txnAppId, txnVersion) the ledger has already
  * recorded publishes NOTHING — the staged files are deleted exactly as
  * an abort would, and the table state (data AND ledger, one manifest)
  * is untouched. This is what makes a replayed streaming batch a no-op
  * instead of a duplicate append. */
case class MLogBatchWrite(dir: String, conf: SerializableConfiguration,
                          truncateFirst: Boolean,
                          txn: Option[(String, Long)] = None)
  extends BatchWrite with org.apache.spark.internal.Logging {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    MLogWriterFactory(dir, conf)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val d = new Path(dir)
    val fs = d.getFileSystem(conf.value)
    fs.mkdirs(d)
    val fresh = messages.toSeq.collect {
      case m: MLogCommit if m.name != null => m.entry
    }
    // Optimistically-concurrent commit: commitAppend loops
    // read → replay-check → re-merge → CAS-publish, so a lost race
    // re-merges against the NEW state (an append's fresh files stay
    // valid under any concurrent commit). A txn-ledger refusal returns
    // false — the staged files are dropped exactly as an abort would.
    if (!MLog.commitAppend(fs, d, fresh, txn, truncateFirst)) {
      logInfo(s"mlog commit refused: txn $txn already in the ledger; " +
        s"dropping ${fresh.size} staged files")
      abort(messages)
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val d = new Path(dir)
    val fs = d.getFileSystem(conf.value)
    messages.foreach {
      case m: MLogCommit if m.name != null =>
        fs.delete(new Path(d, m.name), false): Unit
      case _ => ()
    }
  }
}

case class MLogCommit(name: String, rows: Long, minId: Long, maxId: Long,
                      minK: Long, maxK: Long,
                      minV: Long = 0L, maxV: Long = 0L)
  extends WriterCommitMessage {
  def entry: MLog.FileEntry =
    MLog.FileEntry(name, rows, minId, maxId, minK, maxK,
      bytes = 8L + 24L * rows, vb = Some((minV, maxV)))
}

case class MLogWriterFactory(dir: String, conf: SerializableConfiguration)
  extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      // Unique per task ATTEMPT: a zombie attempt can never collide with
      // the committed one, and uncommitted files are unreferenced anyway.
      private val name =
        f"part-$partitionId%05d-$taskId-${UUID.randomUUID()}.mlog"
      private val d = new Path(dir)
      private val fs = d.getFileSystem(conf.value)
      private var out: java.io.DataOutputStream = _
      private var rows = 0L
      private var minId, maxId, minK, maxK, minV, maxV = 0L

      override def write(row: InternalRow): Unit = {
        require(!row.isNullAt(0) && !row.isNullAt(1) && !row.isNullAt(2),
          "mlog ledger rows must be fully non-null")
        if (out == null) { // empty partitions create no file at all
          fs.mkdirs(d)
          out = new java.io.DataOutputStream(
            new java.io.BufferedOutputStream(fs.create(new Path(d, name), false)))
          out.writeInt(MLog.Magic); out.writeInt(MLog.Version)
        }
        val id = row.getLong(0); val k = row.getLong(1); val v = row.getLong(2)
        if (rows == 0L) {
          minId = id; maxId = id; minK = k; maxK = k; minV = v; maxV = v
        } else {
          if (id < minId) minId = id; if (id > maxId) maxId = id
          if (k < minK) minK = k; if (k > maxK) maxK = k
          if (v < minV) minV = v; if (v > maxV) maxV = v
        }
        out.writeLong(id); out.writeLong(k); out.writeLong(v)
        rows += 1
      }

      override def commit(): WriterCommitMessage = {
        if (out != null) out.close()
        MLogCommit(if (rows > 0) name else null, rows, minId, maxId, minK,
          maxK, minV, maxV)
      }

      override def abort(): Unit = {
        if (out != null) { out.close(); fs.delete(new Path(d, name), false): Unit }
      }

      override def close(): Unit = ()
    }
}

// ----------------------------------------------------------------- read

class MLogScanBuilder(dir: Path, conf: SerializableConfiguration,
                      version: Option[Int] = None,
                      changesSince: Option[Int] = None,
                      ignoreChanges: Boolean = false,
                      maxVersionsPerTrigger: Option[Int] = None,
                      maxFilesPerTrigger: Option[Int] = None,
                      maxBytesPerTrigger: Option[Long] = None)
  extends ScanBuilder with SupportsPushDownFilters
  with SupportsPushDownRequiredColumns
  with org.apache.spark.sql.connector.read.SupportsPushDownAggregates
  with org.apache.spark.sql.connector.read.SupportsPushDownLimit {

  private var required: StructType = MLog.Schema
  private var prunable: Array[Filter] = Array.empty
  private var sawFilters = false
  private var aggValues: Option[Seq[Long]] = None
  private var aggSchema: StructType = _
  private var limit: Option[Int] = None

  /** LIMIT pushdown, PARTIAL (`isPartiallyPushed` stays true — the
    * engine keeps its own Limit; this is an I/O bound, not a semantic
    * one): with no filters in play, a `LIMIT n` needs at most the file
    * PREFIX whose logical rows reach n — the other files are never
    * planned, never opened. At 100 TB a `SELECT * … LIMIT 100` plans one
    * file instead of the table's million. Declined defensively when any
    * filter was offered (rows are filtered after the scan, so no file
    * count bounds the surviving rows — the engine does not push a limit
    * through residual filters anyway). */
  override def pushLimit(n: Int): Boolean = {
    limit = Some(n)
    true
  }

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    sawFilters = filters.nonEmpty
    prunable = filters.filter(f => MLogScanBuilder.bound(f).isDefined)
    filters // ALL filters stay residual: min/max pruning is inexact
  }

  override def pushedFilters(): Array[Filter] = prunable

  /** The planned file set, memoized: one manifest read serves the
    * aggregate translation AND build(), so the two can never disagree
    * about table state (a commit landing between them would otherwise
    * let a pushed COUNT answer for a different snapshot than the scan
    * plans). Incremental read = manifest DIFF by NAME: files the end
    * state names that the base snapshot does not (append-only lineage;
    * an intervening overwrite or compaction replaces files wholesale, so
    * its diff is the whole new layout — correct, just not an increment;
    * rewritten files surface fully, like Iceberg's incremental scan).
    * LIMITATION, documented: a merge-on-read delete re-vectors a file IN
    * PLACE (same name, new .dvec), so a DV-only change does NOT surface
    * here — changesSince answers "what data was ADDED", not "what rows
    * were deleted"; a deletion-aware consumer diffs manifests itself or
    * streams with ignoreChanges, which re-delivers changed entries. */
  private lazy val planned: Seq[MLog.FileEntry] = {
    val fs = dir.getFileSystem(conf.value)
    val end = version match {
      case Some(v) => MLog.readManifestVersion(fs, dir, v)
      case None => MLog.readManifest(fs, dir)
    }
    changesSince match {
      case Some(base) =>
        val baseNames =
          MLog.readManifestVersion(fs, dir, base).map(_.name).toSet
        end.filterNot(e => baseNames(e.name))
      case None => end
    }
  }

  /** METADATA-ONLY aggregates (`SupportsPushDownAggregates`, the
    * Delta/Iceberg stats-answered COUNT): an unfiltered, ungrouped
    * COUNT(*) / COUNT(col) / MIN / MAX over the ledger columns is
    * answered from the manifest — zero data files opened, O(manifest)
    * on the driver, and at 100 TB the difference between a metadata
    * lookup and a full-table scan. Sound because the manifest is exact:
    * logical row counts carry the DV adjustment, so COUNT pushes even
    * on vectored tables; per-file min/max bound PHYSICAL rows, so a
    * MIN/MAX pushes exactly when some file ATTAINING the global extreme
    * is vector-free (its bound row is live and unbeatable — most
    * post-delete tables keep pushing; only an extreme held solely by
    * vectored files declines). MIN/MAX(`v`) additionally needs every
    * planned entry to carry v bounds (legacy entries do not). COUNT(col)
    * == COUNT(*) because ledger columns are non-null by construction.
    * Any filter, grouping, DISTINCT, or other function declines — the
    * ordinary scan path serves it. */
  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean = translate(agg).isDefined

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean = {
    aggValues = translate(agg)
    // A completely-pushed scan must REPORT the aggregate's output schema
    // itself (the engine maps its attributes positionally onto it; it
    // does not re-prune columns after the push).
    if (aggValues.isDefined)
      aggSchema = StructType(agg.aggregateExpressions().map(f =>
        StructField(f.toString, LongType, nullable = false)))
    aggValues.isDefined
  }

  private def translate(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Option[Seq[Long]] = {
    import org.apache.spark.sql.connector.expressions.aggregate.{
      Count, CountStar, Max, Min}
    import org.apache.spark.sql.connector.expressions.{
      Expression => VExpr, NamedReference}
    if (sawFilters || agg.groupByExpressions.nonEmpty) return None
    if (planned.isEmpty) return None // empty table: MIN/MAX are null —
                                     // let the ordinary path produce them
    def colOf(e: VExpr): Option[String] = e match {
      case n: NamedReference if n.fieldNames().length == 1 &&
          Seq("id", "k", "v").contains(n.fieldNames().head) =>
        Some(n.fieldNames().head)
      case _ => None
    }
    // Per-file (min, max) for a ledger column — None when any planned
    // entry lacks it (a legacy entry's `v` bounds), which declines the
    // push: an unbounded file could hold the true extreme.
    def rangeOf(e: MLog.FileEntry, col: String): Option[(Long, Long)] =
      col match {
        case "id" => Some((e.minId, e.maxId))
        case "k" => Some((e.minK, e.maxK))
        case _ => e.vb
      }
    // MIN/MAX push DV-aware, per extreme: per-file bounds cover PHYSICAL
    // rows, so the global physical extreme is EXACT AND ATTAINED exactly
    // when some file attaining it carries no deletion vector (its bound
    // row is live; no other file can beat it). A vectored table whose
    // extreme sits in a vector-free file still pushes — only an extreme
    // attained solely by vectored files declines (the mask could hide
    // the bound row, making the true extreme unknowable from metadata).
    def extreme(col: String, isMin: Boolean): Option[Long] = {
      val ranges = planned.map(e => rangeOf(e, col).map(r =>
        (e, if (isMin) r._1 else r._2)))
      if (ranges.exists(_.isEmpty)) return None
      val vs = ranges.flatten
      val x = if (isMin) vs.map(_._2).min else vs.map(_._2).max
      if (vs.exists(p => p._2 == x && p._1.dv.isEmpty)) Some(x) else None
    }
    val rows = planned.map(_.logicalRows).sum
    val vals = agg.aggregateExpressions().map {
      case _: CountStar => Some(rows)
      case c: Count if !c.isDistinct && colOf(c.column).isDefined =>
        Some(rows) // non-null by construction
      case m: Min => colOf(m.column).flatMap(extreme(_, isMin = true))
      case m: Max => colOf(m.column).flatMap(extreme(_, isMin = false))
      case _ => None
    }
    if (vals.forall(_.isDefined)) Some(vals.toSeq.map(_.get)) else None
  }

  override def build(): Scan = aggValues match {
    case Some(values) =>
      MLogAggScan(dir.toString, values, aggSchema)
    case None =>
      val survivors =
        planned.filter(e => prunable.forall(MLogScanBuilder.accepts(e, _)))
      // Limit-bounded file prefix — only when NO filter was offered
      // (filtered rows make any file-count bound unsound).
      val limited = limit match {
        case Some(n) if !sawFilters =>
          var need = n.toLong
          survivors.takeWhile { e =>
            val take = need > 0
            need -= e.logicalRows
            take
          }
        case _ => survivors
      }
      MLogScan(dir.toString, limited, planned.length, required, conf,
        prunable, ignoreChanges, maxVersionsPerTrigger, maxFilesPerTrigger,
        maxBytesPerTrigger)
  }
}

/** The one-row result of a manifest-answered aggregate: no data file is
  * opened — the partition carries the values. */
case class MLogAggPartition(values: Seq[Long]) extends InputPartition

case class MLogAggScan(dir: String, values: Seq[Long], required: StructType)
  extends Scan with Batch {
  require(required.fields.length == values.length,
    s"pushed aggregate schema ${required.simpleString} does not match " +
      s"${values.length} manifest-answered values")
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"mlog metadata-only aggregate [${required.fieldNames.mkString(",")}]"
  override def planInputPartitions(): Array[InputPartition] =
    Array(MLogAggPartition(values))
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition)
          : PartitionReader[InternalRow] = new PartitionReader[InternalRow] {
        private val vs = partition.asInstanceOf[MLogAggPartition].values
        private var served = false
        override def next(): Boolean = { val r = !served; served = true; r }
        override def get(): InternalRow =
          new GenericInternalRow(vs.map(v => v: Any).toArray)
        override def close(): Unit = ()
      }
    }
}

object MLogScanBuilder {
  /** (column, op, value) for the filter shapes manifest ranges can serve.
    * All three ledger columns qualify: id/k bounds have always been in
    * the manifest; `v` bounds exist on every entry written since the
    * field did (a legacy entry has NO v bounds and [[accepts]] keeps
    * it — pruning degrades, soundness does not). */
  private[graft] def bound(f: Filter): Option[(String, String, Long)] = f match {
    case EqualTo(a, v: java.lang.Long) if keyed(a) => Some((a, "=", v))
    case GreaterThan(a, v: java.lang.Long) if keyed(a) => Some((a, ">", v))
    case GreaterThanOrEqual(a, v: java.lang.Long) if keyed(a) => Some((a, ">=", v))
    case LessThan(a, v: java.lang.Long) if keyed(a) => Some((a, "<", v))
    case LessThanOrEqual(a, v: java.lang.Long) if keyed(a) => Some((a, "<=", v))
    case _ => None
  }
  private def keyed(a: String): Boolean = a == "id" || a == "k" || a == "v"

  /** File `e`'s manifest (min, max) for `col` — None when unknown (a
    * legacy entry's `v`), which every caller must treat as "keep". */
  private def rangeOf(e: MLog.FileEntry, col: String): Option[(Long, Long)] =
    col match {
      case "id" => Some((e.minId, e.maxId))
      case "k" => Some((e.minK, e.maxK))
      case _ => e.vb
    }

  private[graft] def accepts(e: MLog.FileEntry, f: Filter): Boolean =
    bound(f) match {
      case Some((col, op, v)) =>
        rangeOf(e, col) match {
          case Some((mn, mx)) => op match {
            case "=" => mn <= v && v <= mx
            case ">" => mx > v
            case ">=" => mx >= v
            case "<" => mn < v
            case "<=" => mn <= v
          }
          case None => true // unknown bounds: keep (residual re-applies)
        }
      case None => true
    }
}

/** Exact row-level evaluation of V1 source Filters over the ledger
  * triple — the metadata-only DELETE contract: [[evaluable]] accepts a
  * filter only when EVERY node of it is one this evaluator computes
  * exactly (boolean algebra over id/k/v comparisons with integral
  * literals), so `canDeleteWhere` never admits a predicate the rewrite
  * would approximate. The ledger columns are non-null by construction,
  * which pins the IsNull/IsNotNull answers. */
private[v2] object MLogFilterEval {
  import org.apache.spark.sql.sources.{
    AlwaysFalse, AlwaysTrue, And, EqualNullSafe, In, IsNotNull, IsNull,
    Not, Or}

  private def col(a: String): Boolean = a == "id" || a == "k" || a == "v"

  private def longOf(x: Any): Option[Long] = x match {
    case n: java.lang.Long => Some(n)
    case n: java.lang.Integer => Some(n.longValue)
    case n: java.lang.Short => Some(n.longValue)
    case n: java.lang.Byte => Some(n.longValue)
    case _ => None
  }

  def evaluable(f: Filter): Boolean = f match {
    case And(l, r) => evaluable(l) && evaluable(r)
    case Or(l, r) => evaluable(l) && evaluable(r)
    case Not(c) => evaluable(c)
    case EqualTo(a, x) => col(a) && longOf(x).isDefined
    case EqualNullSafe(a, x) => col(a) && longOf(x).isDefined
    case GreaterThan(a, x) => col(a) && longOf(x).isDefined
    case GreaterThanOrEqual(a, x) => col(a) && longOf(x).isDefined
    case LessThan(a, x) => col(a) && longOf(x).isDefined
    case LessThanOrEqual(a, x) => col(a) && longOf(x).isDefined
    case In(a, xs) => col(a) && xs.forall(x => longOf(x).isDefined)
    case IsNull(a) => col(a)
    case IsNotNull(a) => col(a)
    case _: AlwaysTrue => true
    case _: AlwaysFalse => true
    case _ => false
  }

  def eval(f: Filter, id: Long, k: Long, v: Long): Boolean = {
    def value(a: String): Long = a match {
      case "id" => id
      case "k" => k
      case _ => v
    }
    f match {
      case And(l, r) => eval(l, id, k, v) && eval(r, id, k, v)
      case Or(l, r) => eval(l, id, k, v) || eval(r, id, k, v)
      case Not(c) => !eval(c, id, k, v)
      case EqualTo(a, x) => value(a) == longOf(x).get
      case EqualNullSafe(a, x) => value(a) == longOf(x).get
      case GreaterThan(a, x) => value(a) > longOf(x).get
      case GreaterThanOrEqual(a, x) => value(a) >= longOf(x).get
      case LessThan(a, x) => value(a) < longOf(x).get
      case LessThanOrEqual(a, x) => value(a) <= longOf(x).get
      case In(a, xs) => xs.exists(x => longOf(x).contains(value(a)))
      case IsNull(_) => false // ledger rows are fully non-null
      case IsNotNull(_) => true
      case _: AlwaysTrue => true
      case _: AlwaysFalse => false
      case other => throw new IllegalArgumentException(
        s"unevaluable mlog delete filter $other — canDeleteWhere admits " +
          "only exactly-evaluable filter trees")
    }
  }
}

case class MLogPartition(path: String, rows: Long,
                         dvPath: Option[String], dvRows: Long)
  extends InputPartition

case class MLogScan(dir: String, files: Seq[MLog.FileEntry], total: Int,
                    required: StructType, conf: SerializableConfiguration,
                    prunable: Array[Filter] = Array.empty,
                    ignoreChanges: Boolean = false,
                    maxVersionsPerTrigger: Option[Int] = None,
                    maxFilesPerTrigger: Option[Int] = None,
                    maxBytesPerTrigger: Option[Long] = None)
  extends Scan with Batch with SupportsReportStatistics
  with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** RUNTIME file pruning (`SupportsRuntimeV2Filtering`) — dynamic
    * partition pruning, with the manifest playing the partition index:
    * when an mlog fact table joins a filtered dimension on `id`/`k`,
    * Spark plans a DynamicPruningSubquery over the (broadcast) build
    * side and hands its values here as an `IN` predicate at execution
    * time; files whose manifest min/max cannot contain any value are
    * dropped BEFORE their partitions are planned. Static pushdown prunes
    * on literals the query states; this prunes on values only the join
    * discovers — at 100 TB the difference between scanning the fact
    * table's key range and scanning the table. Narrowing is monotonic
    * (repeated calls intersect), and unrecognized predicate shapes are
    * ignored — keeping a file is always sound because every filter also
    * re-applies as a residual. */
  @volatile private var chosen: Seq[MLog.FileEntry] = files

  // Only the manifest-bounded columns the PRUNED schema still carries:
  // Spark resolves these against the scan's output, so advertising a
  // column this scan no longer reads fails analysis.
  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Seq("id", "k").filter(required.fieldNames.contains)
      .map(org.apache.spark.sql.connector.expressions.Expressions.column)
      .toArray

  override def filter(
      predicates: Array[org.apache.spark.sql.connector.expressions.filter
        .Predicate]): Unit =
    chosen = chosen.filter(e =>
      predicates.forall(p => MLogScan.mayMatch(e, p)))

  /** (files surviving runtime filtering, files the static plan held) —
    * the [[MLog.planned]]-style probe for DPP pins. */
  def runtimePlanned: (Int, Int) = (chosen.length, files.length)

  /** Exact table statistics FROM THE MANIFEST — no file I/O: the planned
    * (post-pruning) file set's logical row count (physical minus
    * DV-masked) and on-disk bytes. This is what lets Catalyst
    * auto-broadcast a small mlog side of a join (the manifest already
    * knows the answer a FileScan would estimate from footers), and it
    * reports the PRUNED set — a scan a predicate narrowed to one file
    * advertises one file's weight, so join strategy and AQE see the real
    * post-pruning cost, not the table's. */
  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(files.map(_.sizeBytes).sum)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.of(files.map(_.logicalRows).sum)
  }

  // Streaming read: micro-batches are manifest diffs between snapshot
  // versions ([[MLogMicroBatchStream]]); the batch-path file list above
  // is ignored — the stream replans per offset range. Column pruning,
  // manifest min/max pruning, and the per-trigger admission budgets flow
  // through unchanged.
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new MLogMicroBatchStream(dir, conf, required, prunable, ignoreChanges,
      maxVersionsPerTrigger, maxFilesPerTrigger, maxBytesPerTrigger)
  override def description(): String =
    s"mlog ${files.length}/$total files after manifest pruning, " +
      s"cols [${required.fieldNames.mkString(",")}]"

  override def planInputPartitions(): Array[InputPartition] =
    chosen.map(e =>
      MLogPartition(new Path(new Path(dir), e.name).toString, e.rows,
        e.dv.map(d => new Path(new Path(dir), d.name).toString),
        e.dv.fold(0L)(_.rows)): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    MLogReaderFactory(required.fieldNames.toSeq, conf)
}

object MLogScan {
  import org.apache.spark.sql.connector.expressions.{Literal, NamedReference}
  import org.apache.spark.sql.connector.expressions.filter.Predicate

  /** Can file `e` hold any row matching runtime predicate `p`? Sound
    * manifest-bounds algebra over the shapes DPP actually produces — an
    * `IN (v1…vn)` / `= v` on `id` or `k` (the broadcast side's key
    * values); every other shape answers true (kept; the residual filter
    * still applies row-level). */
  private[v2] def mayMatch(e: MLog.FileEntry, p: Predicate): Boolean = {
    def colOf(x: org.apache.spark.sql.connector.expressions.Expression)
        : Option[String] = x match {
      case n: NamedReference if n.fieldNames().length == 1 &&
          (n.fieldNames().head == "id" || n.fieldNames().head == "k") =>
        Some(n.fieldNames().head)
      case _ => None
    }
    def longOf(x: org.apache.spark.sql.connector.expressions.Expression)
        : Option[Long] = x match {
      case l: Literal[_] => l.value() match {
        case n: java.lang.Long => Some(n)
        case n: java.lang.Integer => Some(n.longValue)
        case n: java.lang.Short => Some(n.longValue)
        case n: java.lang.Byte => Some(n.longValue)
        case _ => None
      }
      case _ => None
    }
    def bounds(col: String): (Long, Long) =
      if (col == "id") (e.minId, e.maxId) else (e.minK, e.maxK)
    val ch = p.children()
    p.name() match {
      case "IN" if ch.nonEmpty && colOf(ch.head).isDefined =>
        val (mn, mx) = bounds(colOf(ch.head).get)
        val vs = ch.tail.map(longOf)
        // Any non-literal value makes the set unbound — keep the file.
        vs.exists(_.isEmpty) || vs.flatten.exists(v => mn <= v && v <= mx)
      case "=" if ch.length == 2 =>
        (colOf(ch.head), longOf(ch(1)), colOf(ch(1)), longOf(ch.head)) match {
          case (Some(c), Some(v), _, _) =>
            val (mn, mx) = bounds(c); mn <= v && v <= mx
          case (_, _, Some(c), Some(v)) =>
            val (mn, mx) = bounds(c); mn <= v && v <= mx
          case _ => true
        }
      case _ => true
    }
  }
}

case class MLogReaderFactory(fields: Seq[String],
                             conf: SerializableConfiguration)
  extends PartitionReaderFactory {

  /** VECTORIZED reads: the scan emits [[ColumnarBatch]]es, so the plan
    * above it is `ColumnarToRow` feeding whole-stage codegen — the same
    * shape Spark's parquet reader has, and the scan-path lever that
    * matters at 100 TB (per-row GenericInternalRow allocation becomes a
    * per-4096-rows vector fill; the row reader below is kept as the
    * contract-mandated fallback). The fixed 24-byte row makes the fill
    * trivial: one chunked readFully per batch, three strided getLongs
    * per row, deletion-vector positions skipped in the same pass. */
  override def supportColumnarReads(partition: InputPartition): Boolean = true

  private val BatchRows = 4096

  override def createColumnarReader(partition: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    import org.apache.spark.sql.execution.vectorized.{
      ConstantColumnVector, OnHeapColumnVector}
    import org.apache.spark.sql.types.{LongType, StringType}
    import org.apache.spark.sql.vectorized.{ColumnarBatch, ColumnVector}
    val p = partition.asInstanceOf[MLogPartition]
    new PartitionReader[ColumnarBatch] {
      private val path = new Path(p.path)
      private val fsys = path.getFileSystem(conf.value)
      private val in = new java.io.DataInputStream(
        new java.io.BufferedInputStream(fsys.open(path)))
      require(in.readInt() == MLog.Magic && in.readInt() == MLog.Version,
        s"not an mlog file: $path")
      private val masked: Array[Long] = p.dvPath match {
        case Some(dp) =>
          val dvp = new Path(dp)
          MLog.readDv(dvp.getFileSystem(conf.value), dvp.getParent,
            MLog.DvRef(dvp.getName, p.dvRows))
        case None => Array.empty[Long]
      }
      // One vector per required field; the `_file` metadata column is a
      // per-partition CONSTANT vector (the batch never copies the name).
      private val longs: Array[OnHeapColumnVector] =
        fields.filter(_ != MLog.FileColumn)
          .map(_ => new OnHeapColumnVector(BatchRows, LongType)).toArray
      private val cols: Array[ColumnVector] = {
        var li = -1
        fields.map {
          case MLog.FileColumn =>
            val c = new ConstantColumnVector(BatchRows, StringType)
            c.setUtf8String(org.apache.spark.unsafe.types.UTF8String
              .fromString(path.getName))
            c: ColumnVector
          case _ => li += 1; longs(li): ColumnVector
        }.toArray
      }
      // required-field -> triple position (id 0, k 1, v 2), `_file`
      // excluded (it has no slot in the 24-byte row).
      private val slots: Array[Int] = fields.filter(_ != MLog.FileColumn).map {
        case "id" => 0
        case "k" => 1
        case "v" => 2
        case other =>
          throw new IllegalArgumentException(s"unknown mlog field $other")
      }.toArray
      private val batch = new ColumnarBatch(cols)
      private val chunk = new Array[Byte](BatchRows * 24)
      private var read = 0L
      private var maskIdx = 0

      override def next(): Boolean = {
        if (read >= p.rows) return false
        val phys = math.min(BatchRows.toLong, p.rows - read).toInt
        in.readFully(chunk, 0, phys * 24)
        longs.foreach(_.reset())
        val bb = java.nio.ByteBuffer.wrap(chunk) // big-endian, the format
        var out = 0
        var i = 0
        while (i < phys) {
          if (maskIdx < masked.length && masked(maskIdx) == read + i) {
            maskIdx += 1 // deletion-vector masked: consumed, not surfaced
          } else {
            val base = i * 24
            var c = 0
            while (c < slots.length) {
              longs(c).putLong(out, bb.getLong(base + slots(c) * 8))
              c += 1
            }
            out += 1
          }
          i += 1
        }
        read += phys
        batch.setNumRows(out)
        // An all-masked chunk yields an EMPTY batch rather than recursing
        // to the next chunk — legal for consumers, simpler to reason
        // about (bounded work per next()).
        true
      }

      override def get(): org.apache.spark.sql.vectorized.ColumnarBatch = batch
      override def close(): Unit = in.close()
    }
  }

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[MLogPartition]
    new PartitionReader[InternalRow] {
      // required-field -> triple position (id 0, k 1, v 2); -1 is the
      // `_file` METADATA column (the data file's name — what row-level
      // runtime group filtering keys its rewrite groups on).
      private val slots: Array[Int] = fields.map {
        case "id" => 0
        case "k" => 1
        case "v" => 2
        case MLog.FileColumn => -1
        case other => throw new IllegalArgumentException(s"unknown mlog field $other")
      }.toArray
      private val path = new Path(p.path)
      private val fileName =
        org.apache.spark.unsafe.types.UTF8String.fromString(path.getName)
      private val fsys = path.getFileSystem(conf.value)
      private val in = new java.io.DataInputStream(
        new java.io.BufferedInputStream(fsys.open(path)))
      require(in.readInt() == MLog.Magic && in.readInt() == MLog.Version,
        s"not an mlog file: $path")
      // Deletion vector: sorted masked positions, walked in lockstep with
      // the physical row counter — O(1) per row, no hashing.
      private val masked: Array[Long] = p.dvPath match {
        case Some(dp) =>
          val dvp = new Path(dp)
          MLog.readDv(dvp.getFileSystem(conf.value), dvp.getParent,
            MLog.DvRef(dvp.getName, p.dvRows))
        case None => Array.empty[Long]
      }
      private var maskIdx = 0
      private var read = 0L
      private val triple = new Array[Long](3)
      private var current: InternalRow = _

      // The MANIFEST row count bounds the read — trailing bytes from a
      // longer orphaned attempt of the same name cannot exist (names are
      // attempt-unique), and EOF before `rows` is corruption: readLong
      // throws EOFException rather than silently under-reading. Rows the
      // deletion vector masks are consumed from the stream but never
      // surfaced.
      override def next(): Boolean = {
        while (read < p.rows) {
          triple(0) = in.readLong(); triple(1) = in.readLong()
          triple(2) = in.readLong()
          val pos = read
          read += 1
          if (maskIdx < masked.length && masked(maskIdx) == pos) maskIdx += 1
          else {
            val row = new GenericInternalRow(slots.length)
            var i = 0
            while (i < slots.length) {
              if (slots(i) < 0) row.update(i, fileName)
              else row.update(i, triple(slots(i)))
              i += 1
            }
            current = row
            return true
          }
        }
        false
      }

      override def get(): InternalRow = current
      override def close(): Unit = in.close()
    }
  }
}
