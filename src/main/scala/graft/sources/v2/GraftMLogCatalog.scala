package graft.sources.v2

import java.util.{Map => JMap}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{
  NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{
  Column, Identifier, ProcedureCatalog, StagedTable,
  StagingTableCatalog, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{
  BatchWrite, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo,
  Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** SQL TIME TRAVEL for mlog stores — the Delta-catalog shape: Spark's
  * parser produces `RelationTimeTravel` for `VERSION AS OF`, and its
  * resolution calls `TableCatalog.loadTable(ident, version)` on the
  * relation's catalog. The SESSION catalog refuses that call for
  * provider tables (`UNSUPPORTED_FEATURE.TIME_TRAVEL` — probed on this
  * Spark), which is exactly why Delta ships its own catalog; this is the
  * same move, minimally: a read-only path catalog registered under any
  * name via `spark.sql.catalog.<name> = graft.sources.v2.GraftMLogCatalog`
  * (catalogs instantiate lazily on first reference, so a LIVE session
  * can register it with `spark.conf.set` — no session rebuild, unlike an
  * injected parser).
  *
  * Addressing: `<catalog>.mlog.`/path/to/store`` — the namespace is the
  * fixed literal `mlog`, the (backquoted) table name is the store path.
  *
  *  - `SELECT … FROM graft.mlog.`/p`` plans from the CURRENT manifest —
  *    identical to `spark.read.format("mlog").load("/p")`.
  *  - `… VERSION AS OF n` loads the table pinned to snapshot n's
  *    manifest — identical to `.option("versionAsOf", n)`; an expired or
  *    never-committed version fails loudly at scan build.
  *  - `… TIMESTAMP AS OF ts` resolves to the NEWEST retained snapshot
  *    whose commit time (stamped into every snapshot manifest at publish;
  *    legacy snapshots fall back to the manifest file's mtime) is <= ts —
  *    Delta's reproducibility idiom ("the table as this morning's run
  *    saw it"), via [[MLog.resolveTimestamp]]. A timestamp before the
  *    first retained snapshot fails loudly: that state is unknown or
  *    expired, and silently serving the oldest would be a lie.
  *
  * Row-level SQL (`DELETE FROM` / `UPDATE` / `MERGE INTO`) works through
  * this catalog too — those commands mutate the TABLE, not the catalog,
  * and [[MLogTable]] carries the interfaces (`SupportsDelete`,
  * `SupportsRowLevelOperations`).
  *
  * WRITE-PATH DDL completes the SQL lifecycle (the Delta-on-a-path
  * shape):
  *  - `CREATE TABLE <cat>.mlog.`/p`` (id BIGINT, k BIGINT, v BIGINT)
  *    USING mlog` — publishes snapshot v1 with zero files, so the table
  *    EXISTS (a store exists iff its directory holds a manifest pointer
  *    or any committed snapshot; [[loadTable]] raises
  *    `NoSuchTableException` otherwise, which is what makes IF NOT
  *    EXISTS / CTAS existence checks work). The schema clause may be
  *    omitted or must equal the fixed ledger schema; PARTITIONED BY is
  *    refused (layout is the writer's repartitioning, pruning is
  *    manifest min/max).
  *  - `CREATE TABLE … USING mlog AS SELECT …` (CTAS) — ATOMIC, via
  *    `StagingTableCatalog` (the Delta/Iceberg shape): the SELECT's
  *    output is staged as ordinary unreferenced ledger files, and
  *    `commitStagedChanges` CAS-publishes snapshot v1 naming them — ONE
  *    commit, so a failure anywhere during the SELECT leaves NO table
  *    behind (`abortStagedChanges` deletes the staged files), and a
  *    racing creator loses the v1 slot loudly. `REPLACE TABLE … AS
  *    SELECT` / `CREATE OR REPLACE` stage the same way and publish one
  *    truncate-commit (base + 1 — history and the txn ledger survive,
  *    the pre-replace snapshot stays time-travelable, like Delta).
  *  - `INSERT INTO` / `INSERT OVERWRITE` — the table's own
  *    BATCH_WRITE/TRUNCATE capabilities; every insert is one snapshot
  *    commit.
  *  - `DROP TABLE` — removes exactly what the format OWNS (manifest
  *    pointer, snapshot manifests, `.mlog` data files, `.dvec` vectors,
  *    staging temps + checksum sidecars), then the directory if empty;
  *    foreign files are never touched and make the directory survive.
  * ALTER and RENAME stay refused: the schema is fixed by design and a
  * path-addressed table's name IS its location. */
class GraftMLogCatalog extends TableCatalog with ProcedureCatalog
  with StagingTableCatalog {

  import GraftMLogCatalog.DropOrphanGraceMs

  private var catalogName: String = _

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit =
    catalogName = name

  override def name(): String = catalogName

  override def listTables(namespace: Array[String]): Array[Identifier] =
    Array.empty // path-addressed: there is no enumerable table list

  private def fsOf(p: Path) =
    p.getFileSystem(SparkSession.active.sessionState.newHadoopConf())

  /** A store EXISTS iff its directory holds a manifest pointer or any
    * committed snapshot — the same predicate the destructive-maintenance
    * guard uses. A merely-created directory is not a table. */
  private def exists(path: String): Boolean = {
    val p = new Path(path)
    val fs = fsOf(p)
    fs.exists(new Path(p, MLog.ManifestName)) ||
      MLog.versions(fs, p).nonEmpty
  }

  override def loadTable(ident: Identifier): Table =
    table(ident, None)

  override def loadTable(ident: Identifier, version: String): Table =
    table(ident, Some(version))

  /** `TIMESTAMP AS OF`: Spark hands the evaluated timestamp in
    * MICROSECONDS since epoch; commit times are stored in ms, so the
    * resolution floor-divides (a ts inside a commit's millisecond counts
    * as at-or-after it). Resolution happens HERE, once — the loaded
    * table is the same pinned `versionAsOf` table the version route
    * builds, so everything downstream (pinned-read refusal for mutations,
    * scan build, pushdown) is shared, not re-implemented. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    requireNs(ident)
    if (!exists(ident.name())) throw new NoSuchTableException(ident)
    val p = new Path(ident.name())
    val v = MLog.resolveTimestamp(fsOf(p), p, Math.floorDiv(timestamp, 1000L))
    table(ident, Some(v.toString))
  }

  private def requireNs(ident: Identifier): Unit =
    require(ident.namespace().sameElements(Array("mlog")),
      s"$catalogName addresses stores as $catalogName.mlog.`/path`; got " +
        ident.toString)

  private def table(ident: Identifier, version: Option[String]): Table = {
    require(ident.namespace().sameElements(Array("mlog")),
      s"$catalogName addresses stores as $catalogName.mlog.`/path`; got " +
        ident.toString)
    // NoSuchTableException (not a generic error) is what makes the
    // engine's existence machinery work over this catalog: CREATE's
    // conflict check, IF NOT EXISTS, DROP TABLE IF EXISTS, CTAS.
    if (!exists(ident.name())) throw new NoSuchTableException(ident)
    val props = new java.util.HashMap[String, String]()
    props.put("path", ident.name())
    version.foreach { v =>
      require(v.trim.nonEmpty && v.trim.forall(_.isDigit),
        s"mlog VERSION AS OF takes a snapshot number, got '$v'")
      props.put("versionAsOf", v.trim): Unit
    }
    new MLogTable(props)
  }

  /** Table-maintenance stored procedures (`CALL graft.system.…` —
    * Spark 4's ProcedureCatalog, the Iceberg maintenance surface):
    * compact / expire_versions / vacuum, each returning its measured
    * stats as a one-row result. See [[MLogProcedures]]. */
  override def loadProcedure(ident: Identifier): UnboundProcedure = {
    // Unknown namespace/procedure raises Spark's own ROUTINE_NOT_FOUND
    // error class (this Spark ships no NoSuchProcedureException type), so
    // engine-level error handling and exists-style probes around CALL see
    // a standard condition, not a generic runtime error.
    def notFound(): Nothing =
      throw new org.apache.spark.sql.AnalysisException("ROUTINE_NOT_FOUND",
        Map("routineName" ->
          (s"`$catalogName`." + ident.namespace().map(n => s"`$n`")
            .mkString(".") + s".`${ident.name()}` (available: " +
            MLogProcedures.All.keys.toSeq.sorted
              .map(p => s"$catalogName.system.$p").mkString(", ") + ")")))
    if (!ident.namespace().sameElements(Array("system"))) notFound()
    MLogProcedures.All.getOrElse(ident.name().toLowerCase, notFound())
  }

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty || namespace.sameElements(Array("system")))
      MLogProcedures.All.keys.toSeq.sorted
        .map(Identifier.of(Array("system"), _)).toArray
    else Array.empty

  /** `CREATE TABLE … USING mlog` (and the create half of CTAS): publish
    * snapshot v1 naming zero files — the store now EXISTS (readers see an
    * empty table, writers append against v1) in exactly one atomic
    * manifest commit, racing creators collide on the v1 slot like any
    * other commit. The declared schema must be absent (plain
    * `CREATE TABLE t USING mlog`) or the fixed ledger triple. */
  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: JMap[String, String]): Table = {
    validateDdl(ident, schema, partitions, properties)
    val p = new Path(ident.name())
    // CAS-create: snapshot v1 with zero files. A racing creator (or any
    // commit) winning the v1 slot means the table exists — CREATE must
    // REPORT that, never absorb it the way an append retry would.
    if (!MLog.createEmpty(fsOf(p), p))
      throw new TableAlreadyExistsException(ident)
    loadTable(ident)
  }

  /** Shared DDL validation: namespace, no PARTITIONED BY, provider mlog,
    * and the fixed ledger schema (absent = plain `CREATE TABLE t USING
    * mlog`, or the triple). */
  private def validateDdl(ident: Identifier, schema: StructType,
                          partitions: Array[Transform],
                          properties: JMap[String, String]): Unit = {
    requireNs(ident)
    require(partitions.isEmpty,
      "mlog tables take no PARTITIONED BY: layout is the writer's " +
        "repartitioning, pruning is manifest min/max")
    val provider = Option(properties.get(TableCatalog.PROP_PROVIDER))
    require(provider.forall(_.equalsIgnoreCase("mlog")),
      s"$catalogName creates mlog tables only; got USING ${provider.get}")
    require(schema.isEmpty ||
        schema.fields.map(f => (f.name, f.dataType)).toSeq ==
          MLog.Schema.fields.map(f => (f.name, f.dataType)).toSeq,
      s"mlog tables have the fixed ledger schema (id, k, v: BIGINT); " +
        s"got ${schema.simpleString}")
  }

  /** ATOMIC CTAS/RTAS (`StagingTableCatalog`, the Delta/Iceberg shape):
    * the returned [[MLogStagedTable]] collects the SELECT's committed
    * task files WITHOUT publishing any manifest — the store does not
    * exist until `commitStagedChanges` publishes exactly one snapshot
    * (a v1 CAS for CREATE; a truncate-commit for REPLACE / CREATE OR
    * REPLACE, which therefore PRESERVES snapshot history and the txn
    * ledger). A failure during the SELECT aborts the staged files and
    * leaves no table — closing the two-commit window where a plain
    * create-then-append CTAS strands a committed empty table. */
  override def stageCreate(ident: Identifier, columns: Array[Column],
                           partitions: Array[Transform],
                           properties: JMap[String, String]): StagedTable =
    stage(ident, columns, partitions, properties, MLogStagedTable.Create)

  override def stageReplace(ident: Identifier, columns: Array[Column],
                            partitions: Array[Transform],
                            properties: JMap[String, String]): StagedTable = {
    // REPLACE (no OR CREATE) targets an EXISTING table; checked here so
    // the SELECT never runs against a typo'd path.
    if (!exists(ident.name())) throw new NoSuchTableException(ident)
    stage(ident, columns, partitions, properties, MLogStagedTable.Replace)
  }

  override def stageCreateOrReplace(ident: Identifier, columns: Array[Column],
                                    partitions: Array[Transform],
                                    properties: JMap[String, String])
      : StagedTable =
    stage(ident, columns, partitions, properties,
      MLogStagedTable.CreateOrReplace)

  private def stage(ident: Identifier, columns: Array[Column],
                    partitions: Array[Transform],
                    properties: JMap[String, String],
                    kind: MLogStagedTable.Kind): StagedTable = {
    // name + dataType are all the fixed-schema check reads (Spark's own
    // v2ColumnsToStructType is private[sql]).
    validateDdl(ident,
      StructType(columns.map(c =>
        org.apache.spark.sql.types.StructField(c.name, c.dataType,
          c.nullable)).toSeq),
      partitions, properties)
    new MLogStagedTable(ident, kind)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    refuse("ALTER TABLE",
      "the ledger schema (id, k, v: BIGINT) is fixed by design")

  /** `DROP TABLE`: delete exactly the files the format OWNS — manifest
    * pointer, snapshot manifests, data files, deletion vectors, staging
    * temps, and the local filesystem's `.crc` sidecars for any of those
    * — then the directory iff it is empty. Non-mlog files are never
    * touched. A path that is NOT a store returns false (no
    * NoSuchTableException from this method — Spark's own resolution
    * raises that before DropTableExec is reached), but first sweeps any
    * AGED format-suffixed orphans there (`.mlog`/`.dvec` older than the
    * 24 h [[DropOrphanGraceMs]]) — the collectable debris of a previous
    * gave-up drop; see the non-existent-table branch below. So a DROP on
    * a typo'd path CAN delete aged format-suffixed files at that path.
    * REACHABILITY: SQL `DROP TABLE [IF EXISTS]` resolves the table
    * BEFORE DropTableExec, so on a store-less path SQL stops at
    * resolution and never reaches this sweep — the debris is collectable
    * via a direct catalog-API `dropTable` call (or a DROP racing a
    * concurrent drop past its own resolution). `CALL
    * graft.system.vacuum` deliberately does NOT reach it either:
    * [[MLog.requireStore]] refuses destructive maintenance on
    * directories the format cannot prove it owns.
    *
    * Concurrent-committer fence: within each pass the LOG goes first
    * (pointer, then snapshots) so the store stops existing before its
    * data files do — a committer interleaving with the drop re-reads an
    * empty state rather than extending the one being deleted — and the
    * listing is REPEATED until a pass finds nothing owned, so a commit
    * that republished between the list and the deletes is swept rather
    * than left as a half-dropped store. A committer that keeps writing
    * FOREVER makes DROP fail loudly after bounded passes (like any
    * destructive maintenance, DROP under sustained concurrent writes is
    * an operator error — quiesce the writers, but the failed attempt's
    * data-only leftovers stay COLLECTABLE: a later DROP on a
    * no-longer-existing store sweeps aged orphan data files, below).
    *
    * Racing DROPs are idempotent: the directory vanishing between
    * passes (the other drop finished) means the table is dropped —
    * mission accomplished, return true — never an internal error. */
  override def dropTable(ident: Identifier): Boolean = {
    if (!ident.namespace().sameElements(Array("mlog"))) return false
    val p = new Path(ident.name())
    val fs = fsOf(p)
    def core(n: String): String =
      if (n.startsWith(".") && n.endsWith(".crc"))
        n.stripPrefix(".").stripSuffix(".crc") else n
    def isLog(n: String): Boolean = {
      val c = core(n)
      c == MLog.ManifestName || c.startsWith("_mlog_v") ||
        c.startsWith(".mlog_vtmp-") ||
        c.startsWith(s".${MLog.ManifestName}.tmp-")
    }
    def isData(n: String): Boolean = {
      val c = core(n)
      c.endsWith(".mlog") || c.endsWith(".dvec")
    }
    // Directory-gone is a terminal SUCCESS state for any listing below:
    // a racing drop (or rmdir) finished the job. The local filesystem
    // reports a just-unlinked directory as FileNotFound OR as
    // AccessDenied (File.list() returns null mid-unlink and Hadoop wraps
    // it) — any listing failure whose directory is in fact gone is the
    // same condition; a listing failure with the directory still there
    // is a real error and propagates.
    def listOwned(): Option[Array[org.apache.hadoop.fs.FileStatus]] =
      try Some(fs.listStatus(p).filter(st => st.isFile &&
        (isLog(st.getPath.getName) || isData(st.getPath.getName))))
      catch {
        case _: java.io.FileNotFoundException => None
        case e: java.io.IOException => if (!fs.exists(p)) None else throw e
      }
    if (!exists(ident.name())) {
      // Not a table — but a PREVIOUS drop that gave up under a sustained
      // concurrent writer can have left data files with no log (the log
      // goes first within each pass, so the store stopped existing
      // before its data did). Those orphans are unreachable through the
      // format forever; sweep the AGED ones here so the debris stays
      // collectable through the catalog. The age gate (same 24 h grace
      // as vacuum) protects an in-flight atomic CTAS, whose staged
      // ledger files are also data-with-no-log — but young.
      listOwned().foreach { owned =>
        val cutoff = System.currentTimeMillis() - DropOrphanGraceMs
        owned.filter(st => isData(st.getPath.getName) &&
            st.getModificationTime < cutoff)
          .foreach(st => fs.delete(st.getPath, false): Unit)
      }
      return false
    }
    var passes = 0
    var sweeping = true
    while (sweeping) {
      passes += 1
      val owned = listOwned().getOrElse(return true)
      require(passes <= 8 || owned.isEmpty,
        s"mlog DROP TABLE under $p found fresh store files on every one " +
          "of 8 sweep passes — a concurrent committer is still writing; " +
          "quiesce writers and retry (this attempt's data-only leftovers " +
          "are swept by a later DROP once aged past the orphan grace)")
      // Log before data within the pass: once the pointer and snapshots
      // are gone the table no longer EXISTS, so the data files deleted
      // after them were already unreachable through the format.
      val (log, data) = owned.partition(st => isLog(st.getPath.getName))
      (log ++ data).foreach(st => fs.delete(st.getPath, false): Unit)
      sweeping = owned.nonEmpty
    }
    // Best-effort rmdir: the TABLE is already gone. The directory can
    // vanish under the listing/delete (the racing drop got there first —
    // local-FS delete surfaces that as a generic IOException, not FNF)
    // or refill mid-call (a racing creator); neither failure un-drops.
    try if (fs.listStatus(p).isEmpty) fs.delete(p, false): Unit
    catch { case _: java.io.IOException => () }
    true
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    refuse("RENAME TABLE", "a path-addressed table's name IS its location")

  private def refuse(what: String, why: String): Nothing =
    throw new UnsupportedOperationException(
      s"$catalogName does not support $what: $why")
}

object GraftMLogCatalog {
  /** Age gate for DROP's orphan-debris sweep (data files with no log,
    * left by a drop that gave up under a sustained concurrent writer):
    * the same 24 h grace vacuum uses — old enough that no in-flight
    * atomic CTAS still references its staged (also log-less) files. */
  val DropOrphanGraceMs: Long = MLog.DefaultVacuumGraceMs
}

object MLogStagedTable {
  sealed trait Kind
  case object Create extends Kind
  case object Replace extends Kind
  case object CreateOrReplace extends Kind
}

/** The staged half of an atomic CTAS / RTAS: a normal [[MLogTable]] whose
  * WRITE does everything an mlog write does EXCEPT publish — executors
  * stage attempt-unique ledger files exactly as any append (unreferenced
  * by construction), and the driver-side `BatchWrite.commit` only
  * RECORDS their entries here. The single manifest publish happens in
  * [[commitStagedChanges]]:
  *  - Create: a v1 CAS naming the staged files ([[MLog.createWith]]) —
  *    losing the slot (a racing creator, or any commit) reports
  *    TableAlreadyExists after deleting the staged files; nothing of
  *    this CTAS survives.
  *  - Replace / CreateOrReplace: one truncate-commit
  *    ([[MLog.commitAppend]]) — base + 1 names only the staged files, so
  *    history and the txn ledger SURVIVE a replace (the pre-replace
  *    snapshot stays time-travelable until expired), unlike a
  *    drop-and-recreate.
  * `abortStagedChanges` (the engine calls it when the SELECT fails)
  * deletes the staged files — no manifest was ever touched, so the
  * store's existence is exactly what it was before the statement. */
class MLogStagedTable(ident: Identifier, kind: MLogStagedTable.Kind)
  extends MLogTable({
    val props = new java.util.HashMap[String, String]()
    props.put("path", ident.name())
    props
  }) with StagedTable {

  private val dir = new Path(ident.name())
  private val conf = MLog.hadoopConf()
  @volatile private var staged: Seq[MLog.FileEntry] = Seq.empty

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val s = info.schema()
    require(s.fields.map(f => (f.name, f.dataType)).toSeq ==
      MLog.Schema.fields.map(f => (f.name, f.dataType)).toSeq,
      s"mlog writes the fixed ledger schema (id, k, v: BIGINT); got " +
        s.simpleString)
    new WriteBuilder
      with org.apache.spark.sql.connector.write.SupportsTruncate {
      // RTAS plans an unconditional OverwriteByExpression over the staged
      // table; truncation here is a no-op BY CONSTRUCTION — the staged
      // write publishes nothing, and commitStagedChanges' single
      // truncate-commit (or v1 CAS) is what replaces the old state.
      override def truncate(): WriteBuilder = this
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new BatchWrite {
          override def createBatchWriterFactory(info: PhysicalWriteInfo)
              : DataWriterFactory = MLogWriterFactory(dir.toString, conf)
          // Stage only — the publish is commitStagedChanges' single
          // snapshot, after the engine decides the whole statement won.
          override def commit(messages: Array[WriterCommitMessage]): Unit =
            staged = messages.toSeq.collect {
              case m: MLogCommit if m.name != null => m.entry
            }
          override def abort(messages: Array[WriterCommitMessage]): Unit =
            MLogBatchWrite(dir.toString, conf, truncateFirst = false)
              .abort(messages)
        }
      }
    }
  }

  override def commitStagedChanges(): Unit = {
    val fs = dir.getFileSystem(conf.value)
    kind match {
      case MLogStagedTable.Create =>
        if (!MLog.createWith(fs, dir, staged)) {
          abortStagedChanges()
          throw new TableAlreadyExistsException(ident)
        }
      case MLogStagedTable.Replace =>
        // stageReplace checked existence BEFORE the SELECT ran; a
        // concurrent DROP during the SELECT makes REPLACE's target
        // vanish, and a blind truncate-commit here would silently turn
        // REPLACE into CREATE — re-check at commit time and refuse with
        // the same error a never-existing target gets. (The residual
        // check-to-commit window now spans one manifest publish, not
        // the whole SELECT; a drop landing inside it is
        // last-writer-wins, the same outcome as DROP racing any commit.)
        if (!fs.exists(new Path(dir, MLog.ManifestName)) &&
            MLog.versions(fs, dir).isEmpty) {
          abortStagedChanges()
          throw new NoSuchTableException(ident)
        }
        MLog.commitAppend(fs, dir, staged, None, truncate = true): Unit
      case MLogStagedTable.CreateOrReplace =>
        fs.mkdirs(dir)
        // Truncate-commit: retries a lost CAS against the re-read state
        // (replacing whatever won is exactly REPLACE's semantics,
        // create-when-absent is exactly OR REPLACE's); no txn identity,
        // so the refusal path cannot trigger.
        MLog.commitAppend(fs, dir, staged, None, truncate = true): Unit
    }
  }

  override def abortStagedChanges(): Unit = {
    val fs = dir.getFileSystem(conf.value)
    staged.foreach(e => fs.delete(new Path(dir, e.name), false): Unit)
    staged = Seq.empty
  }
}
