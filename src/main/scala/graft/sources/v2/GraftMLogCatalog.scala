package graft.sources.v2

import java.util.{Map => JMap}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{
  NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{
  Identifier, ProcedureCatalog, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure
import org.apache.spark.sql.connector.expressions.Transform
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
  *  - `… TIMESTAMP AS OF …` is refused: mlog snapshots are numbered, not
  *    timestamped (the manifest records no commit wall-clock).
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
  *  - `CREATE TABLE … USING mlog AS SELECT …` (CTAS) — create + append
  *    through the ordinary manifest-committed write.
  *  - `INSERT INTO` / `INSERT OVERWRITE` — the table's own
  *    BATCH_WRITE/TRUNCATE capabilities; every insert is one snapshot
  *    commit.
  *  - `DROP TABLE` — removes exactly what the format OWNS (manifest
  *    pointer, snapshot manifests, `.mlog` data files, `.dvec` vectors,
  *    staging temps + checksum sidecars), then the directory if empty;
  *    foreign files are never touched and make the directory survive.
  * ALTER and RENAME stay refused: the schema is fixed by design and a
  * path-addressed table's name IS its location. */
class GraftMLogCatalog extends TableCatalog with ProcedureCatalog {

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

  override def loadTable(ident: Identifier, timestamp: Long): Table =
    throw new UnsupportedOperationException(
      "mlog time travel is by snapshot VERSION AS OF n; snapshots carry " +
        "no commit timestamp")

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
    require(ident.namespace().sameElements(Array("mlog")),
      s"$catalogName addresses stores as $catalogName.mlog.`/path`; got " +
        ident.toString)
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
    val p = new Path(ident.name())
    // CAS-create: snapshot v1 with zero files. A racing creator (or any
    // commit) winning the v1 slot means the table exists — CREATE must
    // REPORT that, never absorb it the way an append retry would.
    if (!MLog.createEmpty(fsOf(p), p))
      throw new TableAlreadyExistsException(ident)
    loadTable(ident)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    refuse("ALTER TABLE",
      "the ledger schema (id, k, v: BIGINT) is fixed by design")

  /** `DROP TABLE`: delete exactly the files the format OWNS — manifest
    * pointer, snapshot manifests, data files, deletion vectors, staging
    * temps, and the local filesystem's `.crc` sidecars for any of those
    * — then the directory iff it is empty. Foreign files are never
    * touched (a typo'd path that is not a store raises
    * NoSuchTableException before anything is deleted). */
  override def dropTable(ident: Identifier): Boolean = {
    if (!ident.namespace().sameElements(Array("mlog"))) return false
    if (!exists(ident.name())) return false
    val p = new Path(ident.name())
    val fs = fsOf(p)
    def owned(n: String): Boolean = {
      val core = if (n.startsWith(".") && n.endsWith(".crc"))
        n.stripPrefix(".").stripSuffix(".crc") else n
      core == MLog.ManifestName || core.startsWith("_mlog_v") ||
        core.endsWith(".mlog") || core.endsWith(".dvec") ||
        core.startsWith(".mlog_vtmp-") ||
        core.startsWith(s".${MLog.ManifestName}.tmp-")
    }
    fs.listStatus(p).foreach { st =>
      if (st.isFile && owned(st.getPath.getName))
        fs.delete(st.getPath, false): Unit
    }
    if (fs.listStatus(p).isEmpty) fs.delete(p, false): Unit
    true
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    refuse("RENAME TABLE", "a path-addressed table's name IS its location")

  private def refuse(what: String, why: String): Nothing =
    throw new UnsupportedOperationException(
      s"$catalogName does not support $what: $why")
}
