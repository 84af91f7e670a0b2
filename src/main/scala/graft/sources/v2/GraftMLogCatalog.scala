package graft.sources.v2

import java.util.{Map => JMap}

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
  * `SupportsRowLevelOperations`). Only catalog-level DDL (CREATE / DROP /
  * ALTER / RENAME) refuses: stores are path-addressed, and bulk writes
  * stay on the `format("mlog")` path. */
class GraftMLogCatalog extends TableCatalog with ProcedureCatalog {

  private var catalogName: String = _

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit =
    catalogName = name

  override def name(): String = catalogName

  override def listTables(namespace: Array[String]): Array[Identifier] =
    Array.empty // path-addressed: there is no enumerable table list

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

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: JMap[String, String]): Table =
    refuse("CREATE TABLE")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    refuse("ALTER TABLE")

  override def dropTable(ident: Identifier): Boolean = refuse("DROP TABLE")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    refuse("RENAME TABLE")

  private def refuse(what: String): Nothing =
    throw new UnsupportedOperationException(
      s"$catalogName is a read/time-travel surface over mlog store paths; " +
        s"$what goes through .write.format(\"mlog\")")
}
