package graft.sources.v2

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{
  BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{
  IntegerType, LongType, StringType, StructField, StructType, TimestampType}

/** SQL stored procedures for mlog TABLE MAINTENANCE — the Iceberg `CALL
  * catalog.system.…` surface (Spark 4's `ProcedureCatalog`), exposed by
  * [[GraftMLogCatalog]] so the lifecycle primitives that are commands
  * rather than queries are reachable from pure SQL:
  *
  *  - `CALL graft.system.compact('/path', target_rows)` — bin-packing
  *    OPTIMIZE ([[MLog.compact]]); returns (before, after, merged,
  *    new_version).
  *  - `CALL graft.system.expire_versions('/path', keep_last)` — snapshot
  *    retention ([[MLog.expireVersions]]); returns (expired_snapshots).
  *  - `CALL graft.system.vacuum('/path')` — reclaim files no retained
  *    snapshot references ([[MLog.vacuum]]); returns (removed_files).
  *
  * Each runs the SAME primitive the API route runs (one snapshot commit
  * where a commit is involved, conflict-detected via
  * [[MLog.publishExclusive]] inside the primitive) and returns its
  * measured stats as a one-row result set (a [[LocalScan]]), so `CALL`'s
  * output is the operation's receipt, not a blind OK. */
object MLogProcedures {

  val All: Map[String, UnboundProcedure] = Map(
    "compact" -> Compact,
    "expire_versions" -> ExpireVersions,
    "vacuum" -> Vacuum,
    "history" -> History,
    "rewrite_dvs" -> RewriteDvs)

  private def fsAndPath(table: String) = {
    val p = new Path(table)
    (p.getFileSystem(SparkSession.active.sessionState.newHadoopConf()), p)
  }

  private def result(schema: StructType, values: Any*)
      : java.util.Iterator[Scan] =
    resultRows(schema, Array(new GenericInternalRow(values.toArray)))

  private def resultRows(schema: StructType, rs: Array[InternalRow])
      : java.util.Iterator[Scan] =
    java.util.List.of[Scan](new LocalScan {
      override def rows(): Array[InternalRow] = rs
      override def readSchema(): StructType = schema
    }).iterator()

  /** Shared shell: every maintenance procedure binds to itself (the
    * parameter list is fixed; Spark's own coercion aligns arguments)
    * and is non-deterministic by nature — it mutates or inspects store
    * state. */
  sealed abstract class Maintenance(procName: String)
    extends UnboundProcedure with BoundProcedure {
    override def name(): String = procName
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
  }

  object Compact extends Maintenance("compact") {
    override def description(): String =
      "bin-packing compaction (OPTIMIZE): files under target_rows are " +
        "first-fit packed and merged by pure payload byte-copy; one " +
        "snapshot commit. With cluster_by => 'id'|'k'|'v' the small " +
        "files are instead globally sort-rewritten by that column " +
        "(OPTIMIZE ZORDER's single-key analogue) so each output owns a " +
        "disjoint key range and pruning gets TIGHTER after maintenance"
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType)
        .comment("mlog store path").build(),
      ProcedureParameter.in("target_rows", LongType)
        .comment("pack bins up to this many rows").build(),
      // Optional: empty = plain bin-packing (byte-copy, union bounds).
      ProcedureParameter.in("cluster_by", StringType)
        .defaultValue("''")
        .comment("sort-rewrite small files by this column (id|k|v)").build())
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val clusterBy = Option(input.getUTF8String(2))
        .map(_.toString.trim).filter(_.nonEmpty)
      val stats = MLog.compact(SparkSession.active,
        new Path(input.getUTF8String(0).toString), input.getLong(1),
        clusterBy)
      result(StructType(Seq(
        StructField("before", IntegerType), StructField("after", IntegerType),
        StructField("merged", IntegerType),
        StructField("new_version", IntegerType))),
        stats.before, stats.after, stats.merged, stats.newVersion)
    }
  }

  object ExpireVersions extends Maintenance("expire_versions") {
    override def description(): String =
      "drop all but the newest keep_last snapshot manifests (never the " +
        "current pointer) — the expire half of retention"
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType)
        .comment("mlog store path").build(),
      ProcedureParameter.in("keep_last", IntegerType)
        .comment("snapshots to retain").build())
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val (fs, p) = fsAndPath(input.getUTF8String(0).toString)
      val n = MLog.expireVersions(fs, p, input.getInt(1))
      result(StructType(Seq(StructField("expired_snapshots", IntegerType))), n)
    }
  }

  object Vacuum extends Maintenance("vacuum") {
    override def description(): String =
      "reclaim data files and deletion-vector sidecars no retained " +
        "snapshot references — the GC half of retention; refuses a " +
        "directory that is not an mlog store, and spares unreferenced " +
        "files younger than min_age_seconds (in-flight commit fence)"
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType)
        .comment("mlog store path").build(),
      // Optional: defaults to the library-wide grace. 0 = reclaim
      // everything unreferenced NOW — correct only when no concurrent
      // writer can be mid-commit (deterministic tests, single-writer
      // maintenance windows).
      ProcedureParameter.in("min_age_seconds", LongType)
        .defaultValue((MLog.DefaultVacuumGraceMs / 1000L).toString)
        .comment("spare unreferenced files younger than this").build())
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val (fs, p) = fsAndPath(input.getUTF8String(0).toString)
      val n = MLog.vacuum(fs, p, minAgeMs = input.getLong(1) * 1000L)
      result(StructType(Seq(StructField("removed_files", LongType))), n)
    }
  }

  /** Delta's `REORG TABLE … APPLY (PURGE)` / Iceberg's
    * rewrite_position_delete_files: pay the copy once, retire the
    * per-read skip cost, return the files to compact's bin-packing. */
  object RewriteDvs extends Maintenance("rewrite_dvs") {
    override def description(): String =
      "materialize deletion vectors: rewrite each vectored file without " +
        "its masked rows (one task per file) and drop the vector; one " +
        "snapshot commit, content unchanged for current readers"
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType)
        .comment("mlog store path").build())
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val stats = MLog.rewriteDvs(SparkSession.active,
        new Path(input.getUTF8String(0).toString))
      result(StructType(Seq(
        StructField("rewritten_files", IntegerType),
        StructField("materialized_rows", LongType),
        StructField("new_version", IntegerType))),
        stats.rewritten, stats.materializedRows, stats.newVersion)
    }
  }

  /** `DESCRIBE HISTORY` for mlog stores (Delta's command / Iceberg's
    * `$snapshots` table, as a procedure): which snapshot versions are
    * retained and what each holds — the introspection that tells an
    * operator what `VERSION AS OF` can still reach, what retention
    * would drop, and how the table's footprint grew commit by commit. */
  object History extends Maintenance("history") {
    override def description(): String =
      "one row per RETAINED snapshot, ascending: its version, commit " +
        "wall-clock (what TIMESTAMP AS OF resolves against), file " +
        "count, logical row count (physical minus DV-masked), and " +
        "on-disk data bytes — what time travel can still reach"
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType)
        .comment("mlog store path").build())
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val (fs, p) = fsAndPath(input.getUTF8String(0).toString)
      MLog.requireStore(fs, p, "describe the history of")
      val rows = MLog.versions(fs, p).map { v =>
        val m = MLog.readManifestVersion(fs, p, v)
        // Commit time as a TIMESTAMP (µs internally): the body's stamped
        // "ts", or the snapshot file's mtime for legacy snapshots — the
        // same value MLog.resolveTimestamp resolves TIMESTAMP AS OF by.
        val tsUs = MLog.commitTimeMs(fs, p, v) * 1000L
        new GenericInternalRow(Array[Any](v, tsUs, m.size,
          m.map(_.logicalRows).sum, m.map(_.sizeBytes).sum)): InternalRow
      }
      resultRows(StructType(Seq(
        StructField("version", IntegerType),
        StructField("commit_at", TimestampType),
        StructField("n_files", IntegerType),
        StructField("n_rows", LongType),
        StructField("n_bytes", LongType))), rows.toArray)
    }
  }
}
