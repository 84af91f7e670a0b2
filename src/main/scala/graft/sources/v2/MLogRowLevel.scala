package graft.sources.v2

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.expressions.{Expressions, Literal, NamedReference}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{
  Batch, InputPartition, PartitionReaderFactory, Scan, ScanBuilder,
  SupportsPushDownRequiredColumns, SupportsRuntimeV2Filtering}
import org.apache.spark.sql.connector.write.{
  BatchWrite, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo,
  RowLevelOperation, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

/** GROUP-BASED row-level operation over an mlog store — the engine-side
  * machinery behind SQL `DELETE FROM` / `UPDATE` / `MERGE INTO` (the
  * Iceberg copy-on-write shape; SURVEY §2.1 S9+). Spark's own analyzer
  * rules (RewriteDeleteFromTable / RewriteUpdateTable /
  * RewriteMergeIntoTable) do the semantics: they build a rewrite query
  * that reads the affected GROUPS through [[newScanBuilder]], recompute
  * those groups' surviving/updated/inserted rows, and hand the result to
  * [[newWriteBuilder]]'s write. This class contributes the two
  * table-format halves:
  *
  *  - GROUP = data file, announced by `requiredMetadataAttributes =
  *    [_file]`: Spark's RowLevelOperationRuntimeGroupFiltering plans a
  *    subquery for the DISTINCT `_file` values of rows matching the
  *    command's condition and pushes it into the rewrite scan via
  *    [[SupportsRuntimeV2Filtering]] — so a targeted MERGE/DELETE/UPDATE
  *    rewrites only the files that contain matches, not the table (the
  *    100 TB property; files outside the match set are carried into the
  *    new manifest by reference, zero bytes moved).
  *  - The commit ([[MLogReplaceDataWrite]]) publishes carried + rewritten
  *    + inserted files as ONE snapshot via the conflict-detecting
  *    [[MLog.publishExclusive]], based on the manifest version the
  *    rewrite scan actually read — a commit interleaving between scan
  *    and publish is refused as stale, never silently dropped.
  *
  * The scan, the runtime group filter, and the commit all speak about one
  * snapshot: [[base]] is read ONCE when the rewrite scan builds, and
  * [[replaced]] is exactly the file set the scan finally planned. */
class MLogRowLevelOperation(dir: String, conf: SerializableConfiguration,
                            cmd: RowLevelOperation.Command)
  extends RowLevelOperation {

  /** Manifest the rewrite is based on — the commit's conflict token.
    * Captured EXACTLY ONCE per operation ([[ensureBase]]): a scan rebuild
    * (plan reuse, replan) must keep rewriting against the manifest the
    * operation started from, never silently re-read a newer one — the
    * conflict check in [[MLogReplaceDataWrite]] is only sound if base is
    * the version every part of this operation actually saw. */
  @volatile private[v2] var base: MLog.Manifest = _
  /** Files the rewrite scan planned (post group filtering): exactly the
    * groups the write replaces. Stamped by the executed scan at
    * planInputPartitions time — a scan instance that is built but never
    * planned (an abandoned rebuild) cannot widen or stale this set. */
  @volatile private[v2] var replaced: Set[String] = Set.empty

  /** Idempotent base capture: the first scan build reads the manifest and
    * initializes the replaced set to the full file list; every later
    * build (plan reuse / replan rebuilds the ScanBuilder) reuses the SAME
    * manifest, so a rebuild can never pair a newer base with an older
    * group-filter file set at commit time. */
  private[v2] def ensureBase(): MLog.Manifest = synchronized {
    if (base == null) {
      val d = new Path(dir)
      base = MLog.readManifestFull(d.getFileSystem(conf.value), d)
      replaced = base.files.map(_.name).toSet
    }
    base
  }

  override def command(): RowLevelOperation.Command = cmd

  override def description(): String = s"mlog row-level $cmd"

  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array(Expressions.column(MLog.FileColumn))

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new MLogRowLevelScanBuilder(this, dir, conf)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val s = info.schema()
    require(s.fields.map(f => (f.name, f.dataType)).toSeq ==
      MLog.Schema.fields.map(f => (f.name, f.dataType)).toSeq,
      s"mlog row-level $cmd writes the fixed ledger schema (id, k, v: " +
        s"BIGINT); got ${s.simpleString}")
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          MLogReplaceDataWrite(MLogRowLevelOperation.this, dir, conf)
      }
    }
  }
}

/** Scan builder for the rewrite side of a row-level operation: the FIRST
  * build reads the current manifest and records it on the operation
  * ([[MLogRowLevelOperation.ensureBase]]); rebuilds reuse it — build() is
  * idempotent, so plan reuse or a replan after runtime group filtering
  * can neither advance the base nor widen the replaced set. Column
  * pruning is honored — the rewrite projects `_file` plus the ledger
  * columns. */
class MLogRowLevelScanBuilder(op: MLogRowLevelOperation, dir: String,
                              conf: SerializableConfiguration)
  extends ScanBuilder with SupportsPushDownRequiredColumns {

  private var required: StructType = MLog.Schema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new MLogRowLevelScan(op, dir, op.ensureBase().files, required, conf)
}

/** The rewrite scan: plans one partition per (possibly group-filtered)
  * file, deletion vectors applied exactly like a batch read. The runtime
  * group filter arrives as `_file IN (…)` / `_file = …` V2 predicates —
  * the DISTINCT file names of condition-matching rows; unrecognized
  * predicate shapes are ignored (keeping every file is sound, just less
  * pruned). */
class MLogRowLevelScan(op: MLogRowLevelOperation, dir: String,
                       all: Seq[MLog.FileEntry], required: StructType,
                       conf: SerializableConfiguration)
  extends Scan with Batch with SupportsRuntimeV2Filtering {

  @volatile private var chosen: Seq[MLog.FileEntry] = all

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"mlog row-level rewrite scan ${chosen.length}/${all.length} files"

  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column(MLog.FileColumn))

  override def filter(predicates: Array[Predicate]): Unit = {
    val keeps = predicates.flatMap(MLogRowLevelScan.fileNamesOf)
    if (keeps.nonEmpty) {
      val keep = keeps.reduce(_ intersect _)
      chosen = all.filter(e => keep(e.name))
    }
  }

  // The EXECUTED scan stamps the replaced set: planInputPartitions runs
  // when this scan's batch actually plans, so op.replaced is always the
  // file set of the scan instance whose rows the rewrite recomputes — a
  // built-but-abandoned rebuild (which would still see filter() or not)
  // never reaches here and cannot stale the commit's group set.
  override def planInputPartitions(): Array[InputPartition] = {
    op.replaced = chosen.map(_.name).toSet
    chosen.map(e =>
      MLogPartition(new Path(new Path(dir), e.name).toString, e.rows,
        e.dv.map(x => new Path(new Path(dir), x.name).toString),
        e.dv.fold(0L)(_.rows)): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    MLogReaderFactory(required.fieldNames.toSeq, conf)
}

object MLogRowLevelScan {
  /** Extract the file-name set of a `_file IN (…)` / `_file = …` runtime
    * predicate; None for shapes that are not a `_file` group filter. */
  private[v2] def fileNamesOf(p: Predicate): Option[Set[String]] = {
    def isFileRef(e: org.apache.spark.sql.connector.expressions.Expression)
        : Boolean = e match {
      case n: NamedReference => n.fieldNames().sameElements(Array(MLog.FileColumn))
      case _ => false
    }
    def str(e: org.apache.spark.sql.connector.expressions.Expression)
        : Option[String] = e match {
      case l: Literal[_] if l.value() != null => Some(l.value().toString)
      case _ => None
    }
    val ch = p.children()
    p.name() match {
      case "IN" if ch.nonEmpty && isFileRef(ch.head) =>
        val vs = ch.tail.map(str)
        if (vs.forall(_.isDefined)) Some(vs.flatten.toSet) else None
      case "=" if ch.length == 2 && isFileRef(ch.head) =>
        str(ch(1)).map(Set(_))
      case "=" if ch.length == 2 && isFileRef(ch(1)) =>
        str(ch.head).map(Set(_))
      case _ => None
    }
  }
}

/** The replace-data commit: executors stage the rewrite query's output
  * through the ordinary [[MLogWriterFactory]]; the driver then publishes
  * (base manifest MINUS the replaced groups) PLUS the staged files as one
  * snapshot — readers see the whole row-level operation or none of it,
  * and the pre-operation snapshot still serves the old rows (time travel
  * / vacuum semantics identical to the API-route delete and merge).
  * [[MLog.publishExclusive]] refuses the publish if ANY commit landed
  * since the rewrite scan read its manifest — the same optimistic
  * conflict detection every mlog mutator uses. */
case class MLogReplaceDataWrite(op: MLogRowLevelOperation, dir: String,
                                conf: SerializableConfiguration)
  extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    MLogWriterFactory(dir, conf)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    require(op.base != null,
      "mlog replace-data commit without a rewrite scan — the row-level " +
        "operation's scan must plan before its write commits")
    val d = new Path(dir)
    val fs = d.getFileSystem(conf.value)
    val fresh = messages.toSeq.collect {
      case m: MLogCommit if m.name != null => m.entry
    }
    // NO-OP CASE (the API routes' contract): a command that replaced no
    // groups and staged no rows — a DELETE/UPDATE/MERGE whose condition
    // matched nothing — publishes NOTHING; the table keeps its version
    // instead of burning a content-identical snapshot.
    if (op.replaced.isEmpty && fresh.isEmpty) return
    val carried = op.base.files.filterNot(e => op.replaced(e.name))
    MLog.publishExclusive(fs, d, op.base.version, carried ++ fresh,
      op.base.txn)
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
