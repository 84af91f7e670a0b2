package graft.sources.v2

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

/** A stream position in an mlog store: the last snapshot VERSION whose
  * files have been delivered (0 = nothing yet). Snapshot numbers are the
  * natural offsets of a manifest-committed table — they are totally
  * ordered, durable, and each one names its complete file set, so a
  * batch is a pure manifest diff. */
case class MLogOffset(version: Int) extends Offset {
  override def json(): String = s"""{"version":$version}"""
}

/** mlog as a STREAMING SOURCE (the Delta streaming-source shape, and the
  * read-side dual of the txn-ledger foreachBatch sink): each micro-batch
  * delivers the files snapshot `end` names that snapshot `start` does
  * not — the appended data, planned from manifests alone, no directory
  * listing, no per-row change log. The first batch (from version 0)
  * delivers the whole table as of stream start, then each commit's
  * files arrive exactly once — offsets are committed snapshot versions,
  * so restart-from-checkpoint replans the identical diff.
  *
  * Append-only contract, ENFORCED: if a file common to both endpoint
  * manifests changed (a deletion vector appeared/grew) or disappeared
  * (overwrite/delete/compact rewrote the layout), already-delivered
  * rows would be silently wrong or re-surface wholesale — the stream
  * fails loudly naming the change, unless `.option("ignoreChanges",
  * "true")` opts into Delta's documented re-surfacing semantics (the
  * diff then carries every NEW file, rewritten ones included).
  *
  * Retention interplay: planning reads the START snapshot's manifest,
  * so `expireVersions` must retain at least the snapshots an active
  * stream's checkpoint can restart from — the same contract Delta's
  * log retention has with its streaming readers. */
class MLogMicroBatchStream(dir: String, conf: SerializableConfiguration,
                           required: StructType, prunable: Array[Filter],
                           ignoreChanges: Boolean)
  extends MicroBatchStream {

  private def fs = new Path(dir).getFileSystem(conf.value)

  private def manifestAt(v: Int): Seq[MLog.FileEntry] =
    if (v == 0) Seq.empty
    else MLog.readManifestVersion(fs, new Path(dir), v)

  override def initialOffset(): Offset = MLogOffset(0)

  override def latestOffset(): Offset =
    MLogOffset(MLog.versions(fs, new Path(dir)).lastOption.getOrElse(0))

  override def deserializeOffset(json: String): Offset = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    MLogOffset(m.get("version").asInt())
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[MLogOffset].version
    val e = end.asInstanceOf[MLogOffset].version
    if (e <= s) return Array.empty
    val startEntries = manifestAt(s)
    val endEntries = manifestAt(e)
    if (!ignoreChanges) {
      val endByName = endEntries.map(x => x.name -> x).toMap
      val broken = startEntries.filter(x => !endByName.get(x.name).contains(x))
      require(broken.isEmpty,
        s"mlog stream detected a NON-APPEND change between snapshots $s " +
          s"and $e (${broken.size} delivered file(s) rewritten, removed, " +
          "or re-vectored — e.g. overwrite, delete, compact); " +
          "already-delivered rows would change. Restart from the new " +
          "snapshot, or set .option(\"ignoreChanges\", \"true\") to " +
          "accept rewritten files re-surfacing wholesale.")
    }
    val startNames = startEntries.map(_.name).toSet
    val fresh = endEntries.filterNot(x => startNames(x.name))
    val survivors =
      fresh.filter(x => prunable.forall(MLogScanBuilder.accepts(x, _)))
    survivors.map(x =>
      MLogPartition(new Path(new Path(dir), x.name).toString, x.rows,
        x.dv.map(d => new Path(new Path(dir), d.name).toString),
        x.dv.fold(0L)(_.rows)): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    MLogReaderFactory(required.fieldNames.toSeq, conf)

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}
