package graft.sources.v2

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{
  MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl,
  SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

/** A stream position in an mlog store: `version` is a snapshot number and
  * `index` is how many of that snapshot's ADDED files (its manifest diff
  * against the previous snapshot, name-sorted) have been delivered —
  * `-1` means all of them (the version is complete). Snapshot numbers
  * are the natural coarse offsets of a manifest-committed table (totally
  * ordered, durable, each naming its complete file set); the index is
  * what lets admission control split one large commit — or the batch-0
  * whole-table backlog — across several micro-batches without inventing
  * a finer log.
  *
  * `of` records the SLICING BASIS of a split offset: how many adds the
  * version had when the offset was minted. The adds list depends on the
  * read options (ignoreChanges changes what counts as an add), so a
  * checkpoint restarted with different options would silently mis-slice
  * — planning revalidates `of` against the recomputed list and fails
  * loudly on disagreement instead. `-1` = not split / legacy.
  * `{"version":v}` (no index) deserializes as complete, so
  * pre-admission-control checkpoints restart cleanly. */
case class MLogOffset(version: Int, index: Int = -1, of: Int = -1)
  extends Offset {
  override def json(): String =
    s"""{"version":$version,"index":$index,"of":$of}"""
}

/** mlog as a STREAMING SOURCE (the Delta streaming-source shape, and the
  * read-side dual of the txn-ledger foreachBatch sink): each micro-batch
  * delivers the files the manifests between its two endpoint offsets
  * ADD — the appended data, planned from manifests alone, no directory
  * listing, no per-row change log. The first batch (from version 0)
  * delivers the table as of stream start, then each commit's files
  * arrive exactly once — offsets are (snapshot version, add index), so
  * restart-from-checkpoint replans the identical diff.
  *
  * ADMISSION CONTROL (Delta's maxFilesPerTrigger/maxBytesPerTrigger
  * shape): without it, a stream starting against a large table — or
  * recovering a backlog — plans the whole outstanding diff as ONE
  * micro-batch. Three read options bound a trigger:
  *  - `maxVersionsPerTrigger` — at most that many snapshot versions per
  *    micro-batch (offsets stay version-aligned);
  *  - `maxFilesPerTrigger` — at most that many ADDED files per
  *    micro-batch, splitting inside a version when a single commit (or
  *    batch 0's whole-table backlog) exceeds the budget;
  *  - `maxBytesPerTrigger` — a SOFT byte budget over the added files'
  *    manifest-recorded sizes (Delta's semantics: files are admitted
  *    until the budget is exceeded, and at least one file is always
  *    admitted so an over-budget file cannot wedge the stream), also
  *    splitting inside a version.
  * All default to unlimited, preserving the drain-everything behavior;
  * set together they compose — a file is admitted only while every
  * budget has room.
  * `Trigger.AvailableNow` composes: the target is pinned at
  * [[prepareForTriggerAvailableNow]] and the stream drains to it in
  * budget-sized steps, then stops.
  *
  * Append-only contract, ENFORCED per planned span: if a file the span's
  * START snapshot named changed by its END (a deletion vector
  * appeared/grew) or disappeared (overwrite / delete / compact rewrote
  * the layout), already-delivered rows would be silently wrong or
  * re-surface wholesale — the stream fails loudly naming the span,
  * unless `.option("ignoreChanges", "true")` opts into Delta's
  * documented re-surfacing semantics: the diff then carries every new
  * file AND every file whose manifest entry CHANGED (so a merge-on-read
  * delete that re-vectors a file in place re-delivers that file with its
  * new vector, instead of being silently skipped by a name-only diff).
  *
  * Retention interplay: planning reads every snapshot manifest in the
  * offset range (each diffed against its predecessor), so
  * `expireVersions` must retain at least the snapshots an active
  * stream's checkpoint can restart from — the same contract Delta's log
  * retention has with its streaming readers. */
class MLogMicroBatchStream(dir: String, conf: SerializableConfiguration,
                           required: StructType, prunable: Array[Filter],
                           ignoreChanges: Boolean,
                           maxVersionsPerTrigger: Option[Int] = None,
                           maxFilesPerTrigger: Option[Int] = None,
                           maxBytesPerTrigger: Option[Long] = None)
  extends MicroBatchStream with SupportsAdmissionControl
  with SupportsTriggerAvailableNow {

  require(maxVersionsPerTrigger.forall(_ >= 1),
    "mlog maxVersionsPerTrigger must be >= 1")
  require(maxFilesPerTrigger.forall(_ >= 1),
    "mlog maxFilesPerTrigger must be >= 1")
  require(maxBytesPerTrigger.forall(_ >= 1),
    "mlog maxBytesPerTrigger must be >= 1")

  private def fs = new Path(dir).getFileSystem(conf.value)

  private def manifestAt(v: Int): Seq[MLog.FileEntry] =
    if (v == 0) Seq.empty
    else MLog.readManifestVersion(fs, new Path(dir), v)

  /** The files snapshot `curr` ADDS over `prev`: new names, plus (under
    * ignoreChanges) files whose entry changed in place — a re-vectored
    * or restated file re-surfaces wholesale, Delta's documented
    * semantics. Name-sorted so index slicing is deterministic. */
  private def addsBetween(prev: Seq[MLog.FileEntry],
                          curr: Seq[MLog.FileEntry]): Seq[MLog.FileEntry] = {
    val prevByName = prev.map(e => e.name -> e).toMap
    curr.filter { e =>
      prevByName.get(e.name) match {
        case None => true
        case Some(p) => ignoreChanges && p != e
      }
    }.sortBy(_.name)
  }

  /** The append-only contract over one planned span: every file the
    * start snapshot named — i.e. every file this stream may already have
    * delivered — must appear UNCHANGED in the end snapshot. Files that
    * appear AND change within the span are fine: they deliver once, with
    * their end-of-span entry. */
  private def checkAppendOnly(prev: Seq[MLog.FileEntry],
                              curr: Seq[MLog.FileEntry],
                              sv: Int, ev: Int): Unit = {
    val currByName = curr.map(e => e.name -> e).toMap
    val broken = prev.filter(e => !currByName.get(e.name).contains(e))
    require(broken.isEmpty,
      s"mlog stream detected a NON-APPEND change between snapshots " +
        s"$sv and $ev (${broken.size} delivered file(s) rewritten, " +
        "removed, or re-vectored — e.g. overwrite, delete, compact); " +
        "already-delivered rows would change. Restart from the new " +
        "snapshot, or set .option(\"ignoreChanges\", \"true\") to " +
        "accept rewritten files re-surfacing wholesale.")
  }

  override def initialOffset(): Offset = MLogOffset(0)

  // With SupportsAdmissionControl the engine calls the 2-arg overload.
  override def latestOffset(): Offset = throw new UnsupportedOperationException(
    "latestOffset(Offset, ReadLimit) should be called instead")

  /** The true head of the log, unclamped — what the engine reports as
    * `latestOffset` in progress events while a rate limit holds the
    * processed offset behind it. */
  override def reportLatestOffset(): Offset =
    MLogOffset(MLog.versions(fs, new Path(dir)).lastOption.getOrElse(0))

  // Trigger.AvailableNow pins its drain target here: versions committed
  // after this point belong to the next run, and the per-trigger budgets
  // below still pace the catch-up batches.
  @volatile private var availableNowCap: Option[Int] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(MLog.versions(fs, new Path(dir))
      .lastOption.getOrElse(0))

  // The budgets ride the stream's own options, so the engine's ReadLimit
  // (derived from getDefaultReadLimit — allAvailable) is not consulted.
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[MLogOffset]
    val head = MLog.versions(fs, new Path(dir)).lastOption.getOrElse(0)
    val newest = availableNowCap.fold(head)(math.min(head, _))
    if (newest < s.version) return s
    // Version budget first (it is offset-aligned). A mid-version start
    // counts the split remainder as the FIRST version of this trigger's
    // budget: completing it consumes one version's allowance, and any
    // leftover budget admits further versions — a tiny remainder no
    // longer pins the whole trigger to an under-filled batch (with
    // maxVersionsPerTrigger = 1 this still means "finish the split
    // version only", the offset-aligned minimum).
    val endV = maxVersionsPerTrigger match {
      case Some(v) if s.index >= 0 => math.min(newest, s.version + v - 1)
      case Some(v) => math.min(newest, s.version + v)
      case None => newest
    }
    if (maxFilesPerTrigger.isEmpty && maxBytesPerTrigger.isEmpty) {
      val end = MLogOffset(endV)
      // A complete start at the head must return the START offset
      // unchanged (same json => no empty batch is planned).
      if (endV == s.version && s.index < 0) s else end
    } else {
      // Unified file/byte budget walk. The FILE budget is hard (at most
      // that many adds); the BYTE budget is soft — a file is admitted
      // while bytes remain, so one over-budget file still makes progress
      // (Delta's at-least-one-file semantics) and the budget can end a
      // trigger mid-version via a (version, index) split offset.
      var filesLeft = maxFilesPerTrigger.fold(Long.MaxValue)(_.toLong)
      var bytesLeft = maxBytesPerTrigger.getOrElse(Long.MaxValue)
      def admit(adds: Seq[MLog.FileEntry], from: Int): Int = {
        var i = from
        while (i < adds.size && filesLeft > 0 && bytesLeft > 0) {
          filesLeft -= 1
          bytesLeft -= adds(i).sizeBytes // may go negative: soft max
          i += 1
        }
        i - from
      }
      var w = s.version
      // Consume the remainder of a split version before advancing. Only
      // a split start needs version - 1's manifest (the retention
      // contract covers it: both endpoints of a checkpointed split
      // step must be restartable).
      var prev = manifestAt(s.version)
      if (s.index >= 0 && s.version > 0) {
        val adds = addsBetween(manifestAt(s.version - 1), prev)
        checkBasis(s, adds.size)
        val n = admit(adds, s.index)
        if (s.index + n < adds.size)
          return MLogOffset(s.version, s.index + n, adds.size)
      }
      while (w < endV && filesLeft > 0 && bytesLeft > 0) {
        w += 1
        val curr = manifestAt(w)
        val adds = addsBetween(prev, curr)
        val n = admit(adds, 0)
        if (n < adds.size) return MLogOffset(w, n, adds.size)
        prev = curr
      }
      if (w == s.version && s.index < 0) s else MLogOffset(w)
    }
  }

  override def deserializeOffset(json: String): Offset = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    // Pre-admission-control offsets carry no index: complete version.
    MLogOffset(m.get("version").asInt(),
      Option(m.get("index")).fold(-1)(_.asInt()),
      Option(m.get("of")).fold(-1)(_.asInt()))
  }

  /** A split offset's recorded adds-count must match the list recomputed
    * NOW: a disagreement means the slicing basis changed under a
    * checkpoint — read options (ignoreChanges) toggled across a restart,
    * or snapshot history mutated — and slicing on would silently skip or
    * re-deliver files. */
  private def checkBasis(o: MLogOffset, adds: Int): Unit =
    require(o.of < 0 || o.of == adds,
      s"mlog stream checkpoint offset $o sliced version ${o.version} " +
        s"into ${o.of} adds, but the manifest diff now yields $adds — " +
        "the stream's read options (e.g. ignoreChanges) changed across a " +
        "restart, or the snapshot history was rewritten; restart from a " +
        "fresh checkpoint with the original options.")

  /** Plan the batch for (start, end]: per-version NAME lists (consecutive
    * manifest diffs, name-sorted) give the deterministic order the offset
    * indexes slice; each name then delivers ONCE, with its entry as of
    * the END snapshot — so a file that appears and is re-vectored within
    * the span streams its final masked state. The append-only contract
    * has two halves:
    *  - files the START snapshot named (delivered or deliverable before
    *    this span) must appear unchanged in the end snapshot
    *    ([[checkAppendOnly]]);
    *  - a file added AND REMOVED within the span (committed at v2,
    *    rewritten away by a delete/compact/overwrite at v4, span v1→v4)
    *    FAILS STRICT MODE too — Delta's semantics: any remove in the
    *    range is a non-append change, even of a file this stream never
    *    delivered. Silently delivering the net state would hide that a
    *    mutator ran inside the span; the operator must either restart
    *    from a snapshot after the rewrite or opt into
    *    `ignoreChanges`, under which the vanished file is skipped in
    *    favor of its replacement (net-state delivery, the documented
    *    relaxation). */
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[MLogOffset]
    val e = end.asInstanceOf[MLogOffset]
    if (e.version < s.version) return Array.empty
    val endEntries = manifestAt(e.version)
    if (!ignoreChanges)
      checkAppendOnly(manifestAt(s.version), endEntries, s.version, e.version)
    val names = Seq.newBuilder[String]
    var prevM: Seq[MLog.FileEntry] = null
    if (s.index >= 0 && s.version > 0) {
      // Remainder of a split start version.
      val curr = manifestAt(s.version)
      val adds = addsBetween(manifestAt(s.version - 1), curr).map(_.name)
      checkBasis(s, adds.size)
      if (e.version == s.version && e.index >= 0) checkBasis(e, adds.size)
      val hi = if (e.version == s.version && e.index >= 0) e.index
               else adds.size
      names ++= adds.slice(s.index, hi)
      prevM = curr
    } else {
      if (e.version == s.version) return Array.empty
      prevM = manifestAt(s.version)
    }
    var w = s.version
    while (w < e.version) {
      w += 1
      val curr = if (w == e.version) endEntries else manifestAt(w)
      val adds = addsBetween(prevM, curr).map(_.name)
      if (w == e.version && e.index >= 0) checkBasis(e, adds.size)
      val hi = if (w == e.version && e.index >= 0) e.index else adds.size
      names ++= adds.slice(0, hi)
      prevM = curr
    }
    val endByName = endEntries.map(x => x.name -> x).toMap
    val seen = scala.collection.mutable.HashSet.empty[String]
    val out = names.result().flatMap { n =>
      if (!seen.add(n)) None
      else {
        val entry = endByName.get(n)
        require(entry.isDefined || ignoreChanges,
          s"mlog stream detected a NON-APPEND change inside the planned " +
            s"span ${s.version}->${e.version}: file $n was committed and " +
            "then removed (overwrite, delete, or compact rewrote it) " +
            "within the span. Restart from a snapshot after the rewrite, " +
            "or set .option(\"ignoreChanges\", \"true\") to accept " +
            "net-state delivery (the replacement files instead of the " +
            "vanished one).")
        entry
      }
    }
    val survivors =
      out.filter(x => prunable.forall(MLogScanBuilder.accepts(x, _)))
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
