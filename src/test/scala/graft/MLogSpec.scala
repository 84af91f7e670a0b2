package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.sources.v2.{MLog, MLogBatchWrite, MLogCommit, MLogScanBuilder,
  MLogStreamingWrite, MLogWriterFactory}
import org.apache.spark.sql.connector.write.WriterCommitMessage
import org.apache.spark.sql.sources.{EqualTo, GreaterThan, LessThanOrEqual}

/** The mlog DSv2 sink/source: manifest-committed writes (commit publishes,
  * abort cleans, orphans are invisible), append-vs-truncate manifest
  * lifecycle, manifest-range file pruning, and the fixed-schema contract. */
class MLogSpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("mlog_spec").toFile.getAbsolutePath

  private def ledger(n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, (i % 7).toLong, i.toLong * 10))
      .toDF("id", "k", "v")
  }

  private def fs(dir: String) =
    new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())

  test("round-trip: overwrite commit publishes a manifest readers trust") {
    val dir = tmp()
    ledger(100).repartition(4).write.format("mlog")
      .mode(SaveMode.Overwrite).save(dir)
    val entries = MLog.readManifest(fs(dir), new Path(dir))
    assert(entries.map(_.rows).sum === 100L)
    assert(entries.forall(_.name.endsWith(".mlog")))
    val back = spark.read.format("mlog").load(dir)
    assert(back.count() === 100L)
    assert(back.agg(sum("v")).head.getLong(0) === (0 until 100).map(_ * 10L).sum)
    // An orphaned part file (failed attempt, junk) is INVISIBLE: the
    // manifest, not the directory listing, defines the table.
    val junk = new java.io.File(dir, "part-junk.mlog")
    val out = new java.io.DataOutputStream(new java.io.FileOutputStream(junk))
    out.writeInt(MLog.Magic); out.writeInt(MLog.Version)
    out.writeLong(999L); out.writeLong(999L); out.writeLong(999L); out.close()
    assert(spark.read.format("mlog").load(dir).count() === 100L)
  }

  test("append merges the manifest; overwrite truncates it") {
    val dir = tmp()
    ledger(50).coalesce(1).write.format("mlog").mode(SaveMode.Overwrite).save(dir)
    ledger(30).coalesce(1).write.format("mlog").mode(SaveMode.Append).save(dir)
    assert(MLog.readManifest(fs(dir), new Path(dir)).size === 2)
    assert(spark.read.format("mlog").load(dir).count() === 80L)
    ledger(10).coalesce(1).write.format("mlog").mode(SaveMode.Overwrite).save(dir)
    val after = MLog.readManifest(fs(dir), new Path(dir))
    assert(after.size === 1 && after.head.rows === 10L)
    assert(spark.read.format("mlog").load(dir).count() === 10L)
  }

  test("abort deletes the staged files a failed job reported") {
    val dir = tmp()
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    val w = MLogWriterFactory(dir, conf).createWriter(0, 0L)
    w.write(org.apache.spark.sql.catalyst.InternalRow(1L, 2L, 3L))
    val msg = w.commit()
    val staged = Option(new java.io.File(dir).listFiles()).get
      .filter(_.getName.endsWith(".mlog"))
    assert(staged.length === 1)
    MLogBatchWrite(dir, conf, truncateFirst = false)
      .abort(Array[WriterCommitMessage](msg))
    assert(!staged.head.exists())
    assert(MLog.readManifest(fs(dir), new Path(dir)).isEmpty)
  }

  test("manifest range pruning plans only intersecting files; residuals re-apply") {
    val dir = tmp()
    // repartitionByRange clusters k: files carry disjoint-ish k ranges.
    ledger(700).repartitionByRange(7, col("k")).write.format("mlog")
      .mode(SaveMode.Overwrite).save(dir)
    val total = MLog.readManifest(fs(dir), new Path(dir)).size
    val q = spark.read.format("mlog").load(dir)
      .filter(col("k") === 3L).agg(count(lit(1)), min("id"), max("id"))
    val got = q.head
    val (planned, seen) = MLog.planned(q)
    assert(seen === total && planned < total,
      s"k = 3 must prune some of the $total range files (planned $planned)")
    assert(got.getLong(0) === 100L && got.getLong(1) === 3L && got.getLong(2) === 696L)
  }

  test("column pruning: narrow reads and count(*) survive") {
    val dir = tmp()
    ledger(60).coalesce(2).write.format("mlog").mode(SaveMode.Overwrite).save(dir)
    val ks = spark.read.format("mlog").load(dir).select("k")
    assert(ks.columns.toSeq === Seq("k"))
    assert(ks.agg(sum("k")).head.getLong(0) === (0 until 60).map(_ % 7).sum.toLong)
    assert(spark.read.format("mlog").load(dir).count() === 60L)
  }

  test("fixed ledger schema is enforced at write planning") {
    val dir = tmp()
    import spark.implicits._
    val bad = Seq((1L, "x")).toDF("id", "k")
    val err = intercept[Exception] {
      bad.write.format("mlog").mode(SaveMode.Overwrite).save(dir)
    }
    assert(err.getMessage.contains("mlog") ||
      err.getMessage.contains("schema") || err.getMessage.contains("column"))
  }

  test("SQL route: CREATE TABLE USING mlog resolves the provider and still prunes") {
    val dir = tmp()
    ledger(700).repartitionByRange(7, col("k")).write.format("mlog")
      .mode(SaveMode.Overwrite).save(dir)
    val total = MLog.readManifest(fs(dir), new Path(dir)).size
    spark.sql(
      s"CREATE TABLE IF NOT EXISTS mlog_spec_tbl USING mlog OPTIONS (path '$dir')")
    try {
      val q = spark.sql(
        "SELECT count(*), sum(v) FROM mlog_spec_tbl WHERE k = 3")
      val row = q.head
      val (planned, seen) = MLog.planned(q)
      assert(row.getLong(0) === 100L)
      assert(seen === total && planned < total,
        s"the parser route must prune like the DataFrame route (planned $planned/$total)")
    } finally spark.sql("DROP TABLE IF EXISTS mlog_spec_tbl"): Unit
  }

  test("retention: snapshots protect superseded files; expire then vacuum") {
    val dir = tmp()
    ledger(70).repartition(7).write.format("mlog").mode(SaveMode.Overwrite).save(dir)
    ledger(70).repartition(3).write.format("mlog").mode(SaveMode.Overwrite).save(dir)
    // Junk from a dead attempt is referenced by NO snapshot: only it goes.
    new java.io.FileOutputStream(new java.io.File(dir, "part-dead.mlog")).close()
    val before = spark.read.format("mlog").load(dir).agg(sum("v")).head.getLong(0)
    assert(MLog.vacuum(fs(dir), new Path(dir), minAgeMs = 0L) === 1L,
      "retained snapshot v1 must protect the 7 superseded files")
    // Expire v1, then vacuum reclaims exactly the files only it named.
    assert(MLog.expireVersions(fs(dir), new Path(dir), keepLast = 1) === 1)
    assert(MLog.vacuum(fs(dir), new Path(dir), minAgeMs = 0L) === 7L)
    val left = Option(new java.io.File(dir).listFiles()).get
      .map(_.getName).filter(_.endsWith(".mlog")).toSet
    assert(left === MLog.readManifest(fs(dir), new Path(dir)).map(_.name).toSet)
    assert(spark.read.format("mlog").load(dir).agg(sum("v")).head.getLong(0) === before)
  }

  test("time travel: versionAsOf reads each commit's snapshot") {
    val dir = tmp()
    ledger(50).coalesce(1).write.format("mlog").mode(SaveMode.Overwrite).save(dir)
    ledger(10).coalesce(1).write.format("mlog").mode(SaveMode.Overwrite).save(dir)
    assert(MLog.versions(fs(dir), new Path(dir)) === Seq(1, 2))
    def n(v: Int): Long = spark.read.format("mlog")
      .option("versionAsOf", v).load(dir).count()
    assert(n(1) === 50L && n(2) === 10L)
    assert(spark.read.format("mlog").load(dir).count() === 10L)
    // Expired snapshots fail loudly rather than silently serving current.
    MLog.expireVersions(fs(dir), new Path(dir), keepLast = 1)
    val err = intercept[Exception] { n(1) }
    assert(err.getMessage.contains("version 1"))
    assert(n(2) === 10L)
  }

  test("missing current pointer recovers from the newest snapshot, never empty") {
    val dir = tmp()
    ledger(50).coalesce(1).write.format("mlog").mode(SaveMode.Overwrite).save(dir)
    ledger(80).coalesce(2).write.format("mlog").mode(SaveMode.Overwrite).save(dir)
    // Simulate a crash that lost the current pointer (the window a
    // non-atomic delete-then-rename would expose): snapshots survive.
    fs(dir).delete(new Path(dir, "_mlog_manifest.json"), false)
    val recovered = MLog.readManifest(fs(dir), new Path(dir))
    assert(recovered.map(_.rows).sum === 80L,
      "an existing table must never read as empty when snapshots remain")
    assert(spark.read.format("mlog").load(dir).count() === 80L)
    // A brand-new table (no pointer, no snapshots) is legitimately empty.
    assert(MLog.readManifest(fs(tmp()), new Path(tmp())).isEmpty)
  }

  test("manifest publish is one atomic overwrite: pointer exists at every commit") {
    val dir = tmp()
    // Each overwrite commit REPLACES the pointer; with FileContext
    // Rename.OVERWRITE there is no delete-then-rename window, so the
    // pointer file must exist after every one of N rapid commits.
    (1 to 5).foreach { i =>
      ledger(i * 10).coalesce(1).write.format("mlog")
        .mode(SaveMode.Overwrite).save(dir)
      assert(fs(dir).exists(new Path(dir, "_mlog_manifest.json")))
    }
    assert(spark.read.format("mlog").load(dir).count() === 50L)
  }

  test("version parsing tolerates widths beyond the %05d padding") {
    val dir = tmp()
    ledger(10).coalesce(1).write.format("mlog").mode(SaveMode.Overwrite).save(dir)
    // A snapshot at v >= 100000 pads to six digits; versions() must see
    // it (else the next commit recomputes the number and create(false)
    // throws, and vacuum treats its files as dead).
    val src = new Path(dir, "_mlog_v00001.json")
    val wide = new Path(dir, "_mlog_v123456.json")
    org.apache.hadoop.fs.FileUtil.copy(fs(dir), src, fs(dir), wide, false,
      spark.sessionState.newHadoopConf())
    assert(MLog.versions(fs(dir), new Path(dir)) === Seq(1, 123456))
    // The next commit must go PAST the wide snapshot, not collide.
    ledger(20).coalesce(1).write.format("mlog").mode(SaveMode.Append).save(dir)
    assert(MLog.versions(fs(dir), new Path(dir)) === Seq(1, 123456, 123457))
  }

  test("delete: partial rewrite restates rows/min/max; untouched files carried by reference") {
    val dir = tmp()
    ledger(100).coalesce(1).write.format("mlog").mode(SaveMode.Overwrite).save(dir)
    ledger(100).select((col("id") + 1000L).as("id"), col("k"), col("v")).coalesce(1)
      .write.format("mlog").mode(SaveMode.Append).save(dir)
    val pre = MLog.readManifest(fs(dir), new Path(dir))
    assert(pre.size === 2)
    val preByName = pre.map(e => e.name -> e).toMap
    val preVersion = MLog.versions(fs(dir), new Path(dir)).last
    // Bounds touch only the low-id file; matches drops its ids < 50.
    val stats = MLog.delete(spark, new Path(dir),
      e => e.minId < 100, (id, _, _) => id < 50)
    assert(stats.rewritten === 1 && stats.carried === 1)
    assert(stats.removedRows === 50L)
    assert(stats.newVersion === preVersion + 1)
    val post = MLog.readManifest(fs(dir), new Path(dir))
    assert(post.size === 2)
    // The untouched file is carried BY REFERENCE: same name, same stats.
    val carried = post.filter(e => preByName.contains(e.name))
    assert(carried.size === 1 && carried.head === preByName(carried.head.name))
    // The replacement restates rows and (id, k) min/max from survivors.
    val rewritten = post.filterNot(e => preByName.contains(e.name)).head
    assert(rewritten.rows === 50L)
    assert(rewritten.minId === 50L && rewritten.maxId === 99L)
    assert(rewritten.minK === 0L && rewritten.maxK === 6L)
    // Content: only the matching rows are gone.
    val back = spark.read.format("mlog").load(dir)
    assert(back.count() === 150L)
    assert(back.filter(col("id") < 50).count() === 0L)
    assert(back.agg(sum("v")).head.getLong(0) ===
      ((50 until 100) ++ (0 until 100)).map(_ * 10L).sum)
    // Restated stats stay pruning-effective: id < 50 plans ZERO files.
    val none = spark.read.format("mlog").load(dir).filter(col("id") < 50)
    assert(none.count() === 0L)
    assert(MLog.planned(none) === ((0, 2)))
    // Time travel to the pre-delete snapshot still serves deleted rows.
    assert(spark.read.format("mlog").option("versionAsOf", preVersion)
      .load(dir).filter(col("id") < 50).count() === 50L)
  }

  test("delete: an all-deleted file yields no replacement at all") {
    val dir = tmp()
    // One file per k: bounds isolate exactly the k = 3 file.
    (0 until 7).foreach { kk =>
      ledger(700).filter(col("k") === kk.toLong).coalesce(1)
        .write.format("mlog")
        .mode(if (kk == 0) SaveMode.Overwrite else SaveMode.Append).save(dir)
    }
    val pre = MLog.readManifest(fs(dir), new Path(dir))
    assert(pre.size === 7)
    val stats = MLog.delete(spark, new Path(dir),
      e => e.minK <= 3L && 3L <= e.maxK, (_, k, _) => k == 3L)
    assert(stats.rewritten === 1 && stats.carried === 6)
    assert(stats.removedRows === 100L)
    val post = MLog.readManifest(fs(dir), new Path(dir))
    assert(post.size === 6, "a fully-deleted file must leave NO manifest entry")
    assert(post.toSet === pre.filterNot(e => e.minK <= 3L && 3L <= e.maxK).toSet)
    assert(spark.read.format("mlog").load(dir).count() === 600L)
    // GDPR completion: expire pre-delete snapshots, vacuum — the deleted
    // rows' file is physically gone and time travel to it fails loudly.
    val preVersions = MLog.versions(fs(dir), new Path(dir)).init
    MLog.expireVersions(fs(dir), new Path(dir), keepLast = 1)
    assert(MLog.vacuum(fs(dir), new Path(dir), minAgeMs = 0L) === 1L,
      "exactly the all-deleted file becomes unreferenced")
    val err = intercept[Exception] {
      spark.read.format("mlog").option("versionAsOf", preVersions.last)
        .load(dir).count()
    }
    assert(err.getMessage.contains("version"))
  }

  test("delete: bounds touching nothing commits nothing") {
    val dir = tmp()
    ledger(40).coalesce(1).write.format("mlog").mode(SaveMode.Overwrite).save(dir)
    val preVersions = MLog.versions(fs(dir), new Path(dir))
    val stats = MLog.delete(spark, new Path(dir),
      e => e.minId > 1000000L, (_, _, _) => true)
    assert(stats.rewritten === 0 && stats.carried === 1)
    assert(stats.removedRows === 0L)
    // Documented no-op: newVersion is the PRE-EXISTING latest, and no new
    // snapshot was written.
    assert(stats.newVersion === preVersions.last)
    assert(MLog.versions(fs(dir), new Path(dir)) === preVersions)
    assert(spark.read.format("mlog").load(dir).count() === 40L)
  }

  test("compact: bin-packing preserves exact content and manifest stats algebra") {
    val dir = tmp()
    // 6 small files of 10 rows + 1 large of 100: target 35 packs the
    // small ones 3-per-bin (first-fit in name order), carries the large.
    (0 until 6).foreach { i =>
      ledger(10).select((col("id") + i * 10L).as("id"), col("k"), col("v"))
        .coalesce(1).write.format("mlog")
        .mode(if (i == 0) SaveMode.Overwrite else SaveMode.Append).save(dir)
    }
    ledger(100).select((col("id") + 1000L).as("id"), col("k"), col("v")).coalesce(1)
      .write.format("mlog").mode(SaveMode.Append).save(dir)
    val pre = MLog.readManifest(fs(dir), new Path(dir))
    val preRows = spark.read.format("mlog").load(dir)
      .orderBy("id", "k", "v").collect().toSeq
    val preVersion = MLog.versions(fs(dir), new Path(dir)).last
    val stats = MLog.compact(spark, new Path(dir), targetRows = 35L)
    assert(stats.before === 7 && stats.merged === 6)
    assert(stats.after === 3, "6 × 10-row files first-fit into 2 bins of 30 + the carried large file")
    assert(stats.newVersion === preVersion + 1)
    val post = MLog.readManifest(fs(dir), new Path(dir))
    assert(post.size === 3)
    // The ≥-target file is carried by reference (same name, same stats).
    val large = pre.find(_.rows === 100L).get
    assert(post.contains(large))
    // Manifest stats algebra: rows sum, min of mins, max of maxes.
    assert(post.map(_.rows).sum === pre.map(_.rows).sum)
    assert(post.map(_.minId).min === pre.map(_.minId).min)
    assert(post.map(_.maxId).max === pre.map(_.maxId).max)
    assert(post.map(_.minK).min === pre.map(_.minK).min)
    assert(post.map(_.maxK).max === pre.map(_.maxK).max)
    // Row content is EXACTLY preserved (byte-copied payloads).
    val postRows = spark.read.format("mlog").load(dir)
      .orderBy("id", "k", "v").collect().toSeq
    assert(postRows === preRows)
    // The pre-compaction snapshot keeps the old layout readable.
    val old = spark.read.format("mlog").option("versionAsOf", preVersion)
      .load(dir)
    old.count(): Unit
    assert(MLog.planned(old) === ((7, 7)))
  }

  test("compact: nothing under target commits nothing") {
    val dir = tmp()
    ledger(50).coalesce(1).write.format("mlog").mode(SaveMode.Overwrite).save(dir)
    ledger(50).coalesce(1).write.format("mlog").mode(SaveMode.Append).save(dir)
    val preVersions = MLog.versions(fs(dir), new Path(dir))
    val stats = MLog.compact(spark, new Path(dir), targetRows = 50L)
    assert(stats.merged === 0 && stats.before === 2 && stats.after === 2)
    assert(stats.newVersion === preVersions.last)
    assert(MLog.versions(fs(dir), new Path(dir)) === preVersions)
    // A lone under-target file (a bin of one) is also carried, not
    // rewritten: merging one file with itself would move bytes for
    // nothing.
    val stats2 = MLog.compact(spark, new Path(dir), targetRows = 60L)
    assert(stats2.merged === 0 && stats2.after === 2)
  }

  test("compact cluster_by: sort-rewrite yields disjoint key ranges, tighter pruning") {
    val dir = tmp()
    import spark.implicits._
    // 4 small files, each holding every 4th k across 0..79 — fully
    // overlapping (minK, maxK) ranges, the worst case for pruning (and
    // what first-fit byte-copy compaction would PRESERVE: its merged
    // bounds are unions).
    (0 until 4).foreach { i =>
      (0 until 20).map(j =>
        ((i * 20 + j).toLong, (j * 4 + i).toLong, (i * 20 + j) * 10L))
        .toDF("id", "k", "v")
        .coalesce(1).write.format("mlog")
        .mode(if (i == 0) SaveMode.Overwrite else SaveMode.Append).save(dir)
    }
    val pre = MLog.readManifest(fs(dir), new Path(dir))
    assert(pre.size === 4)
    val preScan = spark.read.format("mlog").load(dir).filter(col("k") < 20L)
    assert(preScan.count() === 20L)
    assert(MLog.planned(preScan) === ((4, 4)),
      "pre-compaction, the interleaved layout defeats k pruning entirely")
    val preRows = spark.read.format("mlog").load(dir)
      .orderBy("id", "k", "v").collect().toSeq
    val preVersion = MLog.versions(fs(dir), new Path(dir)).last

    val stats = MLog.compact(spark, new Path(dir), targetRows = 25L,
      clusterBy = Some("k"))
    assert(stats.before === 4 && stats.merged === 4)
    assert(stats.newVersion === preVersion + 1)
    val post = MLog.readManifest(fs(dir), new Path(dir))
    assert(post.size === stats.after && post.nonEmpty)
    // Each output owns a DISJOINT k range (ks are unique here, so
    // strictly disjoint — no boundary touch).
    val ranges = post.map(e => (e.minK, e.maxK)).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq(a, b) => assert(a._2 < b._1,
        s"post-compact k ranges must be disjoint, got $ranges")
      case _ => ()
    }
    // Bounds are recomputed from rows actually written — exact, and the
    // global algebra still matches the pre state.
    assert(post.map(_.rows).sum === pre.map(_.rows).sum)
    assert(post.map(_.minK).min === pre.map(_.minK).min)
    assert(post.map(_.maxK).max === pre.map(_.maxK).max)
    assert(post.flatMap(_.vb).map(_._1).min === pre.flatMap(_.vb).map(_._1).min)
    assert(post.flatMap(_.vb).map(_._2).max === pre.flatMap(_.vb).map(_._2).max)
    // Row content exactly preserved by the rewrite.
    val postRows = spark.read.format("mlog").load(dir)
      .orderBy("id", "k", "v").collect().toSeq
    assert(postRows === preRows)
    // THE point: the same k predicate now plans a strict file subset.
    val postScan = spark.read.format("mlog").load(dir).filter(col("k") < 20L)
    assert(postScan.count() === 20L)
    val (plannedN, totalN) = MLog.planned(postScan)
    assert(totalN === post.size && plannedN < totalN,
      s"clustered layout must prune: planned $plannedN/$totalN")
    // The pre-compaction snapshot keeps the old layout readable.
    val old = spark.read.format("mlog").option("versionAsOf", preVersion)
      .load(dir)
    assert(old.count() === 80L)
    // An unknown cluster key is refused before any work.
    intercept[IllegalArgumentException] {
      MLog.compact(spark, new Path(dir), targetRows = 25L,
        clusterBy = Some("nope"))
    }
    // A lone under-target file is a no-op, as in bin-packing.
    val dir2 = tmp()
    ledger(10).coalesce(1).write.format("mlog")
      .mode(SaveMode.Overwrite).save(dir2)
    ledger(50).coalesce(1).write.format("mlog")
      .mode(SaveMode.Append).save(dir2)
    val stats2 = MLog.compact(spark, new Path(dir2), targetRows = 20L,
      clusterBy = Some("k"))
    assert(stats2.merged === 0 && stats2.after === 2)
  }

  test("changesSince: the manifest diff is exactly the appended files") {
    val dir = tmp()
    ledger(50).coalesce(1).write.format("mlog").mode(SaveMode.Overwrite).save(dir) // v1
    ledger(30).coalesce(1).write.format("mlog").mode(SaveMode.Append).save(dir)    // v2
    ledger(20).coalesce(2).write.format("mlog").mode(SaveMode.Append).save(dir)    // v3
    def since(v: Int) = spark.read.format("mlog")
      .option("changesSince", v).load(dir)
    assert(since(1).count() === 50L, "v1→current adds the 30-row and 20-row commits")
    assert(since(2).count() === 20L)
    assert(since(3).count() === 0L, "no changes since the current snapshot")
    // Bounded end: versionAsOf composes — files v2 names that v1 does not.
    assert(spark.read.format("mlog").option("versionAsOf", 2)
      .option("changesSince", 1).load(dir).count() === 30L)
    // Across an OVERWRITE the diff is the whole new layout (documented:
    // rewritten files surface fully, like Iceberg's incremental scan).
    ledger(10).coalesce(1).write.format("mlog").mode(SaveMode.Overwrite).save(dir) // v4
    assert(since(3).count() === 10L)
  }

  test("txn ledger: a replayed (appId, version) commit is a no-op; ledger survives rewrites") {
    val dir = tmp()
    def writeTxn(df: DataFrame, ver: Long): Unit =
      df.coalesce(1).write.format("mlog").mode(SaveMode.Append)
        .option("txnAppId", "spec_app").option("txnVersion", ver).save(dir)
    writeTxn(ledger(50), 0L)
    writeTxn(ledger(30), 1L)
    assert(spark.read.format("mlog").load(dir).count() === 80L)
    val preVersions = MLog.versions(fs(dir), new Path(dir))
    val preNames = MLog.readManifest(fs(dir), new Path(dir)).map(_.name).toSet
    // REPLAY of batch 1 (same app, same version): data and ledger are one
    // atomic manifest, so the commit publishes nothing — no new snapshot,
    // no new manifest entries, and the staged files are cleaned up.
    writeTxn(ledger(30), 1L)
    assert(spark.read.format("mlog").load(dir).count() === 80L,
      "a replayed batch must not duplicate rows")
    assert(MLog.versions(fs(dir), new Path(dir)) === preVersions)
    val onDisk = Option(new java.io.File(dir).listFiles()).get
      .map(_.getName).filter(_.endsWith(".mlog")).toSet
    assert(onDisk === preNames, "replayed staged files must be deleted")
    // An OLDER version is equally refused (ledger records the max).
    writeTxn(ledger(30), 0L)
    assert(spark.read.format("mlog").load(dir).count() === 80L)
    // The NEXT version commits; a different appId has its own sequence.
    writeTxn(ledger(10), 2L)
    assert(spark.read.format("mlog").load(dir).count() === 90L)
    ledger(5).coalesce(1).write.format("mlog").mode(SaveMode.Append)
      .option("txnAppId", "other_app").option("txnVersion", 0L).save(dir)
    assert(spark.read.format("mlog").load(dir).count() === 95L)
    assert(MLog.readManifestFull(fs(dir), new Path(dir)).txn ===
      Map("spec_app" -> 2L, "other_app" -> 0L))
    // The ledger SURVIVES table rewrites: plain append, delete, compact.
    ledger(5).coalesce(1).write.format("mlog").mode(SaveMode.Append).save(dir)
    MLog.delete(spark, new Path(dir), _ => true, (id, _, _) => id >= 1000000L)
    MLog.compact(spark, new Path(dir), targetRows = 1000L)
    assert(MLog.readManifestFull(fs(dir), new Path(dir)).txn ===
      Map("spec_app" -> 2L, "other_app" -> 0L))
    // After all of which the replay is STILL refused.
    writeTxn(ledger(30), 2L)
    assert(spark.read.format("mlog").load(dir).count() === 100L)
    // Half-set txn options fail loudly at write planning.
    val err = intercept[Exception] {
      ledger(1).coalesce(1).write.format("mlog").mode(SaveMode.Append)
        .option("txnAppId", "spec_app").save(dir)
    }
    assert(err.getMessage.contains("txn"))
  }

  test("merge: upsert by id in ONE commit; files outside the source's id range carried") {
    val dir = tmp()
    // Base: two id-clustered files [0, 99] and [1000, 1099].
    ledger(100).coalesce(1).write.format("mlog").mode(SaveMode.Overwrite).save(dir)
    ledger(100).select((col("id") + 1000L).as("id"), col("k"), col("v"))
      .coalesce(1).write.format("mlog").mode(SaveMode.Append).save(dir)
    val pre = MLog.readManifest(fs(dir), new Path(dir))
    val preByName = pre.map(e => e.name -> e).toMap
    val preVersion = MLog.versions(fs(dir), new Path(dir)).last
    import spark.implicits._
    // Source: ids 50..79 updated (v = 7), ids 200..209 inserted.
    val source = ((50 until 80) ++ (200 until 210))
      .map(i => (i.toLong, (i % 7).toLong, 7L)).toDF("id", "k", "v")
      .coalesce(1)
    val stats = MLog.merge(spark, new Path(dir), source)
    // Only the low file's bounds overlap [50, 209]; the high file is
    // carried by reference. The WHOLE merge is one snapshot commit.
    assert(stats.rewritten === 1 && stats.carried === 1)
    assert(stats.updatedRows === 30L)
    assert(stats.insertedFiles === 1)
    assert(stats.newVersion === preVersion + 1)
    assert(MLog.versions(fs(dir), new Path(dir)).last === preVersion + 1)
    val post = MLog.readManifest(fs(dir), new Path(dir))
    assert(post.size === 3)
    assert(post.count(e => preByName.get(e.name).contains(e)) === 1)
    // Content: matched rows replaced, unmatched kept, new ids inserted.
    val back = spark.read.format("mlog").load(dir)
    assert(back.count() === 210L)
    assert(back.filter(col("id").between(50, 79)).agg(sum("v"))
      .head.getLong(0) === 30L * 7L)
    assert(back.filter(col("id") >= 200 && col("id") < 210).count() === 10L)
    assert(back.filter(col("id") < 50).agg(sum("v")).head.getLong(0) ===
      (0 until 50).map(_ * 10L).sum)
    // Pre-merge snapshot still serves the old values.
    assert(spark.read.format("mlog").option("versionAsOf", preVersion)
      .load(dir).filter(col("id").between(50, 79)).agg(sum("v"))
      .head.getLong(0) === (50 until 80).map(_ * 10L).sum)
    // Empty source: documented no-op.
    val noop = MLog.merge(spark, new Path(dir),
      Seq.empty[(Long, Long, Long)].toDF("id", "k", "v"))
    assert(noop.rewritten === 0 && noop.updatedRows === 0L &&
      noop.insertedFiles === 0)
    assert(noop.newVersion === preVersion + 1)
  }

  test("merge: the bounded-source contract is enforced loudly, not assumed") {
    val dir = tmp()
    ledger(50).coalesce(1).write.format("mlog").mode(SaveMode.Overwrite).save(dir)
    val preVersions = MLog.versions(fs(dir), new Path(dir))
    import spark.implicits._
    // Duplicate source ids: a target key matching multiple source rows is
    // the ambiguity Delta/Iceberg MERGE refuse — so does this one.
    val dup = intercept[IllegalArgumentException] {
      MLog.merge(spark, new Path(dir),
        Seq((1L, 0L, 7L), (1L, 0L, 8L)).toDF("id", "k", "v"))
    }
    assert(dup.getMessage.contains("duplicate"))
    // Over-budget key set: fails BEFORE the driver-side collect with the
    // split-or-rewrite guidance, instead of OOMing mid-collect.
    val big = intercept[IllegalArgumentException] {
      MLog.merge(spark, new Path(dir),
        spark.range(10L).select(col("id"), (col("id") % 7).as("k"),
          (col("id") * 10L).as("v")),
        maxSourceKeys = 5L)
    }
    assert(big.getMessage.contains("maxSourceKeys"))
    // Neither refusal committed anything.
    assert(MLog.versions(fs(dir), new Path(dir)) === preVersions)
    assert(spark.read.format("mlog").load(dir).count() === 50L)
  }

  test("merge: a MEMORY_ONLY caller cache is re-anchored to a disk-backed " +
      "copy — eviction cannot recompute the source mid-merge — and the " +
      "caller's cache level is untouched") {
    val dir = tmp()
    ledger(100).coalesce(1).write.format("mlog")
      .mode(SaveMode.Overwrite).save(dir)
    import spark.implicits._
    val source = (50 until 60).map(i => (i.toLong, (i % 7).toLong, 7L))
      .toDF("id", "k", "v").coalesce(1)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    try {
      val stats = MLog.merge(spark, new Path(dir), source)
      assert(stats.updatedRows === 10L)
      assert(source.storageLevel ===
        org.apache.spark.storage.StorageLevel.MEMORY_ONLY,
        "merge must neither unpersist nor re-level the caller's cache")
      assert(spark.read.format("mlog").load(dir)
        .filter(col("id").between(50, 59)).agg(sum("v"))
        .head.getLong(0) === 70L)
    } finally { source.unpersist(): Unit }
  }

  test("SQL VERSION AS OF via the graft catalog equals the versionAsOf option route") {
    val dir = tmp()
    ledger(700).repartitionByRange(7, col("k")).write.format("mlog")
      .mode(SaveMode.Overwrite).save(dir)
    ledger(10).coalesce(1).write.format("mlog").mode(SaveMode.Overwrite).save(dir)
    // LIVE-session registration: catalogs instantiate lazily on first
    // reference, so no session rebuild (the parser-injection route would
    // need one — exactly why the catalog is the right surface).
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sources.v2.GraftMLogCatalog].getName)
    def one(sql: String): Long = spark.sql(sql).head.getLong(0)
    assert(one(s"SELECT count(*) FROM graft.mlog.`$dir`") === 10L)
    assert(one(s"SELECT count(*) FROM graft.mlog.`$dir` VERSION AS OF 1") === 700L)
    assert(one(s"SELECT count(*) FROM graft.mlog.`$dir` VERSION AS OF 2") === 10L)
    // Route equivalence beyond counts: same rows as the option route.
    val viaSql = spark.sql(
      s"SELECT sum(v) FROM graft.mlog.`$dir` VERSION AS OF 1").head.getLong(0)
    val viaOpt = spark.read.format("mlog").option("versionAsOf", 1)
      .load(dir).agg(sum("v")).head.getLong(0)
    assert(viaSql === viaOpt)
    // Manifest min/max pruning still fires THROUGH the catalog route.
    val total = MLog.readManifestVersion(fs(dir), new Path(dir), 1).size
    val prq = spark.sql(
      s"SELECT count(*) FROM graft.mlog.`$dir` VERSION AS OF 1 WHERE k = 3")
    assert(prq.head.getLong(0) === 100L)
    val (planned, seen) = MLog.planned(prq)
    assert(seen === total && planned < total,
      s"catalog-route k = 3 must prune the v1 range files (planned $planned/$total)")
    // TIMESTAMP AS OF resolves against stamped commit times ("the newest
    // snapshot <= ts"): a current timestamp sees the current state; one
    // BEFORE the first retained snapshot is a loud refusal (that state is
    // unknown or expired), never a silent oldest. Unknown versions stay
    // loud too. (MLogCatalogDdlSpec owns the between-snapshots pin.)
    assert(one(s"SELECT count(*) FROM graft.mlog.`$dir` " +
      "TIMESTAMP AS OF current_timestamp()") === 10L)
    val ts = intercept[Exception] {
      spark.sql(
        s"SELECT count(*) FROM graft.mlog.`$dir` TIMESTAMP AS OF '2024-01-01'")
        .head
    }
    assert(ts.getMessage.contains("predates the first retained snapshot"))
    val gone = intercept[Exception] {
      spark.sql(s"SELECT count(*) FROM graft.mlog.`$dir` VERSION AS OF 99").head
    }
    assert(gone.getMessage.contains("version 99"))
    // ALTER stays refused (the ledger schema is fixed by design); DROP
    // is part of the SQL lifecycle since round 17 — it removes the store
    // (MLogCatalogDdlSpec owns the full DDL contract).
    val alter = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.mlog.`$dir` ADD COLUMN extra BIGINT")
    }
    assert(alter.getMessage.contains("fixed"))
    spark.sql(s"DROP TABLE graft.mlog.`$dir`")
    assert(MLog.versions(fs(dir), new Path(dir)).isEmpty,
      "DROP removes every snapshot the format owns")
  }

  test("merge-on-read delete: vectors mask rows with zero data bytes rewritten") {
    val dir = tmp()
    ledger(100).coalesce(1).write.format("mlog").mode(SaveMode.Overwrite).save(dir)
    ledger(100).select((col("id") + 1000L).as("id"), col("k"), col("v"))
      .coalesce(1).write.format("mlog").mode(SaveMode.Append).save(dir)
    val pre = MLog.readManifest(fs(dir), new Path(dir))
    val preVersion = MLog.versions(fs(dir), new Path(dir)).last
    def sizeOf(name: String): Long = new java.io.File(dir, name).length()
    val preSizes = pre.map(e => e.name -> sizeOf(e.name)).toMap
    val stats = MLog.deleteMor(spark, new Path(dir),
      e => e.minId < 100, (id, _, _) => id < 50)
    assert(stats.vectored === 1 && stats.carried === 1)
    assert(stats.removedRows === 50L && stats.newVersion === preVersion + 1)
    val post = MLog.readManifest(fs(dir), new Path(dir))
    // SAME data files — only a sidecar appeared; bytes untouched.
    assert(post.map(_.name).toSet === pre.map(_.name).toSet)
    post.foreach(e => assert(sizeOf(e.name) === preSizes(e.name)))
    assert(post.flatMap(_.dv).size === 1)
    assert(post.flatMap(_.dv).head.rows === 50L)
    // Readers skip the masked positions.
    val back = spark.read.format("mlog").load(dir)
    assert(back.count() === 150L)
    assert(back.filter(col("id") < 50).count() === 0L)
    assert(back.agg(sum("v")).head.getLong(0) ===
      ((50 until 100) ++ (0 until 100)).map(_ * 10L).sum)
    // Pre-delete snapshot still serves the masked rows.
    assert(spark.read.format("mlog").option("versionAsOf", preVersion)
      .load(dir).count() === 200L)
    // A SECOND MoR delete unions into a fresh vector (old one becomes
    // snapshot-retained garbage), and a file whose every physical row is
    // masked leaves the manifest entirely.
    val s2 = MLog.deleteMor(spark, new Path(dir),
      e => e.minId < 100, (id, _, _) => id < 100)
    assert(s2.removedRows === 50L)
    val post2 = MLog.readManifest(fs(dir), new Path(dir))
    assert(post2.size === 1 && post2.head.minId === 1000L,
      "a fully-masked file must leave no manifest entry")
    assert(spark.read.format("mlog").load(dir).count() === 100L)
    // Nothing-touched no-op mirrors delete's contract.
    val noop = MLog.deleteMor(spark, new Path(dir),
      e => e.minId > 1000000L, (_, _, _) => true)
    assert(noop.vectored === 0 && noop.removedRows === 0L)
    assert(noop.newVersion === MLog.versions(fs(dir), new Path(dir)).last)
  }

  test("deletion vectors compose with rewrite, compact, and vacuum") {
    val dir = tmp()
    ledger(100).coalesce(1).write.format("mlog").mode(SaveMode.Overwrite).save(dir)
    // Mask ids < 30 by vector, then COPY-ON-WRITE delete ids 30..49: the
    // rewrite must materialize the vector (skip its rows uncounted) and
    // count only the live matches it removed.
    MLog.deleteMor(spark, new Path(dir),
      _ => true, (id, _, _) => id < 30)
    val cow = MLog.delete(spark, new Path(dir),
      _ => true, (id, _, _) => id >= 30 && id < 50)
    assert(cow.removedRows === 20L,
      "vector-masked rows are not re-counted by the rewrite")
    val afterCow = MLog.readManifest(fs(dir), new Path(dir))
    assert(afterCow.size === 1 && afterCow.head.dv.isEmpty,
      "a rewrite materializes the deletion vector")
    assert(afterCow.head.rows === 50L && afterCow.head.minId === 50L)
    assert(spark.read.format("mlog").load(dir).agg(sum("v")).head.getLong(0)
      === (50 until 100).map(_ * 10L).sum)
    // merge over a vectored file: updates target live rows only.
    MLog.deleteMor(spark, new Path(dir), _ => true, (id, _, _) => id < 60)
    import spark.implicits._
    val mrg = MLog.merge(spark, new Path(dir),
      ((55 until 65).map(i => (i.toLong, 0L, 1L))).toDF("id", "k", "v")
        .coalesce(1))
    assert(mrg.updatedRows === 5L,
      "ids 55..59 are already masked; only 60..64 are live matches")
    assert(spark.read.format("mlog").load(dir)
      .filter(col("id").between(55, 64)).agg(sum("v")).head.getLong(0) === 10L,
      "all ten merge rows serve v = 1 afterwards")
    // compact carries vectored files instead of byte-packing them.
    ledger(10).coalesce(1).write.format("mlog").mode(SaveMode.Append).save(dir)
    ledger(10).coalesce(1).write.format("mlog").mode(SaveMode.Append).save(dir)
    MLog.deleteMor(spark, new Path(dir),
      e => e.maxId >= 65 && e.minId >= 50, (id, _, _) => id == 99L)
    val preCmp = MLog.readManifest(fs(dir), new Path(dir))
    val vectored = preCmp.filter(_.dv.isDefined).map(_.name).toSet
    assert(vectored.nonEmpty)
    val cs = MLog.compact(spark, new Path(dir), targetRows = 1000L)
    val postCmp = MLog.readManifest(fs(dir), new Path(dir))
    assert(vectored.subsetOf(postCmp.map(_.name).toSet),
      "vectored files are carried by compaction, never byte-packed")
    assert(spark.read.format("mlog").load(dir).count() ===
      preCmp.map(e => e.rows - e.dv.fold(0L)(_.rows)).sum)
    // vacuum reclaims superseded .dvec sidecars once snapshots expire,
    // and keeps the live one.
    MLog.expireVersions(fs(dir), new Path(dir), keepLast = 1)
    MLog.vacuum(fs(dir), new Path(dir), minAgeMs = 0L)
    val onDisk = Option(new java.io.File(dir).listFiles()).get.map(_.getName)
    val liveDv = postCmp.flatMap(_.dv).map(_.name).toSet
    assert(onDisk.filter(_.endsWith(".dvec")).toSet === liveDv)
    assert(cs.newVersion === MLog.versions(fs(dir), new Path(dir)).last)
  }

  test("native streaming sink: one ledger-stamped snapshot per epoch; a " +
      "restart continues epochs; a replayed epoch is refused wholesale") {
    val dir = tmp()
    val feed = java.nio.file.Files.createTempDirectory("mlog_sink_feed")
      .toFile
    val ckpt = java.nio.file.Files.createTempDirectory("mlog_sink_ckpt")
      .toFile.getAbsolutePath
    import spark.implicits._
    def feedFile(i: Int): Unit = {
      val stage = new java.io.File(feed, s".stage_$i")
      (0 until 20).map(j => (i * 100L + j, j.toLong % 3, j * 10L))
        .toDF("id", "k", "v").coalesce(1)
        .write.mode("overwrite").parquet(stage.getAbsolutePath)
      val part = stage.listFiles().filter(f =>
        f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath,
        new java.io.File(feed, s"b$i.parquet").toPath)
      // mtime-ordered so FileStreamSource batches follow feed order.
      java.nio.file.Files.setLastModifiedTime(
        new java.io.File(feed, s"b$i.parquet").toPath,
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() + i * 2000L))
      ()
    }
    def drain(): org.apache.spark.sql.streaming.StreamingQuery = {
      val q = spark.readStream
        .schema(org.apache.spark.sql.types.StructType.fromDDL(
          "id BIGINT, k BIGINT, v BIGINT"))
        .option("maxFilesPerTrigger", 1)
        .parquet(feed.getAbsolutePath)
        .writeStream.format("mlog")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start(dir)
      q.awaitTermination(); q
    }
    feedFile(0); feedFile(1)
    val q1 = drain()
    val app = s"mlog-stream-${q1.id}"
    assert(MLog.versions(fs(dir), new Path(dir)) === Seq(1, 2),
      "one snapshot per epoch")
    assert(MLog.readManifestFull(fs(dir), new Path(dir)).txn ===
      Map(app -> 1L))
    assert(spark.read.format("mlog").load(dir).count() === 40L)
    // RESTART from the same checkpoint with new data: the query id is
    // stable, epochs CONTINUE (2), and the ledger advances — not resets.
    feedFile(2)
    val q2 = drain()
    assert(q2.id === q1.id, "restart keeps the stable query id")
    assert(MLog.versions(fs(dir), new Path(dir)) === Seq(1, 2, 3))
    assert(MLog.readManifestFull(fs(dir), new Path(dir)).txn ===
      Map(app -> 2L))
    assert(spark.read.format("mlog").load(dir).count() === 60L)
    // REPLAYED EPOCH (sink committed, checkpoint didn't advance, restart
    // re-runs it): same (appId, epochId) — refused wholesale, staged
    // file deleted, zero new snapshots, zero new rows.
    val c = new org.apache.spark.util.SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    val w = MLogWriterFactory(dir, c).createWriter(0, 777L)
    w.write(org.apache.spark.sql.catalyst.InternalRow(9999L, 0L, 1L))
    val msg = w.commit().asInstanceOf[MLogCommit]
    MLogStreamingWrite(dir, c, truncateEachEpoch = false, app)
      .commit(2L, Array[org.apache.spark.sql.connector.write
        .WriterCommitMessage](msg))
    assert(MLog.versions(fs(dir), new Path(dir)) === Seq(1, 2, 3),
      "a replayed epoch must publish nothing")
    assert(spark.read.format("mlog").load(dir).count() === 60L)
    assert(!new java.io.File(dir, msg.name).exists(),
      "the replay's staged file is cleaned like an abort")
    // A NEW epoch through the same write commits normally.
    val w2 = MLogWriterFactory(dir, c).createWriter(0, 778L)
    w2.write(org.apache.spark.sql.catalyst.InternalRow(9999L, 0L, 1L))
    MLogStreamingWrite(dir, c, truncateEachEpoch = false, app)
      .commit(3L, Array[org.apache.spark.sql.connector.write
        .WriterCommitMessage](w2.commit()))
    assert(spark.read.format("mlog").load(dir).count() === 61L)
    assert(MLog.readManifestFull(fs(dir), new Path(dir)).txn ===
      Map(app -> 3L))
  }

  test("native streaming sink, Complete mode: every epoch REPLACES the " +
      "table in one truncate-commit; history and the ledger survive") {
    val dir = tmp()
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long)]
    val agg = mem.toDF().toDF("k", "v")
      .groupBy(col("k")).agg(count(lit(1)).as("n"))
      .select(col("k").as("id"), col("k"), col("n").as("v"))
    val ckpt = java.nio.file.Files.createTempDirectory("mlog_cm_ckpt")
      .toFile.getAbsolutePath
    val q = agg.writeStream.format("mlog")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete())
      .option("checkpointLocation", ckpt)
      .start(dir)
    mem.addData((0L, 1L), (1L, 1L), (0L, 1L))
    q.processAllAvailable()
    // Epoch 0: counts {0 -> 2, 1 -> 1}.
    assert(spark.read.format("mlog").load(dir).orderBy("k")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq ===
      Seq((0L, 2L), (1L, 1L)))
    mem.addData((1L, 1L), (2L, 1L))
    q.processAllAvailable()
    q.stop()
    // Epoch 1 REPLACED the table with the new complete result — no
    // stale epoch-0 rows — in one truncate-commit; the epoch-0 snapshot
    // still time-travels and the ledger advanced through the rewrite.
    assert(spark.read.format("mlog").load(dir).orderBy("k")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq ===
      Seq((0L, 2L), (1L, 2L), (2L, 1L)))
    val vs = MLog.versions(fs(dir), new Path(dir))
    assert(vs === Seq(1, 2), "one truncate-commit per epoch")
    assert(spark.read.format("mlog").option("versionAsOf", 1).load(dir)
      .count() === 2L, "the pre-replace epoch stays time-travelable")
    assert(MLog.readManifestFull(fs(dir), new Path(dir)).txn ===
      Map(s"mlog-stream-${q.id}" -> 1L),
      "the idempotence ledger survives the truncate-commits")
  }

  test("streaming source: micro-batches are manifest diffs; exactly once per commit") {
    val dir = tmp()
    val ckpt = tmp()
    ledger(50).coalesce(1).write.format("mlog").mode(SaveMode.Overwrite).save(dir)
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    def drainWith(q: org.apache.spark.sql.streaming.StreamingQuery): Unit =
      try q.processAllAvailable() finally q.stop()
    val q = spark.readStream.format("mlog").load(dir)
      .writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        val r = b.agg(count(lit(1)), sum("v")).head
        seen += ((id, r.getLong(0), r.getLong(1))); ()
      }
      .option("checkpointLocation", ckpt)
      .start()
    q.processAllAvailable()
    // Batch 0 = the whole table as of stream start.
    assert(seen.map(_._2).sum === 50L)
    // A commit while the stream runs arrives as ITS OWN diff batch.
    ledger(30).select((col("id") + 100L).as("id"), col("k"), col("v"))
      .coalesce(1).write.format("mlog").mode(SaveMode.Append).save(dir)
    q.processAllAvailable()
    assert(seen.map(_._2).sum === 80L)
    assert(seen.last._2 === 30L, "the new batch is the appended files ONLY")
    assert(seen.last._3 === (0 until 30).map(_ * 10L).sum)
    q.stop()
    // Restart from the checkpoint: nothing new → no re-delivery.
    val n0 = seen.size
    drainWith(spark.readStream.format("mlog").load(dir)
      .writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        val r = b.agg(count(lit(1)), sum("v")).head
        seen += ((id, r.getLong(0), r.getLong(1))); ()
      }
      .option("checkpointLocation", ckpt).start())
    assert(seen.drop(n0).map(_._2).sum === 0L,
      "a restarted stream must not re-deliver committed snapshots")
  }

  test("streaming source: non-append changes fail loudly; ignoreChanges opts in") {
    val dir = tmp()
    val ckpt = tmp()
    ledger(50).coalesce(1).write.format("mlog").mode(SaveMode.Overwrite).save(dir)
    val got = new java.util.concurrent.atomic.AtomicLong
    def stream(extra: Map[String, String]) = {
      val r = spark.readStream.format("mlog")
      extra.foreach { case (k, v) => r.option(k, v) }
      r.load(dir).writeStream
        .foreachBatch { (b: DataFrame, _: Long) =>
          got.addAndGet(b.count()); ()
        }
        .option("checkpointLocation", ckpt).start()
    }
    val q = stream(Map.empty)
    q.processAllAvailable(); q.stop()
    assert(got.get() === 50L)
    // OVERWRITE between pulls: delivered files vanish from the manifest.
    ledger(10).coalesce(1).write.format("mlog").mode(SaveMode.Overwrite).save(dir)
    val q2 = stream(Map.empty)
    val err = intercept[Exception] { q2.processAllAvailable() }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(err).exists(_.contains("NON-APPEND")),
      s"expected the non-append failure, got: ${messages(err).mkString(" | ")}")
    q2.stop()
    // ignoreChanges accepts the rewritten layout re-surfacing wholesale.
    val q3 = stream(Map("ignoreChanges" -> "true"))
    q3.processAllAvailable(); q3.stop()
    assert(got.get() === 60L, "the replanned batch delivers the new layout's files")
  }

  test("streaming source: a file added AND removed within one planned span " +
      "fails strict mode; ignoreChanges delivers the net state") {
    val dir = tmp()
    val ckpt = tmp()
    ledger(50).coalesce(1).write.format("mlog").mode(SaveMode.Overwrite).save(dir)
    val got = new java.util.concurrent.atomic.AtomicLong
    def stream(extra: Map[String, String]) = {
      val r = spark.readStream.format("mlog")
      extra.foreach { case (k, v) => r.option(k, v) }
      r.load(dir).writeStream
        .foreachBatch { (b: DataFrame, _: Long) =>
          got.addAndGet(b.count()); ()
        }
        .option("checkpointLocation", ckpt).start()
    }
    // Batch 0 delivers v1; the stream then sleeps at offset v1.
    val q = stream(Map.empty)
    q.processAllAvailable(); q.stop()
    assert(got.get() === 50L)
    // The forced interleaving: v2 commits a file, v3 deletes every row of
    // it (an all-deleted file leaves the manifest entirely) — both while
    // the stream is NOT pulling, so its next span is v1 -> v3. The v1
    // files are untouched (checkAppendOnly passes); the removal is of a
    // file this stream NEVER delivered.
    ledger(30).select((col("id") + 1000L).as("id"), col("k"), col("v"))
      .coalesce(1).write.format("mlog").mode(SaveMode.Append).save(dir)
    MLog.delete(spark, new Path(dir),
      e => e.minId >= 1000L, (id, _, _) => id >= 1000L)
    assert(MLog.versions(fs(dir), new Path(dir)) === Seq(1, 2, 3))
    // Strict mode fails LOUDLY (Delta's contract: any remove in the range
    // is a non-append change) — silently delivering zero rows would hide
    // that a mutator ran inside the span.
    val q2 = stream(Map.empty)
    val err = intercept[Exception] { q2.processAllAvailable() }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(err).exists(m =>
      m.contains("NON-APPEND") && m.contains("within the span")),
      s"expected the within-span removal failure, got: ${messages(err).mkString(" | ")}")
    q2.stop()
    // ignoreChanges = net-state delivery: the vanished file is skipped
    // (nothing replaced it — zero new rows), and the stream advances past
    // the span instead of wedging on it.
    val n0 = got.get()
    val q3 = stream(Map("ignoreChanges" -> "true"))
    q3.processAllAvailable()
    assert(got.get() === n0, "net state across add+remove is zero new rows")
    // …and a later ordinary append still arrives exactly once.
    ledger(10).select((col("id") + 5000L).as("id"), col("k"), col("v"))
      .coalesce(1).write.format("mlog").mode(SaveMode.Append).save(dir)
    q3.processAllAvailable(); q3.stop()
    assert(got.get() === n0 + 10L)
  }

  test("streaming source: batch 0 applies deletion vectors, not physical rows") {
    val dir = tmp()
    ledger(100).coalesce(1).write.format("mlog").mode(SaveMode.Overwrite).save(dir)
    // The table already carries a vector when the stream starts: the
    // initial batch must deliver the MASKED state (the diff planner
    // forwards each entry's dv to the partition reader).
    MLog.deleteMor(spark, new Path(dir), _ => true, (id, _, _) => id < 40)
    val got = new java.util.concurrent.atomic.AtomicLong
    val vSum = new java.util.concurrent.atomic.AtomicLong
    val q = spark.readStream.format("mlog").load(dir)
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        val r = b.agg(count(lit(1)), sum("v")).head
        got.addAndGet(r.getLong(0))
        if (!r.isNullAt(1)) vSum.addAndGet(r.getLong(1))
        ()
      }
      .option("checkpointLocation", tmp())
      .start()
    q.processAllAvailable(); q.stop()
    assert(got.get() === 60L, "masked rows must not stream")
    assert(vSum.get() === (40 until 100).map(_ * 10L).sum)
  }

  test("streaming source: offset json round-trips") {
    import graft.sources.v2.MLogOffset
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    val stream = new graft.sources.v2.MLogMicroBatchStream(
      tmp(), conf, MLog.Schema, Array.empty, ignoreChanges = false)
    assert(stream.deserializeOffset(MLogOffset(7).json()) === MLogOffset(7))
    // A split-version offset keeps its add index.
    assert(stream.deserializeOffset(MLogOffset(7, 3).json()) ===
      MLogOffset(7, 3))
    // Pre-admission-control checkpoints carry no index: complete version.
    assert(stream.deserializeOffset("""{"version":7}""") === MLogOffset(7, -1))
    assert(stream.initialOffset() === MLogOffset(0))
    assert(stream.latestOffset(MLogOffset(0), ReadLimit.allAvailable()) ===
      MLogOffset(0),
      "an empty store's latest offset is the start — no batch planned")
  }

  test("streaming source: maxVersionsPerTrigger paces a backlog drain " +
      "one commit per micro-batch") {
    val dir = tmp()
    // A 3-commit backlog BEFORE the stream starts: without admission
    // control batch 0 would deliver all of it at once.
    ledger(50).coalesce(1).write.format("mlog").mode(SaveMode.Overwrite).save(dir)
    ledger(30).select((col("id") + 100L).as("id"), col("k"), col("v"))
      .coalesce(1).write.format("mlog").mode(SaveMode.Append).save(dir)
    ledger(20).select((col("id") + 200L).as("id"), col("k"), col("v"))
      .coalesce(1).write.format("mlog").mode(SaveMode.Append).save(dir)
    val batches = scala.collection.mutable.ArrayBuffer.empty[Long]
    // Trigger.AvailableNow exercises prepareForTriggerAvailableNow: the
    // drain target is pinned at start and reached in budget-sized steps.
    val q = spark.readStream.format("mlog")
      .option("maxVersionsPerTrigger", 1)
      .load(dir)
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        batches += b.count(); ()
      }
      .option("checkpointLocation", tmp())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(batches.filter(_ > 0L) === Seq(50L, 30L, 20L),
      s"each commit must arrive as its own micro-batch, got $batches")
  }

  test("streaming source: maxFilesPerTrigger splits a whole-table batch 0 " +
      "inside one commit") {
    val dir = tmp()
    // ONE commit of 5 files: a version budget cannot split it; the file
    // budget must, via intra-version (version, index) offsets.
    ledger(100).repartition(5).write.format("mlog")
      .mode(SaveMode.Overwrite).save(dir)
    assert(MLog.readManifest(fs(dir), new Path(dir)).size === 5)
    val batches = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.format("mlog")
      .option("maxFilesPerTrigger", 2)
      .load(dir)
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        batches += b.count(); ()
      }
      .option("checkpointLocation", tmp())
      .start()
    q.processAllAvailable()
    // 5 files under a budget of 2 → 3 non-empty batches (2 + 2 + 1 files),
    // 100 rows exactly once.
    assert(batches.count(_ > 0L) === 3,
      s"5 files / budget 2 must take 3 micro-batches, got $batches")
    assert(batches.sum === 100L)
    // The pacing holds for a LIVE commit too — and resumes mid-stream.
    ledger(60).select((col("id") + 500L).as("id"), col("k"), col("v"))
      .repartition(3).write.format("mlog").mode(SaveMode.Append).save(dir)
    val before = batches.size
    q.processAllAvailable()
    val fresh = batches.drop(before).filter(_ > 0L)
    assert(fresh.size === 2, s"3 new files / budget 2 → 2 batches, got $fresh")
    assert(fresh.sum === 60L)
    q.stop()
  }

  test("streaming source: ignoreChanges re-delivers a file whose deletion " +
      "vector changed in place; strict mode fails loudly") {
    val dir = tmp()
    val ckpt = tmp()
    ledger(50).coalesce(1).write.format("mlog").mode(SaveMode.Overwrite).save(dir)
    val got = new java.util.concurrent.atomic.AtomicLong
    def stream(extra: Map[String, String]) = {
      val r = spark.readStream.format("mlog")
      extra.foreach { case (k, v) => r.option(k, v) }
      r.load(dir).writeStream
        .foreachBatch { (b: DataFrame, _: Long) =>
          got.addAndGet(b.count()); ()
        }
        .option("checkpointLocation", ckpt).start()
    }
    val q = stream(Map.empty)
    q.processAllAvailable(); q.stop()
    assert(got.get() === 50L)
    // Merge-on-read delete: SAME file name, a .dvec appears — the change
    // a name-only diff silently skips.
    MLog.deleteMor(spark, new Path(dir), _ => true, (id, _, _) => id < 10)
    // Strict mode: a re-vectored delivered file is a NON-APPEND change.
    val q2 = stream(Map.empty)
    val err = intercept[Exception] { q2.processAllAvailable() }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(err).exists(_.contains("NON-APPEND")))
    q2.stop()
    // ignoreChanges: the changed ENTRY re-surfaces wholesale — the file
    // re-delivers with its vector applied (40 live rows), exactly Delta's
    // re-surfacing semantics, not a silent skip.
    got.set(0L)
    val q3 = stream(Map("ignoreChanges" -> "true"))
    q3.processAllAvailable(); q3.stop()
    assert(got.get() === 40L,
      "the DV-only change must re-deliver the file's masked state")
  }

  test("limit pushdown plans only the file prefix covering n rows; a " +
      "filter declines the bound") {
    val dir = tmp()
    ledger(700).repartitionByRange(7, col("k")).write.format("mlog")
      .mode(SaveMode.Overwrite).save(dir)
    // 7 files of ~100 rows: LIMIT 5 needs exactly one.
    val tiny = spark.read.format("mlog").load(dir).limit(5)
    assert(tiny.collect().length === 5)
    val (plannedFiles, total) = MLog.planned(tiny)
    assert(total === 7 && plannedFiles === 1,
      s"LIMIT 5 must plan 1/7 files, planned $plannedFiles/$total")
    // A limit spanning file boundaries takes the covering prefix.
    val two = spark.read.format("mlog").load(dir).limit(150)
    assert(two.collect().length === 150)
    assert(MLog.planned(two)._1 === 2)
    // With a residual filter the engine keeps the limit above the
    // filter, and the scan must NOT bound its files.
    val filtered = spark.read.format("mlog").load(dir)
      .filter(col("v") >= 0).limit(5)
    assert(filtered.collect().length === 5)
    assert(MLog.planned(filtered)._1 === 7,
      "a filtered scan must not limit-prune files")
  }

  test("zero-column columnar batches: count over a limited scan reads " +
      "rows with no columns and still counts masked files right") {
    val dir = tmp()
    ledger(700).repartitionByRange(7, col("k")).write.format("mlog")
      .mode(SaveMode.Overwrite).save(dir)
    // count() over LIMIT: the aggregate cannot push (a Limit sits
    // between), the scan prunes to ZERO columns, and the columnar reader
    // must produce empty-schema batches whose row counts are exact.
    assert(spark.read.format("mlog").load(dir).limit(5).count() === 5L)
    assert(spark.read.format("mlog").load(dir).limit(150).count() === 150L)
    // Same path over a deletion vector: masked rows must not count.
    MLog.deleteMor(spark, new Path(dir), _ => true, (id, _, _) => id % 2 == 0L)
    assert(spark.read.format("mlog").load(dir).limit(100000).count() === 350L)
  }

  test("metadata-only aggregates: unfiltered COUNT/MIN/MAX answer from " +
      "the manifest; filters, DISTINCT, and DV-masked extremes decline") {
    val dir = tmp()
    ledger(700).repartitionByRange(7, col("k")).write.format("mlog")
      .mode(SaveMode.Overwrite).save(dir)
    def isMeta(df: DataFrame): Boolean =
      df.queryExecution.executedPlan.toString.contains("metadata-only")
    val agg = spark.read.format("mlog").load(dir)
      .agg(count(lit(1)).as("n"), count(col("v")).as("nv"),
        min(col("id")).as("mn"), max(col("id")).as("mx"),
        min(col("k")).as("mnk"), max(col("k")).as("mxk"),
        min(col("v")).as("mnv"), max(col("v")).as("mxv"))
    assert(isMeta(agg), "unfiltered count/min/max must push to the manifest:\n" +
      agg.queryExecution.executedPlan)
    assert(agg.collect().head.toSeq ===
      Seq(700L, 700L, 0L, 699L, 0L, 6L, 0L, 6990L))
    // A filter declines (residuals must re-apply row-level) …
    val filtered = spark.read.format("mlog").load(dir)
      .filter(col("k") > 3).agg(count(lit(1)))
    assert(!isMeta(filtered))
    assert(filtered.head.getLong(0) === ledger(700)
      .filter(col("k") > 3).count())
    // … DISTINCT declines …
    val distinct = spark.read.format("mlog").load(dir)
      .agg(countDistinct(col("k")))
    assert(!isMeta(distinct) && distinct.head.getLong(0) === 7L)
    // … and on a vectored table COUNT still pushes (logical rows carry
    // the DV adjustment), while MIN/MAX is decided PER EXTREME: it
    // pushes iff some file attaining the global extreme is vector-free
    // (its bound row is live and unbeatable), and declines only when
    // every attaining file is masked (the extreme row's liveness is
    // unknowable from metadata). ids 0..9 spread over all 7 k-range
    // files, so every file gains a vector here — both id extremes sit
    // in vectored files and decline.
    MLog.deleteMor(spark, new Path(dir), _ => true, (id, _, _) => id < 10)
    val cnt = spark.read.format("mlog").load(dir).agg(count(lit(1)))
    assert(isMeta(cnt) && cnt.head.getLong(0) === 690L)
    val mn = spark.read.format("mlog").load(dir).agg(min(col("id")))
    assert(!isMeta(mn) && mn.head.getLong(0) === 10L)
    // Time travel composes: the pinned snapshot's manifest answers.
    val tt = spark.read.format("mlog").option("versionAsOf", 1).load(dir)
      .agg(count(lit(1)), max(col("id")))
    assert(isMeta(tt) && tt.head.toSeq === Seq(700L, 699L))
    // The sharpened half: vector only SOME files, extremes still
    // attained by vector-free files keep pushing — the common
    // post-delete table does not lose the metadata answer.
    val dir2 = tmp()
    ledger(700).repartitionByRange(7, col("id")).write.format("mlog")
      .mode(SaveMode.Overwrite).save(dir2)
    // Mask rows only in the MIDDLE id file: both id extremes (0, 699)
    // live in vector-free edge files; max(v)=6990 rides with id 699.
    MLog.deleteMor(spark, new Path(dir2), _ => true,
      (id, _, _) => id >= 330 && id < 340)
    val sharp = spark.read.format("mlog").load(dir2)
      .agg(count(lit(1)), min(col("id")), max(col("id")), max(col("v")))
    assert(isMeta(sharp),
      "extremes attained by vector-free files must still push under DVs:\n" +
        sharp.queryExecution.executedPlan)
    assert(sharp.collect().head.toSeq === Seq(690L, 0L, 699L, 6990L))
    // …while an extreme attained ONLY by a vectored file declines: mask
    // something in the id-min file and min(id) must fall back to a scan.
    MLog.deleteMor(spark, new Path(dir2), _ => true, (id, _, _) => id == 3)
    val edge = spark.read.format("mlog").load(dir2).agg(min(col("id")))
    assert(!isMeta(edge) && edge.head.getLong(0) === 0L)
    val still = spark.read.format("mlog").load(dir2).agg(max(col("id")))
    assert(isMeta(still) && still.head.getLong(0) === 699L,
      "the other extreme's file is still vector-free — max keeps pushing")
  }

  test("per-file v bounds: a v predicate prunes files like id/k; a " +
      "legacy manifest without them stays readable, keeps every file, " +
      "and declines the v metadata-extremes") {
    val dir = tmp()
    // v-clustered layout: v = id * 10, so an id-range layout IS a
    // v-range layout — a v filter must cut files on manifest bounds.
    ledger(700).repartitionByRange(7, col("id")).write.format("mlog")
      .mode(SaveMode.Overwrite).save(dir)
    val total = MLog.readManifest(fs(dir), new Path(dir)).size
    val q = spark.read.format("mlog").load(dir).filter(col("v") < 500L)
    val (planned, seen) = MLog.planned(q)
    assert(seen === total && planned < total,
      s"v < 500 must prune v-clustered files (planned $planned/$total)")
    assert(q.count() === 50L)
    // LEGACY manifest: strip minV/maxV (and the commit "ts") from the
    // CURRENT pointer and every snapshot — the store a pre-upgrade
    // writer left behind. Reads stay green, a v filter keeps all files
    // (unknown bounds are kept, residuals re-apply), MIN/MAX(v)
    // declines while id/k extremes still push, and TIMESTAMP AS OF
    // falls back to snapshot-file mtimes.
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    new java.io.File(dir).listFiles().filter(f =>
      f.getName == MLog.ManifestName || f.getName.startsWith("_mlog_v"))
      .foreach { f =>
        val root = mapper.readTree(java.nio.file.Files.readAllBytes(f.toPath))
          .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
        root.remove("ts")
        root.get("files").forEach { n =>
          n.asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
            .remove(java.util.List.of("minV", "maxV")): Unit
        }
        // The local FS keeps a .crc sidecar per file: drop it so the
        // rewritten manifest does not read as a checksum mismatch.
        new java.io.File(dir, s".${f.getName}.crc").delete()
        java.nio.file.Files.write(f.toPath, mapper.writeValueAsBytes(root))
        ()
      }
    val legacy = spark.read.format("mlog").load(dir)
    assert(legacy.count() === 700L, "a legacy manifest must read green")
    val lq = legacy.filter(col("v") < 500L)
    val (lPlanned, lSeen) = MLog.planned(lq)
    assert(lSeen === total && lPlanned === total,
      "unknown v bounds must KEEP every file, never guess")
    assert(lq.count() === 50L)
    def isMeta(df: DataFrame): Boolean =
      df.queryExecution.executedPlan.toString.contains("metadata-only")
    val mv = spark.read.format("mlog").load(dir).agg(min(col("v")))
    assert(!isMeta(mv) && mv.head.getLong(0) === 0L,
      "MIN(v) must decline on unbounded legacy entries")
    val mi = spark.read.format("mlog").load(dir)
      .agg(min(col("id")), max(col("k")))
    assert(isMeta(mi) && mi.head.toSeq === Seq(0L, 6L),
      "id/k extremes still push — their bounds never left the manifest")
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sources.v2.GraftMLogCatalog].getName)
    assert(spark.sql(s"SELECT count(*) FROM graft.mlog.`$dir` " +
      "TIMESTAMP AS OF current_timestamp()").head.getLong(0) === 700L,
      "legacy snapshots resolve TIMESTAMP AS OF by file mtime")
  }

  test("vectorized read path: the scan emits ColumnarBatches under a " +
      "ColumnarToRow, and masked/pruned/metadata columns stay exact") {
    val dir = tmp()
    // > one batch (4096) of rows, a deletion vector, and a multi-file
    // layout: every wrinkle of the columnar fill in one store.
    import spark.implicits._
    (0 until 10000).map(i => (i.toLong, (i % 7).toLong, i * 10L))
      .toDF("id", "k", "v").repartitionByRange(3, col("id"))
      .write.format("mlog").mode(SaveMode.Overwrite).save(dir)
    MLog.deleteMor(spark, new Path(dir), _ => true, (id, _, _) => id % 3 == 0L)
    val df = spark.read.format("mlog").load(dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ColumnarToRow"),
      s"expected the vectorized route (ColumnarToRow over the scan), got\n$plan")
    assert(df.count() === (0 until 10000).count(_ % 3 != 0).toLong)
    assert(df.agg(sum("v")).head.getLong(0) ===
      (0 until 10000).filter(_ % 3 != 0).map(_ * 10L).sum)
    // Column pruning + the _file metadata column ride the same batches.
    val perFile = df.select(col("_file"), col("k")).groupBy("_file")
      .count().collect()
    assert(perFile.length === 3)
    assert(perFile.map(_.getLong(1)).sum ===
      (0 until 10000).count(_ % 3 != 0).toLong)
  }

  test("runtime file pruning: a join's dynamic pruning subquery drops " +
      "files whose manifest bounds miss the build side's keys") {
    val dir = tmp()
    // 7 id-clustered files over ids 0..699.
    ledger(700).select(col("id"), col("id").as("k"), col("v"))
      .repartitionByRange(7, col("id")).write.format("mlog")
      .mode(SaveMode.Overwrite).save(dir)
    val entries = MLog.readManifest(fs(dir), new Path(dir))
    assert(entries.size === 7)
    // A SELECTIVE dimension whose predicate is on tag, NOT the join key:
    // constraint propagation cannot infer any id bound from it (a filter
    // on fid itself would be inferred onto id and prune STATICALLY), so
    // the only way the fact scan learns the surviving keys — fids 0..99,
    // one file's range — is the DynamicPruningSubquery at runtime.
    import spark.implicits._
    val dimDir = tmp()
    (0 until 700).map(i => (i.toLong, i / 100))
      .toDF("fid", "tag").write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir).filter(col("tag") === 0)
    val fact = spark.read.format("mlog").load(dir)
    val joined = fact.join(dim, col("id") === col("fid"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
    // collect(), not head(): head plans a SEPARATE limited query, and the
    // probe below must inspect the QueryExecution that actually ran.
    val r = joined.collect().head
    assert(r.getLong(0) === 100L &&
      r.getLong(1) === (0 until 100).map(_ * 10L).sum)
    // The EXECUTED scan (AQE re-plans; the pre-adaptive instance is not
    // the one runtime filtering narrowed — descend into the final plan).
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.datasources.v2.BatchScanExec] =
      p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          scans(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          scans(q.plan)
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          Seq(b)
        case other => other.children.flatMap(scans)
      }
    val scanExec = scans(joined.queryExecution.executedPlan)
      .find(_.scan.isInstanceOf[graft.sources.v2.MLogScan]).get
    assert(scanExec.runtimeFilters.nonEmpty,
      s"expected a planned runtime filter on the mlog scan, got\n" +
        joined.queryExecution.executedPlan)
    val (runtime, static) =
      scanExec.scan.asInstanceOf[graft.sources.v2.MLogScan].runtimePlanned
    assert(static === 7 && runtime === 1,
      s"100 keys in one file's bounds must prune 7 -> 1, got $runtime/$static")
  }

  test("streaming source: maxBytesPerTrigger splits a commit on the " +
      "manifest's byte sizes; an over-budget file still makes progress") {
    val dir = tmp()
    // ONE commit of 5 equal files (20 rows each = 488 bytes on disk).
    ledger(100).repartition(5).write.format("mlog")
      .mode(SaveMode.Overwrite).save(dir)
    val entries = MLog.readManifest(fs(dir), new Path(dir))
    assert(entries.size === 5 && entries.forall(_.sizeBytes === 488L))
    def drain(bytes: Long): Seq[Long] = {
      val batches = scala.collection.mutable.ArrayBuffer.empty[Long]
      val q = spark.readStream.format("mlog")
        .option("maxBytesPerTrigger", bytes)
        .load(dir)
        .writeStream
        .foreachBatch { (b: DataFrame, _: Long) =>
          batches += b.count(); ()
        }
        .option("checkpointLocation", tmp())
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      batches.toSeq.filter(_ > 0L)
    }
    // Soft max at 900 B: file 1 (488) leaves 412 > 0 so file 2 is
    // admitted (overshoot allowed), file 3 is not → (2, 2, 1) files.
    assert(drain(900L) === Seq(40L, 40L, 20L))
    // A budget SMALLER than any file still admits one file per trigger —
    // an oversized file must never wedge the stream.
    assert(drain(100L) === Seq(20L, 20L, 20L, 20L, 20L))
    // Composed with the file budget: the tighter constraint ends each
    // trigger (3-file budget, bytes end it at 2).
    val batches = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.format("mlog")
      .option("maxBytesPerTrigger", 900L).option("maxFilesPerTrigger", 3)
      .load(dir)
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) => batches += b.count(); () }
      .option("checkpointLocation", tmp())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(batches.toSeq.filter(_ > 0L) === Seq(40L, 40L, 20L))
  }

  test("_file metadata column: selectable, matches the manifest, absent " +
      "from star expansion") {
    val dir = tmp()
    ledger(60).repartition(3).write.format("mlog").mode(SaveMode.Overwrite).save(dir)
    val names = MLog.readManifest(fs(dir), new Path(dir)).map(_.name).toSet
    val df = spark.read.format("mlog").load(dir)
    // SELECT * must NOT leak the metadata column (Spark's contract).
    assert(df.columns.toSeq === Seq("id", "k", "v"))
    val got = df.select(col("_file"), col("id"))
    val byFile = got.groupBy("_file").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byFile.keySet === names, "every row's _file is a manifest name")
    assert(byFile.values.sum === 60L)
  }

  test("a split offset whose slicing basis changed is refused, not mis-sliced") {
    import graft.sources.v2.{MLogMicroBatchStream, MLogOffset}
    val dir = tmp()
    ledger(60).repartition(3).write.format("mlog").mode(SaveMode.Overwrite).save(dir)
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    val stream = new MLogMicroBatchStream(
      dir, conf, MLog.Schema, Array.empty, ignoreChanges = false)
    // The matching basis plans the remaining 2 of 3 adds.
    assert(stream.planInputPartitions(
      MLogOffset(1, 1, of = 3), MLogOffset(1)).length === 2)
    // A recorded basis of 5 against the recomputed 3 means the slicing
    // list changed under the checkpoint (read options toggled across a
    // restart, or history rewritten): loud refusal, never a silent skip.
    val err = intercept[IllegalArgumentException] {
      stream.planInputPartitions(MLogOffset(1, 1, of = 5), MLogOffset(1))
    }
    assert(err.getMessage.contains("read options"))
    // Legacy split offsets (no recorded basis) still plan.
    assert(stream.planInputPartitions(
      MLogOffset(1, 1), MLogOffset(1)).length === 2)
  }

  test("corruption fails loudly: truncated data, missing data, damaged " +
      "pointer, mis-counted deletion vector") {
    import graft.sources.v2.{MLogDataSource => _, _}
    // 1. TRUNCATED data file: the manifest's row count bounds the read,
    // so bytes ending early are corruption — EOF, never a silent
    // under-read.
    val d1 = tmp()
    ledger(50).coalesce(1).write.format("mlog").mode(SaveMode.Overwrite).save(d1)
    val f1 = MLog.readManifest(fs(d1), new Path(d1)).head
    val localFs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sessionState.newHadoopConf())
    def rewriteWith(dir: String, name: String,
                    mutate: Array[Byte] => Array[Byte]): Unit = {
      // Re-written through the checksummed local fs so the .crc sidecar
      // tracks the damage — the CONTENT defect, not a checksum artifact,
      // is what each case pins.
      val bytes = mutate(java.nio.file.Files.readAllBytes(
        new java.io.File(dir, name).toPath))
      val o = localFs.create(new Path(dir, name), true)
      o.write(bytes); o.close()
    }
    rewriteWith(d1, f1.name, _.dropRight(16))
    // Documented tradeoff of metadata-answered aggregates: a bare
    // count() is served from the MANIFEST and succeeds — corruption is
    // detected when data is READ, exactly like Delta's stats-answered
    // COUNT over a damaged parquet file.
    assert(spark.read.format("mlog").load(d1).count() === 50L)
    val e1 = intercept[Exception] {
      spark.read.format("mlog").load(d1).agg(sum("v")).head
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    def hasEof(t: Throwable): Boolean = t != null &&
      (t.isInstanceOf[java.io.EOFException] ||
        Option(t.getMessage).exists(_.contains("EOF")) || hasEof(t.getCause))
    assert(hasEof(e1), s"truncation must surface as EOF, got $e1")

    // 2. MISSING data file (manifest names it, disk lost it): loud, named.
    val d2 = tmp()
    ledger(50).coalesce(1).write.format("mlog").mode(SaveMode.Overwrite).save(d2)
    val f2 = MLog.readManifest(fs(d2), new Path(d2)).head
    assert(new java.io.File(d2, f2.name).delete())
    val e2 = intercept[Exception] {
      spark.read.format("mlog").load(d2).agg(sum("v")).head
    }
    assert(messages(e2).exists(_.contains(f2.name)) ||
      e2.toString.contains(f2.name),
      s"the missing file must be NAMED, got $e2")

    // 3. DAMAGED pointer (garbage bytes, NOT a mid-swap artifact): loud —
    // real damage must never be silently out-arbitrated like a cache
    // mid-swap is.
    val d3 = tmp()
    ledger(10).coalesce(1).write.format("mlog").mode(SaveMode.Overwrite).save(d3)
    rewriteWith(d3, MLog.ManifestName, _ => "not json at all".getBytes("UTF-8"))
    val e3 = intercept[Exception] { MLog.readManifest(fs(d3), new Path(d3)) }
    assert(e3 != null) // Jackson parse or format require — loud either way

    // 4. Deletion vector whose header count disagrees with the manifest
    // (its first 8 bytes are magic+version; the count is at offset 8):
    // named refusal before any row is served.
    val d4 = tmp()
    ledger(60).coalesce(1).write.format("mlog").mode(SaveMode.Overwrite).save(d4)
    MLog.deleteMor(spark, new Path(d4), _ => true, (id, _, _) => id < 10)
    val dv = MLog.readManifest(fs(d4), new Path(d4)).flatMap(_.dv).head
    rewriteWith(d4, dv.name, { bytes =>
      java.nio.ByteBuffer.wrap(bytes).putLong(8, dv.rows + 1)
      bytes
    })
    val e4 = intercept[Exception] {
      spark.read.format("mlog").load(d4).agg(sum("v")).head
    }
    assert(messages(e4).exists(_.contains(dv.name)) ||
      e4.toString.contains(dv.name),
      s"the mis-counted vector must be NAMED, got $e4")
  }

  test("accepts(): manifest range algebra per filter shape") {
    val e = MLog.FileEntry("f", 10, 100, 200, 5, 9)
    assert(MLogScanBuilder.accepts(e, EqualTo("id", java.lang.Long.valueOf(150L))))
    assert(!MLogScanBuilder.accepts(e, EqualTo("id", java.lang.Long.valueOf(99L))))
    assert(MLogScanBuilder.accepts(e, GreaterThan("k", java.lang.Long.valueOf(8L))))
    assert(!MLogScanBuilder.accepts(e, GreaterThan("k", java.lang.Long.valueOf(9L))))
    assert(MLogScanBuilder.accepts(e, LessThanOrEqual("k", java.lang.Long.valueOf(5L))))
    assert(!MLogScanBuilder.accepts(e, LessThanOrEqual("k", java.lang.Long.valueOf(4L))))
  }

  test("scan statistics come from the manifest: exact rows/bytes, pruned " +
      "set, DV-adjusted; a small mlog join side auto-broadcasts") {
    val dir = tmp()
    ledger(700).repartitionByRange(7, col("k")).write.format("mlog")
      .mode(SaveMode.Overwrite).save(dir)
    val entries = MLog.readManifest(fs(dir), new Path(dir))
    // The manifest records each file's true on-disk length.
    entries.foreach { e =>
      assert(e.bytes === new java.io.File(dir, e.name).length(),
        s"${e.name} manifest bytes vs disk")
      assert(e.sizeBytes === 8L + 24L * e.rows)
    }
    def statsOf(df: DataFrame) = df.queryExecution.optimizedPlan.stats
    val full = statsOf(spark.read.format("mlog").load(dir))
    assert(full.rowCount.exists(_.toLong === 700L))
    assert(full.sizeInBytes === BigInt(entries.map(_.sizeBytes).sum))
    // A pruned scan reports the PRUNED set's stats, not the table's.
    val lone = entries.minBy(_.minK)
    val pruned = statsOf(spark.read.format("mlog").load(dir)
      .filter(col("k") <= lone.maxK && col("k") >= lone.minK))
    assert(pruned.sizeInBytes < full.sizeInBytes,
      s"pruned ${pruned.sizeInBytes} vs full ${full.sizeInBytes}")
    // A deletion vector lowers the LOGICAL row count the scan reports
    // (physical bytes unchanged — the data file is untouched).
    MLog.deleteMor(spark, new Path(dir), _ => true, (id, _, _) => id % 2 == 0L)
    val masked = statsOf(spark.read.format("mlog").load(dir))
    assert(masked.rowCount.exists(_.toLong === 350L))
    // The 100 TB point: a join against a small mlog dimension chooses
    // BROADCAST from these stats alone — no hint anywhere.
    val dim = tmp()
    ledger(25).coalesce(1).write.format("mlog")
      .mode(SaveMode.Overwrite).save(dim)
    val fact = spark.range(0, 10000L).selectExpr("id % 25 AS fk", "id AS x")
    val joined = fact.join(
      spark.read.format("mlog").load(dim), col("fk") === col("id"))
    val bhj = joined.queryExecution.sparkPlan.collectFirst {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
    }
    assert(bhj.isDefined,
      s"expected stats-chosen broadcast join, got\n${joined.queryExecution.sparkPlan}")
  }
}
