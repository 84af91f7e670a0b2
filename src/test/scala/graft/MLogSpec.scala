package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.sources.v2.{MLog, MLogBatchWrite, MLogScanBuilder, MLogWriterFactory}
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
    val got = spark.read.format("mlog").load(dir)
      .filter(col("k") === 3L).agg(count(lit(1)), min("id"), max("id")).head
    val (planned, seen) = MLog.lastPlanned
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
      val row = spark.sql(
        "SELECT count(*), sum(v) FROM mlog_spec_tbl WHERE k = 3").head
      val (planned, seen) = MLog.lastPlanned
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
    assert(MLog.vacuum(fs(dir), new Path(dir)) === 1L,
      "retained snapshot v1 must protect the 7 superseded files")
    // Expire v1, then vacuum reclaims exactly the files only it named.
    assert(MLog.expireVersions(fs(dir), new Path(dir), keepLast = 1) === 1)
    assert(MLog.vacuum(fs(dir), new Path(dir)) === 7L)
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

  test("accepts(): manifest range algebra per filter shape") {
    val e = MLog.FileEntry("f", 10, 100, 200, 5, 9)
    assert(MLogScanBuilder.accepts(e, EqualTo("id", java.lang.Long.valueOf(150L))))
    assert(!MLogScanBuilder.accepts(e, EqualTo("id", java.lang.Long.valueOf(99L))))
    assert(MLogScanBuilder.accepts(e, GreaterThan("k", java.lang.Long.valueOf(8L))))
    assert(!MLogScanBuilder.accepts(e, GreaterThan("k", java.lang.Long.valueOf(9L))))
    assert(MLogScanBuilder.accepts(e, LessThanOrEqual("k", java.lang.Long.valueOf(5L))))
    assert(!MLogScanBuilder.accepts(e, LessThanOrEqual("k", java.lang.Long.valueOf(4L))))
  }
}
