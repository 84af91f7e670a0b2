package graft.sources.v2

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.WriterCommitMessage
import org.apache.spark.util.SerializableConfiguration

/** Optimistic concurrency of the mlog commit protocol. Lives in the
  * source's package to reach `publishExclusive` — the mutator-conflict
  * half can only be exercised deterministically by publishing against a
  * base the test itself made stale. */
class MLogConcurrencySpec extends graft.SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("mlog_occ").toFile.getAbsolutePath

  private def fs(dir: String) =
    new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())

  private def conf() =
    new SerializableConfiguration(spark.sessionState.newHadoopConf())

  test("concurrent appends: every commit survives via CAS + re-merge") {
    // Repeated free-running race: a lucky scheduler green-lit round 15's
    // lost-update bug ~50-75 % of the time, so one pass is not a gate —
    // 8 independent 12-way races drive the pass-by-luck odds to noise.
    // The DETERMINISTIC version of the same interleaving is the forced-
    // interleave test below; this one keeps real scheduler chaos in play.
    for (round <- 0 until 8) {
      val dir = tmp()
      val c = conf()
      val pool = java.util.concurrent.Executors.newFixedThreadPool(6)
      try {
        val tasks = (0 until 12).map { i =>
          pool.submit(new Runnable {
            override def run(): Unit = {
              val w = MLogWriterFactory(dir, c).createWriter(i, i.toLong)
              w.write(InternalRow(i.toLong, (i % 7).toLong, i * 10L))
              val msg = w.commit()
              MLogBatchWrite(dir, c, truncateFirst = false)
                .commit(Array[WriterCommitMessage](msg))
            }
          })
        }
        tasks.foreach(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
      } finally pool.shutdown()
      // No lost updates: 12 files, 12 rows, 12 distinct snapshot versions,
      // and the arbitrated read serves the newest state even if the
      // pointer cache lagged an out-of-order swap.
      val m = MLog.readManifestFull(fs(dir), new Path(dir))
      assert(m.files.size === 12, s"round $round lost a commit")
      assert(m.files.map(_.rows).sum === 12L)
      assert(m.version === 12)
      assert(MLog.versions(fs(dir), new Path(dir)) === (1 to 12))
      assert(spark.read.format("mlog").load(dir).count() === 12L)
      assert(spark.read.format("mlog").load(dir)
        .agg(org.apache.spark.sql.functions.sum("v")).head.getLong(0) ===
        (0 until 12).map(_ * 10L).sum)
    }
  }

  /** One staged single-row file + its commit, the competing committer the
    * forced-interleave tests inject through [[MLog.commitRaceHook]]. */
  private def appendOne(dir: String, c: SerializableConfiguration,
                        id: Long): Unit = {
    val w = MLogWriterFactory(dir, c).createWriter(id.toInt, id)
    w.write(InternalRow(id, 0L, id * 10L))
    MLogBatchWrite(dir, c, truncateFirst = false)
      .commit(Array[WriterCommitMessage](w.commit()))
  }

  test("forced interleave: a commit landing between read and publish " +
      "costs the append its CAS, never its data") {
    val dir = tmp()
    val c = conf()
    // The hook fires between commitAppend's state read and its publish —
    // EXACTLY the window round 15's baseOf re-listing turned into a lost
    // update (the competing commit's files vanished from the next
    // manifest while the CAS still succeeded). One-shot: the competing
    // append's own commit re-enters the hook and must not recurse.
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    MLog.commitRaceHook = () =>
      if (fired.compareAndSet(false, true)) appendOne(dir, c, 100L)
    try appendOne(dir, c, 1L)
    finally MLog.commitRaceHook = () => ()
    assert(fired.get(), "the interleaving was not exercised")
    // Deterministic contract: the interleaved commit won slot v1, the
    // outer append lost the CAS, re-read, re-merged, published v2 — both
    // rows and both files survive.
    val m = MLog.readManifestFull(fs(dir), new Path(dir))
    assert(m.version === 2)
    assert(m.files.size === 2)
    assert(MLog.versions(fs(dir), new Path(dir)) === Seq(1, 2))
    assert(spark.read.format("mlog").load(dir)
      .agg(org.apache.spark.sql.functions.sum("v")).head.getLong(0) === 1010L)
  }

  test("forced interleave: a mutator whose base went stale mid-flight is " +
      "refused, and a retry from the fresh read succeeds") {
    val dir = tmp()
    val c = conf()
    import spark.implicits._
    (0 until 60).map(i => (i.toLong, (i % 7).toLong, i * 10L))
      .toDF("id", "k", "v").coalesce(2).write.format("mlog")
      .mode(org.apache.spark.sql.SaveMode.Overwrite).save(dir)
    // The hook fires inside publishExclusive, between the mutator's
    // content read (base = v1) and its conflict check: the injected
    // append moves the table to v2, so the delete's whole-state rewrite
    // is provably stale and MUST be refused — silently publishing it
    // would drop the appended file.
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    MLog.commitRaceHook = () =>
      if (fired.compareAndSet(false, true)) appendOne(dir, c, 1000L)
    val err =
      try intercept[java.util.ConcurrentModificationException] {
        MLog.delete(spark, new Path(dir),
          _ => true, (id, _, _) => id < 10L)
      } finally MLog.commitRaceHook = () => ()
    assert(fired.get(), "the interleaving was not exercised")
    assert(err.getMessage.contains("stale"))
    // Nothing was lost: both the original rows and the injected append
    // survive the refused publish.
    assert(spark.read.format("mlog").load(dir).count() === 61L)
    // The documented recovery — re-read and retry — now succeeds and
    // deletes from the CURRENT state, injected row included.
    val stats = MLog.delete(spark, new Path(dir),
      _ => true, (id, _, _) => id < 10L)
    assert(stats.removedRows === 10L)
    assert(spark.read.format("mlog").load(dir).count() === 51L)
  }

  test("mixed concurrency: appenders race retrying mutators and a fenced " +
      "vacuum; rows are exactly the survivors, versions stay contiguous") {
    val dir = tmp()
    val c = conf()
    import spark.implicits._
    // Seed: ids 0..19 across two files.
    (0 until 20).map(i => (i.toLong, (i % 7).toLong, i * 10L))
      .toDF("id", "k", "v").coalesce(2).write.format("mlog")
      .mode(org.apache.spark.sql.SaveMode.Overwrite).save(dir)
    val path = new Path(dir)
    // Debris a crashed writer left LONG ago (mtime an hour back): the
    // racing vacuum below must reclaim exactly this — unreferenced AND
    // old — while sparing every file the live appenders/mutators stage
    // mid-race (unreferenced but inside the grace window).
    val debris = new java.io.File(dir, "part-dead-writer.mlog")
    val dout = new java.io.DataOutputStream(
      new java.io.FileOutputStream(debris))
    dout.writeInt(MLog.Magic); dout.writeInt(MLog.Version)
    dout.writeLong(7L); dout.writeLong(7L); dout.writeLong(7L); dout.close()
    fs(dir).setTimes(new Path(debris.getAbsolutePath),
      System.currentTimeMillis() - 3600000L, -1L)
    val vacuumed = new java.util.concurrent.atomic.AtomicLong(0L)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    def retrying(what: String)(body: => Unit): Unit = {
      var attempts = 0
      var done = false
      while (!done) {
        try { body; done = true }
        catch {
          case _: java.util.ConcurrentModificationException =>
            attempts += 1
            assert(attempts < 200, s"$what starved of its retry window")
        }
      }
    }
    try {
      val tasks =
        // 8 appenders, one row each (ids 100..107).
        (0 until 8).map { i =>
          pool.submit(new Runnable {
            override def run(): Unit = appendOne(dir, c, 100L + i)
          })
        } ++ Seq(
          // A compactor that retries lost conflicts — content-neutral,
          // but every retry exercises publishExclusive's staleness check
          // against live appends.
          pool.submit(new Runnable {
            override def run(): Unit = (0 until 3).foreach { _ =>
              retrying("compact") {
                MLog.compact(spark, path, targetRows = 1000L): Unit
              }
            }
          }),
          // A deleter that must eventually land: drop ids < 5.
          pool.submit(new Runnable {
            override def run(): Unit = retrying("delete") {
              MLog.delete(spark, path,
                e => e.minId < 5L, (id, _, _) => id < 5L): Unit
            }
          }),
          // A vacuum racing it all, fenced by the min-age grace: free to
          // run at ANY point of the race because files staged by live
          // committers are seconds old — only the hour-old debris
          // qualifies. Without the fence this racer deletes
          // staged-but-unpublished files and some append publishes a
          // manifest naming a missing file.
          pool.submit(new Runnable {
            override def run(): Unit = (0 until 3).foreach { _ =>
              vacuumed.addAndGet(
                MLog.vacuum(fs(dir), path, minAgeMs = 60000L)): Unit
            }
          }))
      tasks.foreach(_.get(180, java.util.concurrent.TimeUnit.SECONDS))
    } finally pool.shutdown()
    // The fence held: the old debris was reclaimed (by one of the vacuum
    // passes), nothing else was.
    assert(vacuumed.get() === 1L, "exactly the hour-old debris is reclaimed")
    assert(!debris.exists())
    // Exactly the survivors: seed minus ids < 5, plus the 8 appends —
    // no commit lost to any interleaving, no deleted row resurrected by
    // a stale rewrite.
    val back = spark.read.format("mlog").load(dir)
    assert(back.count() === 23L)
    assert(back.agg(org.apache.spark.sql.functions.sum("v")).head.getLong(0) ===
      (5 until 20).map(_ * 10L).sum + (0 until 8).map(i => (100L + i) * 10L).sum)
    // The manifest agrees with the data, and the version log is
    // CONTIGUOUS — every winner took exactly the next slot.
    val m = MLog.readManifestFull(fs(dir), new Path(dir))
    assert(m.files.map(_.rows).sum === 23L)
    assert(MLog.versions(fs(dir), new Path(dir)) === (1 to m.version))
  }

  test("concurrent idempotent commits: one (appId, version) lands exactly once") {
    val dir = tmp()
    val c = conf()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      // 8 committers all claim txn ("app", 1) with one row each: the
      // ledger must admit exactly ONE; the rest clean their staged files.
      val tasks = (0 until 8).map { i =>
        pool.submit(new Runnable {
          override def run(): Unit = {
            val w = MLogWriterFactory(dir, c).createWriter(i, 100L + i)
            w.write(InternalRow(i.toLong, 0L, 1L))
            val msg = w.commit()
            new MLogWriteBuilder(new Path(dir), c, truncateFirst = false,
              txn = Some(("app", 1L)))
              .build().toBatch.commit(Array[WriterCommitMessage](msg))
          }
        })
      }
      tasks.foreach(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
    } finally pool.shutdown()
    val m = MLog.readManifestFull(fs(dir), new Path(dir))
    assert(m.files.size === 1, "exactly one of the racing replays commits")
    assert(m.txn === Map("app" -> 1L))
    assert(spark.read.format("mlog").load(dir).count() === 1L)
    // Losers' staged files were dropped like an abort.
    val onDisk = Option(new java.io.File(dir).listFiles()).get
      .map(_.getName).filter(_.endsWith(".mlog")).toSet
    assert(onDisk === m.files.map(_.name).toSet)
  }

  test("publishExclusive: a mutator's stale rewrite is refused, not silently applied") {
    val dir = tmp()
    import spark.implicits._
    def ledger(n: Int, shift: Long = 0L) =
      (0 until n).map(i => (i + shift, (i % 7).toLong, i * 10L))
        .toDF("id", "k", "v")
    ledger(50).coalesce(1).write.format("mlog")
      .mode(org.apache.spark.sql.SaveMode.Overwrite).save(dir)
    // A mutator reads the table at base = 1 …
    val read = MLog.readManifestFull(fs(dir), new Path(dir))
    assert(read.version === 1)
    // … then a concurrent commit lands (base moves to 2) …
    ledger(10, 1000L).coalesce(1).write.format("mlog")
      .mode(org.apache.spark.sql.SaveMode.Append).save(dir)
    // … so publishing the rewrite computed from base 1 must fail: it
    // would silently drop the concurrent commit's files.
    val err = intercept[java.util.ConcurrentModificationException] {
      MLog.publishExclusive(fs(dir), new Path(dir), baseVersion = 1,
        read.files, read.txn)
    }
    assert(err.getMessage.contains("stale"))
    // The table is untouched by the refused publish.
    assert(spark.read.format("mlog").load(dir).count() === 60L)
    assert(MLog.versions(fs(dir), new Path(dir)) === Seq(1, 2))
    // Re-read and retry — the fresh base publishes fine (delete nothing:
    // republish the re-read state).
    val again = MLog.readManifestFull(fs(dir), new Path(dir))
    MLog.publishExclusive(fs(dir), new Path(dir), again.version,
      again.files, again.txn)
    assert(spark.read.format("mlog").load(dir).count() === 60L)
    assert(MLog.readManifestFull(fs(dir), new Path(dir)).version === 3)
  }

  test("vacuum grace: a staged-but-unpublished file inside the window " +
      "survives; past it, it is reclaimable debris") {
    val dir = tmp()
    val c = conf()
    import spark.implicits._
    (0 until 30).map(i => (i.toLong, 0L, 1L)).toDF("id", "k", "v")
      .coalesce(1).write.format("mlog")
      .mode(org.apache.spark.sql.SaveMode.Overwrite).save(dir)
    // An executor stages a file; the driver has NOT published yet — this
    // is the in-flight window the fence exists for.
    val w = MLogWriterFactory(dir, c).createWriter(0, 99L)
    w.write(InternalRow(500L, 0L, 1L))
    val msg = w.commit().asInstanceOf[MLogCommit]
    val staged = new java.io.File(dir, msg.name)
    assert(staged.exists())
    // Default-grace vacuum spares it (and reports zero): the commit can
    // still land.
    assert(MLog.vacuum(fs(dir), new Path(dir)) === 0L)
    assert(staged.exists(), "a fenced vacuum must spare in-flight staging")
    MLogBatchWrite(dir, c, truncateFirst = false)
      .commit(Array[WriterCommitMessage](msg))
    assert(spark.read.format("mlog").load(dir).count() === 31L)
    // The same file pattern aged past the grace with no commit = a dead
    // writer's debris; a fresh orphan plays that role here.
    val w2 = MLogWriterFactory(dir, c).createWriter(1, 100L)
    w2.write(InternalRow(600L, 0L, 1L))
    val orphan = new java.io.File(dir,
      w2.commit().asInstanceOf[MLogCommit].name)
    fs(dir).setTimes(new Path(orphan.getAbsolutePath),
      System.currentTimeMillis() - MLog.DefaultVacuumGraceMs - 1000L, -1L)
    assert(MLog.vacuum(fs(dir), new Path(dir)) === 1L)
    assert(!orphan.exists())
    assert(spark.read.format("mlog").load(dir).count() === 31L,
      "reclaiming debris never changes the table")
  }

  test("pointer lagging behind newer snapshots is out-arbitrated by readers") {
    val dir = tmp()
    import spark.implicits._
    (0 until 30).map(i => (i.toLong, 0L, 1L)).toDF("id", "k", "v")
      .coalesce(1).write.format("mlog")
      .mode(org.apache.spark.sql.SaveMode.Overwrite).save(dir)
    (0 until 20).map(i => (i + 100L, 0L, 1L)).toDF("id", "k", "v")
      .coalesce(1).write.format("mlog")
      .mode(org.apache.spark.sql.SaveMode.Append).save(dir)
    // Regress the pointer cache to v1's bytes (an out-of-order swap by a
    // slower concurrent winner): reads must serve snapshot 2 regardless.
    val f = fs(dir)
    val v1 = new Path(dir, "_mlog_v00001.json")
    val ptr = new Path(dir, MLog.ManifestName)
    f.delete(ptr, false)
    org.apache.hadoop.fs.FileUtil.copy(f, v1, f, ptr, false,
      spark.sessionState.newHadoopConf())
    val m = MLog.readManifestFull(f, new Path(dir))
    assert(m.version === 2, "the newest snapshot out-arbitrates a lagging pointer")
    assert(spark.read.format("mlog").load(dir).count() === 50L)
  }

  test("commit timestamps are strictly monotonic even when commits land " +
      "inside one millisecond (the in-commit-timestamp clamp)") {
    val dir = tmp()
    val p = new Path(dir)
    val f = fs(dir)
    assert(MLog.createEmpty(f, p))
    // 40 driver-only commits run in well under 40 ms total: without the
    // clamp, same-millisecond stamps are near-certain, and a TIMESTAMP
    // AS OF between two equal stamps could not distinguish the states.
    for (_ <- 0 until 40)
      assert(MLog.commitAppend(f, p, Seq.empty, None, truncate = false))
    val vs = MLog.versions(f, p)
    assert(vs.size === 41)
    val ts = vs.map(v => MLog.commitTimeMs(f, p, v))
    assert(ts === ts.sorted, s"commit times must ascend, got $ts")
    assert(ts.distinct.size === ts.size,
      s"commit times must be STRICTLY ascending (no same-ms ties), got $ts")
  }

  test("racing DROPs are idempotent: both complete without error and the " +
      "store is gone") {
    val catalog = new GraftMLogCatalog
    catalog.initialize("graft_drop_race",
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Collections.emptyMap[String, String]()))
    import spark.implicits._
    for (round <- 0 until 6) {
      val dir = tmp() + "/store"
      (0 until 60).map(i => (i.toLong, (i % 7).toLong, i * 10L))
        .toDF("id", "k", "v").coalesce(3).write.format("mlog")
        .mode(org.apache.spark.sql.SaveMode.Overwrite).save(dir)
      val ident = org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("mlog"), dir)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      val results =
        try {
          val fut = (0 until 2).map(_ =>
            pool.submit(new java.util.concurrent.Callable[Boolean] {
              override def call(): Boolean = catalog.dropTable(ident)
            }))
          // get() rethrows any exception a drop surfaced — the directory
          // vanishing under the slower drop must be SUCCESS, not an
          // internal FileNotFoundException.
          fut.map(_.get(60, java.util.concurrent.TimeUnit.SECONDS)).toList
        } finally pool.shutdown()
      assert(results.contains(true),
        s"round $round: at least one racing drop observes the table")
      assert(MLog.versions(fs(dir), new Path(dir)).isEmpty &&
        !fs(dir).exists(new Path(dir, MLog.ManifestName)),
        s"round $round: the store must be gone after both drops")
    }
  }
}
