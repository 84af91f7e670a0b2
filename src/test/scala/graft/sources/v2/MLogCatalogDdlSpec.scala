package graft.sources.v2

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.catalyst.analysis.{
  NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.functions._

/** SQL write-path DDL on [[GraftMLogCatalog]] — CREATE TABLE / CTAS /
  * INSERT INTO / INSERT OVERWRITE / DROP TABLE: the half of the SQL
  * lifecycle that addresses the CATALOG rather than a table's rows.
  * Lives in the source's package to read manifest internals. */
class MLogCatalogDdlSpec extends graft.SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("mlog_ddl").toFile.getAbsolutePath

  private def store(): String = tmp() + "/store"

  private def fs(dir: String) =
    new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())

  private def cat(): String = {
    spark.conf.set("spark.sql.catalog.graft",
      classOf[GraftMLogCatalog].getName)
    "graft.mlog"
  }

  private def ledger(n: Int) = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, (i % 7).toLong, i * 10L))
      .toDF("id", "k", "v")
  }

  test("CREATE TABLE publishes snapshot v1 with zero files; existence is " +
      "manifest-defined; IF NOT EXISTS and re-CREATE behave") {
    val dir = store()
    val c = cat()
    // Before creation the table does not exist: SELECT resolves through
    // loadTable, which must raise the engine's standard condition.
    val missing = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(s"SELECT * FROM $c.`$dir`").collect()
    }
    assert(missing.getCondition === "TABLE_OR_VIEW_NOT_FOUND")
    spark.sql(s"CREATE TABLE $c.`$dir` (id BIGINT, k BIGINT, v BIGINT) " +
      "USING mlog")
    assert(MLog.versions(fs(dir), new Path(dir)) === Seq(1),
      "creation IS a commit: snapshot v1, zero files")
    assert(MLog.readManifest(fs(dir), new Path(dir)).isEmpty)
    assert(spark.sql(s"SELECT * FROM $c.`$dir`").count() === 0L)
    // Re-CREATE collides; IF NOT EXISTS tolerates.
    intercept[TableAlreadyExistsException] {
      spark.sql(s"CREATE TABLE $c.`$dir` (id BIGINT, k BIGINT, v BIGINT) " +
        "USING mlog")
    }
    spark.sql(s"CREATE TABLE IF NOT EXISTS $c.`$dir` " +
      "(id BIGINT, k BIGINT, v BIGINT) USING mlog")
    assert(MLog.versions(fs(dir), new Path(dir)) === Seq(1),
      "IF NOT EXISTS on an existing table must not commit anything")
    // A schemaless CREATE takes the ledger schema; wrong shapes refuse.
    val dir2 = store()
    spark.sql(s"CREATE TABLE $c.`$dir2` USING mlog")
    assert(spark.table(s"$c.`$dir2`").schema === MLog.Schema)
    val dir3 = store()
    val bad = intercept[Exception] {
      spark.sql(s"CREATE TABLE $c.`$dir3` (a STRING) USING mlog")
    }
    assert(bad.getMessage.contains("fixed ledger schema"))
    val part = intercept[Exception] {
      spark.sql(s"CREATE TABLE $c.`$dir3` (id BIGINT, k BIGINT, v BIGINT) " +
        "USING mlog PARTITIONED BY (k)")
    }
    assert(part.getMessage.contains("PARTITIONED BY"))
    assert(!exists(dir3), "a refused CREATE must leave nothing behind")
  }

  private def exists(dir: String): Boolean =
    fs(dir).exists(new Path(dir, MLog.ManifestName)) ||
      MLog.versions(fs(dir), new Path(dir)).nonEmpty

  test("INSERT INTO appends one snapshot per statement; INSERT OVERWRITE " +
      "truncates; both equal the DataFrame route") {
    val dir = store()
    val c = cat()
    spark.sql(s"CREATE TABLE $c.`$dir` (id BIGINT, k BIGINT, v BIGINT) " +
      "USING mlog")
    spark.sql(s"INSERT INTO $c.`$dir` VALUES (1, 2, 3), (4, 5, 6)")
    assert(MLog.versions(fs(dir), new Path(dir)) === Seq(1, 2))
    ledger(50).createOrReplaceTempView("mlog_ddl_src")
    spark.sql(s"INSERT INTO $c.`$dir` SELECT * FROM mlog_ddl_src")
    assert(spark.table(s"$c.`$dir`").count() === 52L)
    // Route equivalence: the catalog write and the DataFrame write are
    // the same manifest-committed append.
    val dirB = store()
    spark.sql(s"CREATE TABLE $c.`$dirB` USING mlog")
    ledger(50).write.format("mlog").mode(SaveMode.Append).save(dirB)
    val viaSql = spark.sql(
      s"SELECT * FROM $c.`$dir` WHERE NOT ((id = 1 AND k = 2 AND v = 3) " +
        "OR (id = 4 AND k = 5 AND v = 6))")
      .orderBy("id", "k", "v").collect().toSeq
    val viaDf = spark.table(s"$c.`$dirB`")
      .orderBy("id", "k", "v").collect().toSeq
    assert(viaSql === viaDf)
    // INSERT OVERWRITE = truncate + append, one snapshot.
    val pre = MLog.versions(fs(dir), new Path(dir)).last
    spark.sql(s"INSERT OVERWRITE $c.`$dir` VALUES (9, 9, 9)")
    assert(MLog.versions(fs(dir), new Path(dir)).last === pre + 1)
    assert(spark.table(s"$c.`$dir`").collect().map(_.getLong(0)).toSeq
      === Seq(9L))
  }

  test("CTAS is ATOMIC (StagingTableCatalog): one v1 commit naming the " +
      "staged files; a CTAS of the wrong shape refuses and leaves nothing") {
    val dir = store()
    val c = cat()
    ledger(80).createOrReplaceTempView("mlog_ctas_src")
    spark.sql(s"CREATE TABLE $c.`$dir` USING mlog AS " +
      "SELECT * FROM mlog_ctas_src")
    assert(spark.table(s"$c.`$dir`").count() === 80L)
    assert(MLog.versions(fs(dir), new Path(dir)) === Seq(1),
      "atomic CTAS = ONE commit: v1 names the SELECT's staged files " +
        "directly (no committed-empty-table window)")
    intercept[TableAlreadyExistsException] {
      spark.sql(s"CREATE TABLE $c.`$dir` USING mlog AS " +
        "SELECT * FROM mlog_ctas_src")
    }
    val dir2 = store()
    intercept[Exception] {
      spark.sql(s"CREATE TABLE $c.`$dir2` USING mlog AS " +
        "SELECT id, k FROM mlog_ctas_src")
    }
    assert(!exists(dir2), "a refused CTAS must leave no table behind")
  }

  test("a CTAS whose SELECT fails mid-flight leaves NO table and no " +
      "staged debris is referenced; REPLACE of a missing table refuses") {
    val dir = store()
    val c = cat()
    // A SELECT that dies on the executors AFTER the statement began: the
    // staged-write abort + abortStagedChanges path, the exact window a
    // two-commit CTAS strands a committed empty table in.
    val boom = udf((i: Long) =>
      if (i > 40) throw new RuntimeException("ctas boom") else i)
    spark.udf.register("mlog_ctas_boom", boom)
    ledger(80).createOrReplaceTempView("mlog_ctas_fail_src")
    intercept[Exception] {
      spark.sql(s"CREATE TABLE $c.`$dir` USING mlog AS " +
        "SELECT mlog_ctas_boom(id) AS id, k, v FROM mlog_ctas_fail_src")
    }
    assert(!exists(dir),
      "an atomic CTAS that failed mid-SELECT must leave no table")
    // REPLACE (without OR CREATE) names an existing table or refuses
    // before the SELECT runs.
    val missing = intercept[Exception] {
      spark.sql(s"REPLACE TABLE $c.`$dir` USING mlog AS " +
        "SELECT * FROM mlog_ctas_fail_src")
    }
    assert(missing.isInstanceOf[NoSuchTableException] ||
      missing.getMessage.toUpperCase.contains("NOT_FOUND"),
      s"REPLACE of a missing table must be a standard condition, got $missing")
    assert(!exists(dir))
  }

  test("DROP TABLE removes exactly what the format owns; foreign files " +
      "and their directory survive") {
    val dir = store()
    val c = cat()
    ledger(60).coalesce(2).write.format("mlog")
      .mode(SaveMode.Overwrite).save(dir)
    MLog.deleteMor(spark, new Path(dir), _ => true, (id, _, _) => id < 5)
    // A foreign file the format does not own.
    val foreign = new java.io.File(dir, "README.txt")
    java.nio.file.Files.write(foreign.toPath, "keep me".getBytes("UTF-8"))
    assert(spark.sql(s"DROP TABLE $c.`$dir`").collect().isEmpty)
    assert(foreign.exists(), "DROP must never touch foreign files")
    val left = Option(new java.io.File(dir).listFiles())
      .getOrElse(Array.empty).map(_.getName).toSet
    assert(left === Set("README.txt"),
      s"only the foreign file may remain, got $left")
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(s"SELECT * FROM $c.`$dir`").collect()
    }
    // IF EXISTS on a gone table is quiet; plain DROP is not.
    spark.sql(s"DROP TABLE IF EXISTS $c.`$dir`")
    val gone = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(s"DROP TABLE $c.`$dir`")
    }
    assert(gone.getCondition === "TABLE_OR_VIEW_NOT_FOUND")
    // An empty created table drops cleanly including its directory.
    val dir2 = store()
    spark.sql(s"CREATE TABLE $c.`$dir2` USING mlog")
    spark.sql(s"DROP TABLE $c.`$dir2`")
    assert(!new java.io.File(dir2).exists(),
      "an all-owned directory is removed with its table")
  }

  test("TRUNCATE TABLE and CREATE OR REPLACE complete the lifecycle") {
    val dir = store()
    val c = cat()
    ledger(40).coalesce(1).write.format("mlog")
      .mode(SaveMode.Overwrite).save(dir)
    // TRUNCATE TABLE rides SupportsDelete's unqualified-delete fast path:
    // one snapshot naming zero files, zero rows read; prior snapshots
    // still serve the truncated rows until retention drops them.
    val preV = MLog.versions(fs(dir), new Path(dir)).last
    spark.sql(s"TRUNCATE TABLE $c.`$dir`")
    assert(spark.table(s"$c.`$dir`").count() === 0L)
    assert(MLog.versions(fs(dir), new Path(dir)).last === preV + 1)
    assert(spark.read.format("mlog").option("versionAsOf", preV)
      .load(dir).count() === 40L)
    // CREATE OR REPLACE on the STAGING catalog is one truncate-commit:
    // history and the pre-replace snapshots SURVIVE (time travel to the
    // pre-replace state keeps working until retention drops it) —
    // Delta's REPLACE semantics, not a drop-and-recreate.
    ledger(10).createOrReplaceTempView("mlog_ddl_repl")
    spark.sql(s"CREATE OR REPLACE TABLE $c.`$dir` USING mlog AS " +
      "SELECT * FROM mlog_ddl_repl")
    assert(spark.table(s"$c.`$dir`").count() === 10L)
    assert(MLog.versions(fs(dir), new Path(dir)) === Seq(1, 2, 3),
      "replace is ONE commit on the existing lifecycle, not a fresh store")
    assert(spark.read.format("mlog").option("versionAsOf", preV)
      .load(dir).count() === 40L,
      "the pre-replace snapshot must stay time-travelable")
  }

  test("the catalog route inherits every scan pushdown: metadata-only " +
      "aggregates, manifest stats, and the VERSION AS OF composition") {
    val dir = store()
    val c = cat()
    ledger(700).repartitionByRange(7, col("k")).write.format("mlog")
      .mode(SaveMode.Overwrite).save(dir)
    ledger(300).write.format("mlog").mode(SaveMode.Overwrite).save(dir)
    // SQL COUNT through the catalog is the same manifest answer the
    // DataFrame route gives — pinned via the one-row metadata scan.
    val cnt = spark.sql(s"SELECT count(*) AS n, min(id) AS mn, " +
      s"max(k) AS mx FROM $c.`$dir`")
    assert(cnt.queryExecution.executedPlan.toString.contains("metadata-only"))
    assert(cnt.collect().head.toSeq === Seq(300L, 0L, 6L))
    // …and composed with time travel, the PINNED snapshot's manifest
    // answers.
    val tt = spark.sql(s"SELECT count(*) AS n FROM $c.`$dir` VERSION AS OF 1")
    assert(tt.queryExecution.executedPlan.toString.contains("metadata-only"))
    assert(tt.collect().head.getLong(0) === 700L)
    // Manifest statistics flow through loadTable: the optimizer sees the
    // true size, not the DSv2 default.
    val stats = spark.sql(s"SELECT * FROM $c.`$dir`")
      .queryExecution.optimizedPlan.stats
    assert(stats.rowCount.exists(_.toLong === 300L))
  }

  test("TIMESTAMP AS OF resolves to the newest snapshot <= ts; between " +
      "commits it pins the earlier one; before the first it refuses; " +
      "history surfaces the commit wall-clock") {
    val dir = store()
    val c = cat()
    ledger(40).coalesce(1).write.format("mlog")
      .mode(SaveMode.Overwrite).save(dir)
    // Distinct commit wall-clocks: the ms clock must tick between the
    // two snapshots for "between" to be a real instant.
    Thread.sleep(5)
    ledger(90).coalesce(1).write.format("mlog")
      .mode(SaveMode.Overwrite).save(dir)
    val p = new Path(dir)
    val t1 = MLog.commitTimeMs(fs(dir), p, 1)
    val t2 = MLog.commitTimeMs(fs(dir), p, 2)
    assert(t1 < t2, "commit times must be stamped and ascending here")
    def at(tsMs: Long): Long = spark.sql(
      s"SELECT count(*) FROM $c.`$dir` " +
        s"TIMESTAMP AS OF timestamp_millis(${tsMs}L)").head.getLong(0)
    // Exactly at a commit = that commit; strictly between = the earlier;
    // at-or-after the head = the head.
    assert(at(t1) === 40L)
    assert(at(t2 - 1) === 40L, "between v1 and v2 resolves to v1")
    assert(at(t2) === 90L)
    assert(at(System.currentTimeMillis() + 60000L) === 90L)
    // Route equivalence: the resolved table IS the versionAsOf table.
    assert(spark.sql(s"SELECT sum(v) FROM $c.`$dir` " +
        s"TIMESTAMP AS OF timestamp_millis(${t1}L)").head.getLong(0) ===
      spark.read.format("mlog").option("versionAsOf", 1).load(dir)
        .agg(org.apache.spark.sql.functions.sum("v")).head.getLong(0))
    // Before the first retained snapshot: loud, named refusal.
    val early = intercept[Exception] { at(t1 - 1000L) }
    assert(early.getMessage.contains("predates the first retained snapshot"))
    // The OPTION route (Delta's .option("timestampAsOf", …)) resolves
    // identically: epoch-ms digits, ISO-8601 with zone, and both options
    // together refuse.
    assert(spark.read.format("mlog").option("timestampAsOf", t1.toString)
      .load(dir).count() === 40L)
    assert(spark.read.format("mlog")
      .option("timestampAsOf", java.time.Instant.ofEpochMilli(t2).toString)
      .load(dir).count() === 90L)
    val both = intercept[Exception] {
      spark.read.format("mlog").option("timestampAsOf", t1.toString)
        .option("versionAsOf", 1).load(dir).count()
    }
    assert(both.getMessage.contains("not both"))
    // CALL history surfaces the same wall-clocks TIMESTAMP AS OF
    // resolves by, one TIMESTAMP row per retained snapshot, ascending.
    val hist = spark.sql(s"CALL graft.system.history('$dir')").collect()
    assert(hist.map(_.getInt(0)).toSeq === Seq(1, 2))
    assert(hist.map(_.getTimestamp(1).getTime).toSeq === Seq(t1, t2),
      "history's commit_at must be the stamped commit time")
    // Expire v1: a timestamp that used to resolve there now refuses —
    // expired state is unknown state, not silently the oldest survivor.
    MLog.expireVersions(fs(dir), p, keepLast = 1)
    val expired = intercept[Exception] { at(t1) }
    assert(expired.getMessage.contains("predates the first retained snapshot"))
  }

  test("DataFrameWriterV2 and writeStream.toTable address the catalog: " +
      "append, truncate-overwrite, and the native streaming sink ride " +
      "the same manifest commits") {
    val dir = store()
    val c = cat()
    spark.sql(s"CREATE TABLE $c.`$dir` USING mlog")
    // writeTo(...).append() — AppendData through loadTable.
    ledger(30).writeTo(s"$c.`$dir`").append()
    assert(spark.table(s"$c.`$dir`").count() === 30L)
    assert(MLog.versions(fs(dir), new Path(dir)) === Seq(1, 2))
    // writeTo(...).overwrite(true) — OverwriteByExpression riding the
    // table's TRUNCATE capability: one commit, history preserved.
    ledger(10).writeTo(s"$c.`$dir`").overwrite(lit(true))
    assert(spark.table(s"$c.`$dir`").count() === 10L)
    assert(MLog.versions(fs(dir), new Path(dir)) === Seq(1, 2, 3))
    assert(spark.read.format("mlog").option("versionAsOf", 2)
      .load(dir).count() === 30L)
    // writeStream.toTable — the catalog route to the STREAMING_WRITE
    // sink: same epoch-ledger commits as the format route.
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, Long)]
    mem.addData((1000L, 0L, 1L), (1001L, 1L, 2L))
    val q = mem.toDF().toDF("id", "k", "v")
      .writeStream
      .option("checkpointLocation", tmp() + "/ckpt")
      .toTable(s"$c.`$dir`")
    q.processAllAvailable()
    q.stop()
    assert(spark.table(s"$c.`$dir`").count() === 12L)
    assert(MLog.versions(fs(dir), new Path(dir)) === Seq(1, 2, 3, 4),
      "one snapshot per streamed epoch through the catalog route")
    assert(MLog.readManifestFull(fs(dir), new Path(dir)).txn ===
      Map(s"mlog-stream-${q.id}" -> 0L),
      "the epoch ledger rides the catalog route too")
  }

  test("racing CREATEs: exactly one wins the v1 slot, the loser reports " +
      "TableAlreadyExists — never a silent second commit") {
    val dir = store()
    cat()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    val results =
      try {
        val futures = (0 until 8).map { _ =>
          pool.submit(new java.util.concurrent.Callable[Boolean] {
            override def call(): Boolean =
              try MLog.createEmpty(fs(dir), new Path(dir))
              catch { case _: Exception => false }
          })
        }
        futures.map(_.get()).toList
      } finally pool.shutdown()
    assert(results.count(identity) === 1,
      s"exactly one creator may win, got $results")
    assert(MLog.versions(fs(dir), new Path(dir)) === Seq(1))
  }

  test("REPLACE racing DROP refuses at commit instead of recreating; " +
      "CREATE OR REPLACE keeps create-when-absent; a compact digit-only " +
      "timestamp is a parse error, not a 'predates' refusal") {
    val dir = store()
    cat()
    ledger(20).coalesce(1).write.format("mlog")
      .mode(SaveMode.Overwrite).save(dir)
    val catalog = new GraftMLogCatalog
    catalog.initialize("graft_rtas",
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Collections.emptyMap[String, String]()))
    val ident = org.apache.spark.sql.connector.catalog.Identifier.of(
      Array("mlog"), dir)
    // Stage the REPLACE while the table exists (the pre-SELECT existence
    // check passes), then DROP mid-"SELECT": commitStagedChanges must
    // re-check and refuse — a blind truncate-commit would silently turn
    // REPLACE into CREATE, resurrecting the dropped table.
    val stagedReplace = catalog.stageReplace(ident,
      Array.empty[org.apache.spark.sql.connector.catalog.Column],
      Array.empty[org.apache.spark.sql.connector.expressions.Transform],
      new java.util.HashMap[String, String]())
    assert(catalog.dropTable(ident), "the racing DROP itself succeeds")
    intercept[NoSuchTableException] {
      stagedReplace.asInstanceOf[MLogStagedTable].commitStagedChanges()
    }
    assert(!exists(dir),
      "REPLACE of a concurrently-dropped table must NOT recreate it")
    // CREATE OR REPLACE under the same interleaving DOES create — that
    // is its contract.
    val stagedCor = catalog.stageCreateOrReplace(ident,
      Array.empty[org.apache.spark.sql.connector.catalog.Column],
      Array.empty[org.apache.spark.sql.connector.expressions.Transform],
      new java.util.HashMap[String, String]())
    stagedCor.asInstanceOf[MLogStagedTable].commitStagedChanges()
    assert(exists(dir), "CREATE OR REPLACE creates when absent")
    // timestampAsOf = '20260816' looks like a compact ISO date, not epoch
    // ms (which would read as ~1970 and surface as a baffling 'predates
    // the first retained snapshot'): it must fail as a PARSE error.
    val compact = intercept[Exception] {
      spark.read.format("mlog").option("timestampAsOf", "20260816")
        .load(dir).count()
    }
    assert(!compact.getMessage.contains("predates"),
      s"a compact date must not be read as epoch ms, got: $compact")
    assert(compact.getMessage.contains("could not be parsed") ||
      compact.isInstanceOf[java.time.format.DateTimeParseException],
      s"expected a parse error, got: $compact")
    // …and the same for a compact DATETIME ('20260816120000', 14 digits),
    // which the width lower bound alone would read as epoch ms ~year 2612
    // and surface as a baffling 'no snapshot at or before' refusal: the
    // 10-13 digit upper bound must route it to the parse-error path too.
    val compactDt = intercept[Exception] {
      spark.read.format("mlog").option("timestampAsOf", "20260816120000")
        .load(dir).count()
    }
    assert(!compactDt.getMessage.contains("no snapshot"),
      s"a compact datetime must not be read as epoch ms, got: $compactDt")
    assert(compactDt.getMessage.contains("could not be parsed") ||
      compactDt.isInstanceOf[java.time.format.DateTimeParseException],
      s"expected a parse error, got: $compactDt")
    // Genuine 13-digit epoch-ms stays accepted (the upper bound is
    // inclusive): "now" resolves to the latest snapshot.
    assert(spark.read.format("mlog")
      .option("timestampAsOf", System.currentTimeMillis().toString)
      .load(dir).count() >= 0L)
  }

  test("DROP on a non-table sweeps AGED data-only debris (a gave-up " +
      "drop's leftovers) but spares young log-less files (an in-flight " +
      "atomic CTAS's staged writes)") {
    val dir = store()
    cat()
    ledger(30).coalesce(2).write.format("mlog")
      .mode(SaveMode.Overwrite).save(dir)
    // Manufacture the give-up state by hand: remove the LOG (pointer,
    // snapshots, their local .crc sidecars), stranding data files with
    // no log — exactly what a DROP that threw after its log-first passes
    // leaves when a concurrent committer kept writing.
    val d = new java.io.File(dir)
    def core(n: String): String =
      if (n.startsWith(".") && n.endsWith(".crc"))
        n.stripPrefix(".").stripSuffix(".crc") else n
    d.listFiles().filter { x =>
      val c = core(x.getName)
      c == MLog.ManifestName || c.startsWith("_mlog_v")
    }.foreach(x => assert(x.delete()))
    val debris = d.listFiles().filter(_.getName.endsWith(".mlog"))
    assert(debris.length === 2, "two stranded data files to arbitrate")
    // One AGED past the orphan grace (collectable), one YOUNG (could be
    // an in-flight CTAS's staged file — must survive).
    val aged = debris.head
    assert(aged.setLastModified(
      System.currentTimeMillis() - GraftMLogCatalog.DropOrphanGraceMs - 3600000L))
    val young = debris.last
    val catalog = new GraftMLogCatalog
    catalog.initialize("graft_orphan",
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Collections.emptyMap[String, String]()))
    val ident = org.apache.spark.sql.connector.catalog.Identifier.of(
      Array("mlog"), dir)
    assert(!catalog.dropTable(ident), "no log = no table: DROP reports false")
    assert(!aged.exists(), "aged orphan debris must be swept")
    assert(young.exists(), "young log-less files must be spared")
  }
}
