package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.Tables
import graft.functions.DetAgg._

/** Format / layout round-trips (SURVEY §2.1 S8-S10): CSV with a declared
  * schema (the reference trainer's CSV fallback, train.py:66-80) and a
  * hive-partitioned parquet sink read back through partition pruning (the
  * reference's partitionBy("sliceType") layout, KafkaKpiPipeline.scala
  * :293-300/:370-373). Both must be lossless: the oracle reads the
  * ORIGINAL table. */
object FormatQueries {
  import QuerySpec._

  /** Recursive delete of a fixture dir (shared by every write-once
    * _READY-marker store in this file). */
  private def rmTree(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(rmTree)
    f.delete(): Unit
  }

  /** Oracle-dump dir for the per-file manifest rows (pid-keyed, rewritten
    * per execution of layout_manifest_prune — one tiny row per file).
    * Declared BEFORE `all`: the oracle string interpolates it eagerly. */
  private val ManifestDumpDir = TmpDirs.persistent(
    s"graft_manifest_dump_${ProcessHandle.current().pid()}")

  /** Memoized (manifest rows, raw lineitem count) per (JVM, sf dir): both
    * are constants of the write-once layout. */
  private val manifestCache = new java.util.concurrent.ConcurrentHashMap[
    String, (Array[org.apache.spark.sql.Row], Long)]

  /** Oracle-dump dir for the mlog store's manifest entries (pid-keyed,
    * rewritten per execution of dsv2_mlog_roundtrip — one tiny row per
    * committed file). Declared BEFORE `all`: the oracle string
    * interpolates it eagerly. */
  private val MLogDumpDir = TmpDirs.persistent(
    s"graft_mlog_dump_${ProcessHandle.current().pid()}")

  /** The two-commit mlog store (7-file overwrite, then a 3-file append
    * through the manifest merge) shared by dsv2_mlog_roundtrip and
    * sql_mlog_scan — write-once per (JVM, sf) behind a _READY marker
    * (absent marker = died between commits, rebuild both). Returns the
    * store path and its manifest entries. */
  private def mlogStore(s: SparkSession, d: String)
      : (String, Seq[graft.sources.v2.MLog.FileEntry]) = {
    val dir = TmpDirs.scoped(s"graft_mlogstore_${QuerySpec.jvmScopedKey(d)}")
    val ready = new java.io.File(dir, "_READY")
    val store = new java.io.File(dir, "store").getAbsolutePath
    if (!ready.exists()) {
      rmTree(dir); dir.mkdirs()
      val ledger = Tables.events(s, d).select(col("event_id").as("id"),
        col("user_id").as("k"),
        (unix_micros(col("ts")) % 86400000000L).as("v"))
      ledger.filter(col("id") % 5 =!= 0).repartitionByRange(7, col("k"))
        .write.format("mlog").mode("overwrite").save(store)
      ledger.filter(col("id") % 5 === 0).repartitionByRange(3, col("k"))
        .write.format("mlog").mode("append").save(store)
      ready.createNewFile(): Unit
    }
    val entries = graft.sources.v2.MLog.readManifest(
      new org.apache.hadoop.fs.Path(store)
        .getFileSystem(s.sessionState.newHadoopConf()),
      new org.apache.hadoop.fs.Path(store))
    (store, entries)
  }

  /** The two-version time-travel store (v1 = 4/5 of the ledger, v2 =
    * OVERWRITE with all of it), write-once per (JVM, sf) behind a _READY
    * marker; shared READ-ONLY by dsv2_mlog_time_travel (the
    * `.option("versionAsOf", …)` route) and sql_mlog_time_travel (the
    * `VERSION AS OF` parser route via [[graft.sources.v2.GraftMLogCatalog]])
    * so route equivalence is pinned over ONE store. Returns the store
    * path and its snapshot versions, ascending. */
  private def mlogTtStore(s: SparkSession, d: String): (String, Seq[Int]) = {
    val dir = TmpDirs.scoped(s"graft_mlogtt_${QuerySpec.jvmScopedKey(d)}")
    val ready = new java.io.File(dir, "_READY")
    val store = new java.io.File(dir, "store").getAbsolutePath
    if (!ready.exists()) {
      rmTree(dir); dir.mkdirs()
      val ledger = Tables.events(s, d).select(col("event_id").as("id"),
        col("user_id").as("k"),
        (unix_micros(col("ts")) % 86400000000L).as("v"))
      ledger.filter(col("id") % 5 =!= 0).repartitionByRange(7, col("k"))
        .write.format("mlog").mode("overwrite").save(store)
      // Distinct commit wall-clocks: TIMESTAMP AS OF resolves on the
      // stamped ms clock, so "between v1 and v2" must be a real instant
      // (two commits inside one millisecond would leave no gap to pin).
      Thread.sleep(5)
      ledger.repartitionByRange(3, col("k"))
        .write.format("mlog").mode("overwrite").save(store)
      ready.createNewFile(): Unit
    }
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(s.sessionState.newHadoopConf())
    (store, graft.sources.v2.MLog.versions(fs,
      new org.apache.hadoop.fs.Path(store)))
  }

  val all: Seq[QuerySpec] = Seq(

    // S10: CSV fallback with declared schema. Timestamps carried as exact
    // µs longs (CSV has no timestamp type); doubles survive textually via
    // Spark's shortest-round-trip formatting.
    checked("csv_roundtrip",
      s"""SELECT event_type, count(*) AS n,
         |  ${sqlSum("value")} AS total_value,
         |  CAST(min(epoch_us(ts)) AS BIGINT) AS first_us
         |FROM events GROUP BY event_type""".stripMargin) { (s, d) =>
      // One deterministic dir per (JVM, sf dir), overwritten each run and
      // deleted at JVM exit — a nanoTime-keyed dir per invocation leaked a
      // fresh copy every run (ADVICE round 5).
      val dir = TmpDirs.scoped(s"graft_csv_${QuerySpec.jvmScopedKey(d)}")
        .getAbsolutePath
      Tables.events(s, d)
        .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
          col("user_id"), col("event_type"), col("value"))
        .write.mode("overwrite").option("header", "true").csv(dir)
      val schema = StructType.fromDDL(
        "event_id LONG, ts_us LONG, user_id LONG, event_type STRING, value DOUBLE")
      s.read.option("header", "true").schema(schema).csv(dir)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          dsum(col("value")).as("total_value"),
          min(col("ts_us")).as("first_us"))
    },

    // S10 breadth: ORC round-trip — the other columnar format shipped in
    // the Spark distribution (no spark-avro module on this classpath).
    // Same lossless contract as csv_roundtrip (the oracle reads the
    // ORIGINAL table): timestamps carried as exact µs longs, and the
    // read-back carries a predicate ORC's stripe/row-group stats can
    // skip on — format breadth with the same pushdown story as parquet.
    checked("orc_roundtrip",
      s"""SELECT event_type, count(*) AS n,
         |  ${sqlSum("value")} AS total_value,
         |  CAST(max(epoch_us(ts)) AS BIGINT) AS last_us
         |FROM events WHERE value > 100 GROUP BY event_type""".stripMargin) { (s, d) =>
      val dir = TmpDirs.scoped(s"graft_orc_${QuerySpec.jvmScopedKey(d)}")
        .getAbsolutePath
      Tables.events(s, d)
        .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
          col("event_type"), col("value"))
        .write.mode("overwrite").orc(dir)
      s.read.orc(dir)
        .filter(col("value") > 100)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"),
          max(col("ts_us")).as("last_us"))
    },

    // S10 breadth: JSON-lines round-trip — the interchange format every
    // ingest pipeline meets (logs, API dumps, crawl manifests). Same
    // lossless contract as csv/orc_roundtrip (the oracle reads the
    // ORIGINAL table): timestamps carried as exact µs longs so the trip
    // never rides JSON's stringly date formats, doubles survive via
    // Spark's shortest-roundtrip serialization, and the read-back
    // declares the schema explicitly — schema inference over 100 TB of
    // JSON is a full extra scan and a correctness lottery (type
    // widening per partition), so production reads always pin it.
    checked("json_roundtrip",
      s"""SELECT event_type, count(*) AS n,
         |  ${sqlSum("value")} AS total_value,
         |  CAST(min(user_id) AS BIGINT) AS min_user
         |FROM events WHERE user_id % 3 = 0 GROUP BY event_type""".stripMargin) { (s, d) =>
      val dir = TmpDirs.scoped(s"graft_json_${QuerySpec.jvmScopedKey(d)}")
        .getAbsolutePath
      Tables.events(s, d)
        .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
          col("user_id"), col("event_type"), col("value"))
        .write.mode("overwrite").json(dir)
      val schema = StructType.fromDDL(
        "event_id LONG, ts_us LONG, user_id LONG, event_type STRING, value DOUBLE")
      s.read.schema(schema).json(dir)
        .filter(col("user_id") % 3 === 0)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"),
          min(col("user_id")).as("min_user"))
    },

    // Bucketed co-located join: both sides written bucketBy(8, key) +
    // sortBy, then joined WITHOUT a shuffle — the bucketed scan satisfies
    // the join's hash-partitioning requirement, so neither side crosses an
    // exchange on the join key (PlanShapeSpec pins it). This is THE
    // pre-partitioning pattern for a 100 TB fact-fact join that recurs
    // nightly: pay the layout once at write time, skip the dominant
    // shuffle on every subsequent join. The merge hint forces SMJ at test
    // scale (the tables are broadcast-sized there; at production scale
    // SMJ is what the planner picks anyway).
    checked("bucketed_join",
      s"""SELECT o_orderpriority, count(*) AS n,
         |  ${sqlSum("l_extendedprice")} AS revenue
         |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         |GROUP BY o_orderpriority""".stripMargin) { (s, d) =>
      // Layout is written ONCE per (JVM, sf dir) and reused across
      // invocations in a session — the point of bucketing is paying the
      // write once; re-bucketing every run would time the write, not the
      // shuffle-free join. The sf-dir key is part of the TABLE NAME, so a
      // session that switches sf dirs can never reuse the wrong layout,
      // and reuse requires both the catalog entry and the _SUCCESS marker
      // (an interrupted write leaves no marker → torn layouts are
      // rewritten, never read). Deterministic paths overwrite in place
      // instead of orphaning copies; see QuerySpec.jvmScopedKey for the
      // collision/race rationale (ADVICE round 4).
      val sfKey = QuerySpec.jvmScopedKey(d)
      def ensureBucketed(df: => org.apache.spark.sql.DataFrame,
                         base: String, key: String): String = {
        val name = s"${base}_$sfKey"
        val dir = TmpDirs.scoped(s"graft_bucket_$name")
        val complete = new java.io.File(dir, "_SUCCESS").exists()
        if (!(complete && s.catalog.tableExists(name))) {
          df.write.mode("overwrite")
            .bucketBy(8, key).sortBy(key)
            .option("path", dir.getAbsolutePath)
            .saveAsTable(name)
        }
        name
      }
      val ordersB = ensureBucketed(Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderpriority")),
        "graft_orders_b", "o_orderkey")
      val lineitemB = ensureBucketed(Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_extendedprice")),
        "graft_lineitem_b", "l_orderkey")
      s.table(ordersB).hint("merge")
        .join(s.table(lineitemB).hint("merge"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("revenue"))
    },

    // Dynamic partition pruning: the fact table is hive-partitioned by
    // event_type; the dim side (top-2 types by total value) is DATA-
    // dependent, so no static rule can prune — at runtime Catalyst turns
    // the dim's key set into a partition filter on the fact scan
    // (DynamicPruningExpression; PlanShapeSpec pins it) and only 2 of 5
    // partition directories are read. THE mechanism that keeps a
    // dim-filtered join from scanning all of a 100 TB partitioned fact.
    // The layout is written once per (JVM, sf dir) like bucketed_join's.
    checked("join_dpp",
      s"""WITH dim AS (SELECT event_type, ${sqlSum("value")} AS total
         |  FROM events GROUP BY 1),
         |top2 AS (SELECT event_type, total FROM (
         |  SELECT *, row_number() OVER (ORDER BY total DESC, event_type) AS rn
         |  FROM dim) WHERE rn <= 2)
         |SELECT e.event_type, count(*) AS n, min(total) AS type_total
         |FROM events e JOIN top2 t ON e.event_type = t.event_type
         |GROUP BY 1""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val dir = TmpDirs.scoped(s"graft_dpp_${QuerySpec.jvmScopedKey(d)}")
      if (!new java.io.File(dir, "_SUCCESS").exists()) {
        Tables.events(s, d)
          .select(col("event_id"), col("user_id"), col("value"), col("event_type"))
          .write.mode("overwrite").partitionBy("event_type")
          .parquet(dir.getAbsolutePath)
      }
      val fact = s.read.parquet(dir.getAbsolutePath)
      val dim = Tables.events(s, d)
        .groupBy("event_type")
        .agg(dsum(col("value")).as("total"))
      val top2 = dim
        .withColumn("rn", row_number().over(
          Window.orderBy(col("total").desc, col("event_type"))))
        .filter(col("rn") <= 2)
        .select(col("event_type").as("dim_type"), col("total"))
      fact.join(top2, col("event_type") === col("dim_type"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), min(col("total")).as("type_total"))
    },

    // S8/S9: hive-partitioned parquet sink, read back with a partition
    // filter — the scan must prune to the one slice directory (check with
    // graft.Explain: PartitionFilters, not PushedFilters).
    checked("partitioned_sink",
      s"""SELECT user_id, count(*) AS n, ${sqlSum("value")} AS total_value
         |FROM events WHERE event_type = 'click' GROUP BY user_id""".stripMargin) { (s, d) =>
      // Deterministic per-(JVM, sf) dir, overwritten in place each run (the
      // write IS part of the measured query) and deleted at JVM exit.
      val dir = TmpDirs.scoped(s"graft_part_${QuerySpec.jvmScopedKey(d)}")
        .getAbsolutePath
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("value"), col("event_type"))
        .write.mode("overwrite").partitionBy("event_type").parquet(dir)
      s.read.parquet(dir)
        .filter(col("event_type") === "click") // → partition pruning
        .groupBy("user_id")
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
    },

    // Parquet SCHEMA EVOLUTION — the reader-level merge a long-lived
    // table needs when a column is added mid-history (distinct from
    // union_by_name, which unions two frames the caller already read):
    // epoch-1 files carry (event_id, user_id, value), epoch-2 files add
    // `vgrid`; one `mergeSchema` read reconstructs the superset schema
    // and epoch-1 rows surface NULL vgrid. The declared result pins the
    // per-epoch row counts, the value checksum across both epochs, and
    // the vgrid sum over epoch 2 — so a reader that dropped the new
    // column (or the old files) hash-mismatches. At 100 TB mergeSchema
    // reads EVERY footer — production pins the merged schema in the
    // catalog instead; the read here is the semantics being declared.
    checked("parquet_evolution",
      s"""WITH e AS (SELECT *,
         |    ts < TIMESTAMP '${graft.queries.AnalyticsQueries.IvmSplit}'
         |      AS old FROM events)
         |SELECT CAST(count(*) FILTER (WHERE old) AS BIGINT) AS n_v1,
         |  CAST(count(*) FILTER (WHERE NOT old) AS BIGINT) AS n_v2,
         |  CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT)
         |    AS v_sum,
         |  CAST(sum(CAST(floor(value * 1000) AS BIGINT))
         |    FILTER (WHERE NOT old) AS BIGINT) AS vgrid_sum
         |FROM e""".stripMargin) { (s, d) =>
      val key = QuerySpec.jvmScopedKey(d)
      val dir = TmpDirs.scoped(s"graft_evo_$key").getAbsolutePath
      val split = expr(
        s"TIMESTAMP '${graft.queries.AnalyticsQueries.IvmSplit}'")
      val ev = Tables.events(s, d)
      ev.filter(col("ts") < split)
        .select(col("event_id"), col("user_id"), col("value"))
        .write.mode("overwrite").parquet(s"$dir/epoch=1")
      ev.filter(col("ts") >= split)
        .select(col("event_id"), col("user_id"), col("value"),
          floor(col("value") * 1000).cast("long").as("vgrid"))
        .write.mode("overwrite").parquet(s"$dir/epoch=2")
      s.read.option("mergeSchema", "true").parquet(dir)
        .agg(sum(when(col("vgrid").isNull, 1L).otherwise(0L)).as("n_v1"),
          sum(when(col("vgrid").isNotNull, 1L).otherwise(0L)).as("n_v2"),
          sum(floor(col("value") * 1000).cast("long")).as("v_sum"),
          sum(col("vgrid")).as("vgrid_sum"))
    },

    // Small-file COMPACTION — the table-maintenance pass every streaming
    // ingest pipeline owes its readers (a per-trigger sink leaves
    // hundreds of tiny files per partition; parquet scan cost at 100 TB
    // is dominated by file-open/footer overhead once files drop below
    // ~tens of MB). A deliberately fragmented copy of the events table
    // (48 shards) is compacted by reading it back and COALESCING to a
    // byte-budget-derived file count — coalesce is the load-bearing
    // choice: it merges partitions without a shuffle, which is exactly
    // what OPTIMIZE/rewriteDataFiles does per partition. The declared
    // result carries the content checksum (count, id-sum, value-sum on
    // the 1e3 grid) read FROM THE COMPACTED LAYOUT plus three measured
    // contract booleans: the compaction reduced the file count, hit its
    // target, and changed nothing (fragment checksum == compacted
    // checksum). DuckDB recomputes the checksum from the raw table and
    // asserts the booleans literally.
    checked("files_compact",
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(event_id) AS BIGINT) AS id_sum,
        |  CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS v_sum,
        |  true AS fewer_files, true AS within_target,
        |  true AS content_identical
        |FROM events""".stripMargin) { (s, d) =>
      val key = QuerySpec.jvmScopedKey(d)
      val frag = TmpDirs.scoped(s"graft_frag_$key").getAbsolutePath
      val comp = TmpDirs.scoped(s"graft_comp_$key").getAbsolutePath
      Tables.events(s, d).repartition(48)
        .write.mode("overwrite").parquet(frag)
      def parquetFiles(dir: String) = new java.io.File(dir).listFiles()
        .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
      val before = parquetFiles(frag)
      // Target: ~4 MB per output file — the per-partition byte budget a
      // production OPTIMIZE uses (scaled down to the test corpus).
      val target = math.max(1, math.ceil(before.map(_.length).sum / 4e6).toInt)
      s.read.parquet(frag).coalesce(target)
        .write.mode("overwrite").parquet(comp)
      val after = parquetFiles(comp).length
      def checksum(df: org.apache.spark.sql.DataFrame) =
        df.agg(count(lit(1)).as("n_rows"), sum(col("event_id")).as("id_sum"),
          sum(floor(col("value") * 1000).cast("long")).as("v_sum"))
      val fragSum = checksum(s.read.parquet(frag)).head()
      checksum(s.read.parquet(comp))
        .withColumn("fewer_files", lit(after < before.length))
        .withColumn("within_target", lit(after <= target))
        .withColumn("content_identical",
          col("n_rows") === fragSum.getLong(0) &&
            col("id_sum") === fragSum.getLong(1) &&
            col("v_sum") === fragSum.getLong(2))
    },

    // Z-ORDER layout — the lakehouse multi-dimensional clustering op: sort
    // the fact table by the Morton interleave of two filter dimensions
    // (graft.functions.ZOrder, pure codegen'd bit-ops) so a rectangle
    // predicate on BOTH dimensions maps to few contiguous key ranges and
    // parquet row-group min/max stats prune most of the layout. A
    // single-column sort can only cluster one dimension; at 100 TB this is
    // the difference between scanning ~3 % and ~100 % of a table for 2-D
    // selective queries. Both a z-ordered and a linearly-sorted control
    // layout are written once per (JVM, sf dir); the query MEASURES the
    // pruning (rows actually delivered by each scan, via task input
    // metrics) and returns `zorder_effective` = z-scan ≤ half the linear
    // scan, which the oracle asserts as literal true — the sketch_rollup
    // measured-invariant pattern. The aggregate itself is layout-
    // independent and bit-exact against DuckDB over the raw table.
    checked("zorder_scan",
      s"""WITH b AS (SELECT
         |    CAST(floor(0.40 * max(l_partkey)) AS BIGINT) AS plo,
         |    CAST(floor(0.55 * max(l_partkey)) AS BIGINT) AS phi,
         |    CAST(floor(0.40 * max(l_suppkey)) AS BIGINT) AS slo,
         |    CAST(floor(0.55 * max(l_suppkey)) AS BIGINT) AS shi
         |  FROM lineitem)
         |SELECT count(*) AS n, ${sqlSum("l_quantity")} AS total_qty,
         |  ${sqlSum("l_extendedprice")} AS revenue, true AS zorder_effective
         |FROM lineitem, b
         |WHERE l_partkey BETWEEN b.plo AND b.phi
         |  AND l_suppkey BETWEEN b.slo AND b.shi""".stripMargin) { (s, d) =>
      import graft.functions.ZOrder
      val sfKey = QuerySpec.jvmScopedKey(d)
      val zDir = zorderLayoutDir(s, d)
      val linDir = linearLayoutDir(s, d)
      // The pruning measurement is a property of the two immutable layouts,
      // so it is measured ONCE per (JVM, sf dir) and memoized (round-6
      // verdict #2): the first invocation pays the bounds head + two probe
      // counts; every later execution of the declared query — including all
      // timed Bench runs, which follow the untimed warm-up — runs exactly
      // one action (the aggregate).
      val (pLo, pHi, sLo, sHi, zScan, linScan) =
        zorderMeasured.computeIfAbsent(sfKey, { _ =>
          val mx = s.read.parquet(zDir)
            .agg(max(col("l_partkey")), max(col("l_suppkey"))).head
          def bnds(m: Long) = (math.floor(0.40 * m).toLong,
            math.floor(0.55 * m).toLong)
          val (plo, phi) = bnds(mx.getLong(0))
          val (slo, shi) = bnds(mx.getLong(1))
          val probeCond = col("l_partkey").between(plo, phi) &&
            col("l_suppkey").between(slo, shi)
          // Rows DELIVERED by the pruned scan (surviving row groups),
          // summed from task input metrics around a probe count; the async
          // listener bus is drained ShuffleMeter-style before reading.
          def scanned(dir: String): Long = {
            val recs = new java.util.concurrent.atomic.AtomicLong
            val lst = new org.apache.spark.scheduler.SparkListener {
              override def onTaskEnd(
                  t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
                val m = t.taskMetrics
                if (m != null) recs.addAndGet(m.inputMetrics.recordsRead): Unit
              }
            }
            s.sparkContext.addSparkListener(lst)
            try {
              s.read.parquet(dir).filter(probeCond).count()
              var prev = -1L
              var cur = recs.get
              val deadline = System.nanoTime() + 2000000000L
              while (cur != prev && System.nanoTime() < deadline) {
                prev = cur; Thread.sleep(50); cur = recs.get
              }
            } finally s.sparkContext.removeSparkListener(lst)
            recs.get
          }
          (plo, phi, slo, shi, scanned(zDir), scanned(linDir))
        })
      def cond = col("l_partkey").between(pLo, pHi) &&
        col("l_suppkey").between(sLo, sHi)
      s.read.parquet(zDir).filter(cond)
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("total_qty"),
          dsum(col("l_extendedprice")).as("revenue"))
        .withColumn("zorder_effective", lit(zScan * 2 <= linScan))
    },

    // MANIFEST-driven file planning — the table-format primitive
    // (Iceberg/Delta manifests) on plain parquet, one level above
    // zorder_scan's row-group pruning: a METADATA TABLE of per-file
    // min/max/count is built from the z-ordered layout, a selective 2-D
    // box query consults ONLY the manifest to enumerate candidate files
    // (the planning step a real table format runs on the driver —
    // bounded: one row per file, never a data scan), and the engine then
    // reads just those files. At 100 TB this is the difference between
    // listing+footer-probing a million files and reading a few-KB
    // manifest. Correctness is the oracle equality itself: the
    // pruned-file aggregate must equal DuckDB over the RAW table (a
    // manifest that drops an overlapping file loses rows and fails the
    // hash). The manifest is dumped per execution (pid-keyed, one row
    // per file) and BOTH engines compute the file-count columns from
    // that same dump, so `n_files_total`/`n_files_scanned`/`pruned` are
    // exact cross-engine whatever the session's layout width.
    checked("layout_manifest_prune",
      s"""WITH b AS (SELECT
         |    CAST(floor(0.40 * max(l_partkey)) AS BIGINT) AS plo,
         |    CAST(floor(0.55 * max(l_partkey)) AS BIGINT) AS phi,
         |    CAST(floor(0.40 * max(l_suppkey)) AS BIGINT) AS slo,
         |    CAST(floor(0.55 * max(l_suppkey)) AS BIGINT) AS shi
         |  FROM lineitem),
         |m AS (SELECT * FROM read_parquet('${ManifestDumpDir.getAbsolutePath}/*.parquet'))
         |SELECT count(*) AS n, ${sqlSum("l_quantity")} AS total_qty,
         |  ${sqlSum("l_extendedprice")} AS revenue,
         |  (SELECT CAST(count(*) AS BIGINT) FROM m) AS n_files_total,
         |  (SELECT CAST(count(*) AS BIGINT) FROM m, b
         |    WHERE mn_p <= b.phi AND mx_p >= b.plo
         |      AND mn_s <= b.shi AND mx_s >= b.slo) AS n_files_scanned,
         |  (SELECT count(*) FROM m, b
         |    WHERE mn_p <= b.phi AND mx_p >= b.plo
         |      AND mn_s <= b.shi AND mx_s >= b.slo)
         |    < (SELECT count(*) FROM m) AS pruned,
         |  (SELECT CAST(sum(n_rows) AS BIGINT) FROM m)
         |    = (SELECT count(*) FROM lineitem) AS manifest_complete
         |FROM lineitem, b
         |WHERE l_partkey BETWEEN b.plo AND b.phi
         |  AND l_suppkey BETWEEN b.slo AND b.shi""".stripMargin) { (s, d) =>
      val zDir = zorderLayoutDir(s, d)
      // Manifest build: one row per layout file — the bounded metadata
      // pass a table format's commit writes. Memoized per (JVM, sf) like
      // the layout; the pid-keyed DUMP for the oracle is rewritten per
      // execution (cheap: #files rows) so it always reflects this run's
      // layout, whatever sf a shared JVM ran last.
      val (manifest, rawCount) = manifestCache.computeIfAbsent(
        QuerySpec.jvmScopedKey(d), { _ =>
          (s.read.parquet(zDir)
            .groupBy(input_file_name().as("file"))
            .agg(min(col("l_partkey")).as("mn_p"), max(col("l_partkey")).as("mx_p"),
              min(col("l_suppkey")).as("mn_s"), max(col("l_suppkey")).as("mx_s"),
              count(lit(1)).as("n_rows"))
            .collect(),
            Tables.lineitem(s, d).count())
        })
      val mLocal = s.createDataFrame(
        java.util.Arrays.asList(manifest: _*),
        org.apache.spark.sql.types.StructType.fromDDL(
          "file STRING, mn_p BIGINT, mx_p BIGINT, mn_s BIGINT, mx_s BIGINT, n_rows BIGINT"))
      mLocal.coalesce(1).write.mode("overwrite")
        .parquet(ManifestDumpDir.getAbsolutePath)
      // Bounds from the manifest's own maxima (== raw-table maxima: the
      // layout is a lossless copy, which manifest_complete re-proves).
      def bnds(m: Long) =
        (math.floor(0.40 * m).toLong, math.floor(0.55 * m).toLong)
      val (pLo, pHi) = bnds(manifest.map(_.getLong(2)).max)
      val (sLo, sHi) = bnds(manifest.map(_.getLong(4)).max)
      // PLANNING: enumerate candidate files from the manifest alone.
      val files = manifest.filter(r =>
        r.getLong(1) <= pHi && r.getLong(2) >= pLo &&
          r.getLong(3) <= sHi && r.getLong(4) >= sLo).map(_.getString(0))
      val nScanned = files.length.toLong
      val nTotal = manifest.length.toLong
      val cond = col("l_partkey").between(pLo, pHi) &&
        col("l_suppkey").between(sLo, sHi)
      s.read.parquet(files: _*).filter(cond)
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("total_qty"),
          dsum(col("l_extendedprice")).as("revenue"))
        .withColumn("n_files_total", lit(nTotal))
        .withColumn("n_files_scanned", lit(nScanned))
        .withColumn("pruned", lit(nScanned < nTotal))
        .withColumn("manifest_complete",
          lit(manifest.map(_.getLong(5)).sum == rawCount))
    },

    // DSv2 WRITE path — the commit protocol itself as the operator
    // ([[graft.sources.v2.MLogDataSource]]): the events ledger is written
    // through `format("mlog")` in TWO commits (base overwrite publishing
    // a fresh manifest, then an append that MERGES entries — executors
    // stage attempt-unique part files, DataWriter.commit reports stats,
    // BatchWrite.commit publishes `_mlog_manifest.json` atomically; the
    // manifest, never the directory listing, defines the table). The
    // k-range query reads back THROUGH the source, whose pushed filters
    // prune files on manifest min/max before planning. Losslessness =
    // the aggregate over the read-back equals DuckDB over the RAW events
    // under the same predicate; the file-count columns are computed by
    // BOTH engines from the same dumped manifest (layout_manifest_prune
    // pattern); manifest_complete re-proves total row conservation
    // across the two commits. At 100 TB this is the write discipline a
    // training-data store needs: atomic publication, zombie-attempt
    // immunity, O(files) planning state. MLogSpec pins the protocol
    // (abort cleanup, orphan invisibility, truncate-vs-append).
    checked("dsv2_mlog_roundtrip",
      s"""WITH b AS (SELECT CAST(floor(0.30 * max(user_id)) AS BIGINT) AS klo,
         |    CAST(floor(0.70 * max(user_id)) AS BIGINT) AS khi FROM events),
         |m AS (SELECT * FROM read_parquet('${MLogDumpDir.getAbsolutePath}/*.parquet'))
         |SELECT CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(epoch_us(ts) % 86400000000) AS BIGINT) AS sum_v,
         |  CAST(min(event_id) AS BIGINT) AS min_id,
         |  CAST(max(event_id) AS BIGINT) AS max_id,
         |  (SELECT CAST(count(*) AS BIGINT) FROM m) AS n_files_total,
         |  (SELECT CAST(count(*) AS BIGINT) FROM m, b
         |    WHERE mn_k <= b.khi AND mx_k >= b.klo) AS n_files_planned,
         |  (SELECT count(*) FROM m, b WHERE mn_k <= b.khi AND mx_k >= b.klo)
         |    < (SELECT count(*) FROM m) AS pruned,
         |  (SELECT CAST(sum(n_rows) AS BIGINT) FROM m)
         |    = (SELECT count(*) FROM events) AS manifest_complete
         |FROM events, b WHERE user_id BETWEEN b.klo AND b.khi""".stripMargin) { (s, d) =>
      val (store, entries) = mlogStore(s, d)
      // Pid-keyed oracle dump, rewritten per execution (one row per file).
      val mLocal = s.createDataFrame(
        java.util.Arrays.asList(entries.map(e => org.apache.spark.sql.Row(
          e.name, e.rows, e.minK, e.maxK)): _*),
        org.apache.spark.sql.types.StructType.fromDDL(
          "file STRING, n_rows BIGINT, mn_k BIGINT, mx_k BIGINT"))
      mLocal.coalesce(1).write.mode("overwrite")
        .parquet(MLogDumpDir.getAbsolutePath)
      // Bounds from the manifest's own k-maximum (== raw max(user_id):
      // manifest_complete + the hash gate re-prove losslessness).
      val maxK = entries.map(_.maxK).max
      val (kLo, kHi) =
        (math.floor(0.30 * maxK).toLong, math.floor(0.70 * maxK).toLong)
      val planned = entries.count(e => e.minK <= kHi && e.maxK >= kLo).toLong
      s.read.format("mlog").load(store)
        .filter(col("k").between(kLo, kHi))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sum_v"),
          min(col("id")).as("min_id"), max(col("id")).as("max_id"))
        .withColumn("n_files_total", lit(entries.size.toLong))
        .withColumn("n_files_planned", lit(planned))
        .withColumn("pruned", lit(planned < entries.size))
        .withColumn("manifest_complete",
          lit(entries.map(_.rows).sum == Tables.events(s, d).count()))
    },

    // The DSv2 source through the PARSER: `CREATE TABLE … USING mlog
    // OPTIONS (path …)` registers the store as a catalog table over the
    // same TableProvider (direct `mlog.`path`` file-syntax is reserved
    // for V1 FileFormats — UNSUPPORTED_DATASOURCE_FOR_DIRECT_QUERY — so
    // the catalog route IS the SQL surface for DSv2 sources), and the
    // SELECT's k-range predicate still reaches SupportsPushDownFilters
    // and prunes files on manifest min/max exactly as the DataFrame
    // route (MLogSpec pins the syntax + pruning via MLog.planned).
    // Oracle: the raw events under the identical predicate — the
    // roundtrip's losslessness columns without the manifest-dump
    // dependency, so this query stays self-contained under a filtered
    // Verify.
    checked("sql_mlog_scan",
      s"""WITH b AS (SELECT CAST(floor(0.30 * max(user_id)) AS BIGINT) AS klo,
         |    CAST(floor(0.70 * max(user_id)) AS BIGINT) AS khi FROM events)
         |SELECT CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(epoch_us(ts) % 86400000000) AS BIGINT) AS sum_v,
         |  CAST(min(event_id) AS BIGINT) AS min_id,
         |  CAST(max(event_id) AS BIGINT) AS max_id
         |FROM events, b WHERE user_id BETWEEN b.klo AND b.khi""".stripMargin) { (s, d) =>
      val (store, entries) = mlogStore(s, d)
      val maxK = entries.map(_.maxK).max
      val (kLo, kHi) =
        (math.floor(0.30 * maxK).toLong, math.floor(0.70 * maxK).toLong)
      val tbl = s"graft_mlog_${QuerySpec.jvmScopedKey(d)}"
      s.sql(s"CREATE TABLE IF NOT EXISTS $tbl USING mlog OPTIONS (path '$store')")
      s.sql(
        s"""SELECT count(*) AS n, sum(v) AS sum_v,
           |  min(id) AS min_id, max(id) AS max_id
           |FROM $tbl WHERE k BETWEEN $kLo AND $kHi""".stripMargin)
    },

    // SCAN STATISTICS from the manifest (`SupportsReportStatistics`): the
    // mlog scan reports the PLANNED file set's exact logical row count
    // and on-disk bytes to Catalyst — no file I/O, the manifest already
    // knows — so a join against a small mlog dimension AUTO-BROADCASTS
    // with no hint (without the interface a DSv2 relation defaults to
    // spark.sql.defaultSizeInBytes = Long.MaxValue and every such join is
    // a sort-merge join; at 100× scale that is a shuffle of the fact
    // table where a broadcast fits). Pinned from the plan itself:
    // auto_broadcast = a BroadcastHashJoinExec is present with NO hint in
    // the query, stats_exact = the optimized logical plan's rowCount for
    // the dim equals nation's true cardinality. Oracle: the same
    // region-rollup computed by DuckDB joining the raw tables.
    checked("join_mlog_broadcast",
      s"""SELECT CAST(n_regionkey AS BIGINT) AS region_key,
         |  CAST(count(*) AS BIGINT) AS n_cust,
         |  CAST(sum(c_custkey) AS BIGINT) AS sum_ck,
         |  true AS auto_broadcast, true AS stats_exact
         |FROM customer JOIN nation ON c_nationkey = n_nationkey
         |GROUP BY 1""".stripMargin) { (s, d) =>
      val dir = TmpDirs.scoped(s"graft_mlogdim_${QuerySpec.jvmScopedKey(d)}")
      val ready = new java.io.File(dir, "_READY")
      val store = new java.io.File(dir, "store").getAbsolutePath
      if (!ready.exists()) {
        rmTree(dir); dir.mkdirs()
        Tables.nation(s, d).select(
          col("n_nationkey").cast("long").as("id"),
          col("n_regionkey").cast("long").as("k"),
          col("n_nationkey").cast("long").as("v"))
          .coalesce(1).write.format("mlog").mode("overwrite").save(store)
        ready.createNewFile(): Unit
      }
      val dim = s.read.format("mlog").load(store)
      val nNation = Tables.nation(s, d).count()
      // Exact manifest-sourced stats visible to the optimizer.
      val stats = dim.queryExecution.optimizedPlan.stats
      val statsExact = stats.rowCount.exists(_.toLong == nNation)
      val agg = Tables.customer(s, d)
        .join(dim, col("c_nationkey") === col("id"))
        .groupBy(col("k").as("region_key"))
        .agg(count(lit(1)).as("n_cust"), sum(col("c_custkey")).as("sum_ck"))
      // The strategy pin: chosen by STATISTICS, not by hint (none here).
      val autoBroadcast = agg.queryExecution.sparkPlan.collectFirst {
        case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
      }.isDefined
      agg.withColumn("auto_broadcast", lit(autoBroadcast))
        .withColumn("stats_exact", lit(statsExact))
    },

    // METADATA-ONLY aggregates (`SupportsPushDownAggregates` — the
    // Delta/Iceberg stats-answered COUNT): an unfiltered, ungrouped
    // COUNT / MIN / MAX over the ledger columns is answered straight
    // from the manifest — zero data files opened (the plan's scan is the
    // one-row "mlog metadata-only aggregate", pinned as metadata_only) —
    // because the manifest is EXACT: logical row counts carry the
    // deletion-vector adjustment and per-file min/max were computed from
    // the rows themselves — ALL THREE ledger columns, since every writer
    // also records per-file v bounds (legacy entries without them make
    // MIN/MAX(v) decline, pinned in MLogSpec). At 100 TB this is a
    // driver-side metadata lookup where a naive engine runs a
    // full-table scan. Oracle: DuckDB computes the same aggregates from
    // the raw events.
    checked("agg_mlog_metadata",
      s"""SELECT CAST(count(*) AS BIGINT) AS n,
         |  CAST(count(epoch_us(ts)) AS BIGINT) AS nv,
         |  CAST(min(event_id) AS BIGINT) AS min_id,
         |  CAST(max(event_id) AS BIGINT) AS max_id,
         |  CAST(min(user_id) AS BIGINT) AS min_k,
         |  CAST(max(user_id) AS BIGINT) AS max_k,
         |  CAST(min(epoch_us(ts) % 86400000000) AS BIGINT) AS min_v,
         |  CAST(max(epoch_us(ts) % 86400000000) AS BIGINT) AS max_v,
         |  true AS metadata_only
         |FROM events""".stripMargin) { (s, d) =>
      val (store, _) = mlogStore(s, d)
      val agg = s.read.format("mlog").load(store)
        .agg(count(lit(1)).as("n"), count(col("v")).as("nv"),
          min(col("id")).as("min_id"), max(col("id")).as("max_id"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"),
          min(col("v")).as("min_v"), max(col("v")).as("max_v"))
      val metadataOnly = agg.queryExecution.executedPlan.toString
        .contains("metadata-only")
      agg.withColumn("metadata_only", lit(metadataOnly))
    },

    // RUNTIME file pruning over the mlog manifest
    // (`SupportsRuntimeV2Filtering`) — dynamic partition pruning with the
    // manifest playing the partition index: the dimension's predicate is
    // on the DAY (derived from ts), not on the join key, so no static
    // bound on `id` is inferable; the only way the fact scan learns the
    // surviving event_ids is the DynamicPruningSubquery Spark plans over
    // the broadcast dim at EXECUTION time. Because event_id is monotone
    // with ts, the first day's ids cluster into the id-range layout's
    // first file(s) — the runtime IN-set prunes the rest of the fact's
    // files before their partitions are planned (dpp_pruned, measured
    // from the executed scan instance; dpp_planned pins that the filter
    // was planned at all). At 100 TB this is the difference between
    // scanning a day's key range and scanning the table when the query
    // only states the day. Oracle: DuckDB over the raw events under the
    // same first-day predicate.
    checked("join_mlog_dpp",
      s"""WITH d0 AS (SELECT min(date_trunc('day', ts)) AS d FROM events)
         |SELECT CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(epoch_us(ts) % 86400000000) AS BIGINT) AS sum_v,
         |  true AS dpp_planned, true AS dpp_pruned
         |FROM events, d0
         |WHERE date_trunc('day', ts) = d0.d""".stripMargin) { (s, d) =>
      val dir = TmpDirs.scoped(s"graft_mlogdpp_${QuerySpec.jvmScopedKey(d)}")
      val ready = new java.io.File(dir, "_READY")
      val store = new java.io.File(dir, "store").getAbsolutePath
      if (!ready.exists()) {
        rmTree(dir); dir.mkdirs()
        Tables.events(s, d).select(col("event_id").as("id"),
          col("user_id").as("k"),
          (unix_micros(col("ts")) % 86400000000L).as("v"))
          .repartitionByRange(8, col("id"))
          .write.format("mlog").mode("overwrite").save(store)
        ready.createNewFile(): Unit
      }
      val firstDay = Tables.events(s, d)
        .agg(min(date_trunc("day", col("ts")))).head.getTimestamp(0)
      val dim = Tables.events(s, d)
        .filter(date_trunc("day", col("ts")) === lit(firstDay))
        .select(col("event_id").as("fid"))
      val fact = s.read.format("mlog").load(store)
      val joined = fact.join(dim, col("id") === col("fid"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sum_v"))
      val row = joined.collect().head
      // Probe the EXECUTED scan (AQE re-plans; descend to the final plan).
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
      val (runtime, static) =
        scanExec.scan.asInstanceOf[graft.sources.v2.MLogScan].runtimePlanned
      s.createDataFrame(
        java.util.Arrays.asList(org.apache.spark.sql.Row(
          row.getLong(0), row.getLong(1),
          scanExec.runtimeFilters.nonEmpty, runtime < static)),
        org.apache.spark.sql.types.StructType.fromDDL(
          "n BIGINT, sum_v BIGINT, dpp_planned BOOLEAN, dpp_pruned BOOLEAN"))
    },

    // SQL WRITE PATH, creation half — `CREATE TABLE … USING mlog AS
    // SELECT …` (CTAS) through [[graft.sources.v2.GraftMLogCatalog]]:
    // catalog DDL completes the lifecycle that was previously API-only
    // for ingestion (df.write.format("mlog")). CTAS is ATOMIC
    // (`StagingTableCatalog`, the Delta/Iceberg shape): the SELECT's
    // output is STAGED as unreferenced ledger files and ONE v1 CAS
    // publishes them — pinned as atomic_create (versions == Seq(1)), so
    // a failure mid-SELECT leaves no table (MLogCatalogDdlSpec pins the
    // failure half). The created store must read identically through
    // the catalog route and the DataFrame route (route_equal). Oracle:
    // DuckDB over the raw events the CTAS selected.
    checked("sql_mlog_ctas",
      s"""SELECT CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(epoch_us(ts) % 86400000000) AS BIGINT) AS sum_v,
         |  CAST(min(event_id) AS BIGINT) AS min_id,
         |  CAST(max(event_id) AS BIGINT) AS max_id,
         |  true AS atomic_create, true AS route_equal
         |FROM events WHERE event_id % 4 <> 0""".stripMargin) { (s, d) =>
      val dir = TmpDirs.scoped(s"graft_mlogctas_${QuerySpec.jvmScopedKey(d)}")
      val ready = new java.io.File(dir, "_READY")
      val store = new java.io.File(dir, "store").getAbsolutePath
      val fs = new org.apache.hadoop.fs.Path(store)
        .getFileSystem(s.sessionState.newHadoopConf())
      import graft.sources.v2.MLog
      s.conf.set("spark.sql.catalog.graft",
        classOf[graft.sources.v2.GraftMLogCatalog].getName)
      if (!ready.exists()) {
        rmTree(dir); dir.mkdirs()
        val view = s"mlog_ctas_src_${QuerySpec.jvmScopedKey(d)}"
        Tables.events(s, d).select(col("event_id").as("id"),
          col("user_id").as("k"),
          (unix_micros(col("ts")) % 86400000000L).as("v"))
          .filter(col("id") % 4 =!= 0)
          .createOrReplaceTempView(view)
        s.sql(s"CREATE TABLE graft.mlog.`$store` USING mlog AS " +
          s"SELECT * FROM $view")
        ready.createNewFile(): Unit
      }
      val atomicCreate =
        MLog.versions(fs, new org.apache.hadoop.fs.Path(store)) == Seq(1)
      val routeEqual = s.sql(s"SELECT * FROM graft.mlog.`$store`").count() ==
        s.read.format("mlog").load(store).count()
      s.sql(
        s"""SELECT count(*) AS n, sum(v) AS sum_v,
           |  min(id) AS min_id, max(id) AS max_id
           |FROM graft.mlog.`$store`""".stripMargin)
        .withColumn("atomic_create", lit(atomicCreate))
        .withColumn("route_equal", lit(routeEqual))
    },

    // SQL WRITE PATH, ingestion half — `CREATE TABLE`, `INSERT INTO …
    // SELECT`, then `INSERT OVERWRITE … SELECT` through the catalog:
    // every statement is ONE snapshot commit (pinned: versions ==
    // (1, 2, 3) — create, insert, overwrite), the INSERT planned by
    // Spark's AppendData and the OVERWRITE by OverwriteByExpression
    // riding the table's TRUNCATE capability, both against the same
    // manifest-committed BatchWrite the DataFrame route uses. The final
    // state is EXACTLY the overwrite's selection (the insert's rows are
    // superseded — still served by snapshot v2 until retention), which
    // is what the oracle checks; pre_overwrite_visible pins the
    // superseded snapshot. Oracle: DuckDB over the raw events the
    // OVERWRITE selected.
    checked("sql_mlog_insert",
      s"""SELECT CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(epoch_us(ts) % 86400000000) AS BIGINT) AS sum_v,
         |  CAST(min(event_id) AS BIGINT) AS min_id,
         |  CAST(max(event_id) AS BIGINT) AS max_id,
         |  true AS statement_per_commit, true AS pre_overwrite_visible
         |FROM events WHERE event_id % 8 = 2""".stripMargin) { (s, d) =>
      val dir = TmpDirs.scoped(s"graft_mloginsert_${QuerySpec.jvmScopedKey(d)}")
      val ready = new java.io.File(dir, "_READY")
      val store = new java.io.File(dir, "store").getAbsolutePath
      val fs = new org.apache.hadoop.fs.Path(store)
        .getFileSystem(s.sessionState.newHadoopConf())
      import graft.sources.v2.MLog
      s.conf.set("spark.sql.catalog.graft",
        classOf[graft.sources.v2.GraftMLogCatalog].getName)
      if (!ready.exists()) {
        rmTree(dir); dir.mkdirs()
        val view = s"mlog_ins_src_${QuerySpec.jvmScopedKey(d)}"
        Tables.events(s, d).select(col("event_id").as("id"),
          col("user_id").as("k"),
          (unix_micros(col("ts")) % 86400000000L).as("v"))
          .createOrReplaceTempView(view)
        s.sql(s"CREATE TABLE graft.mlog.`$store` " +
          "(id BIGINT, k BIGINT, v BIGINT) USING mlog")
        s.sql(s"INSERT INTO graft.mlog.`$store` " +
          s"SELECT * FROM $view WHERE id % 4 = 0")
        s.sql(s"INSERT OVERWRITE graft.mlog.`$store` " +
          s"SELECT * FROM $view WHERE id % 8 = 2")
        ready.createNewFile(): Unit
      }
      val p = new org.apache.hadoop.fs.Path(store)
      val statementPerCommit = MLog.versions(fs, p) == Seq(1, 2, 3)
      // The overwritten state (the INSERT INTO's rows) stays
      // time-travelable at v2 until retention drops it.
      val insertRows = Tables.events(s, d)
        .filter(col("event_id") % 4 === 0).count()
      val preVisible = s.read.format("mlog").option("versionAsOf", 2)
        .load(store).count() == insertRows
      s.sql(
        s"""SELECT count(*) AS n, sum(v) AS sum_v,
           |  min(id) AS min_id, max(id) AS max_id
           |FROM graft.mlog.`$store`""".stripMargin)
        .withColumn("statement_per_commit", lit(statementPerCommit))
        .withColumn("pre_overwrite_visible", lit(preVisible))
    },

    // TIME TRAVEL on the mlog store: every commit writes an immutable
    // snapshot manifest before swapping the current pointer, so
    // `.option("versionAsOf", n)` plans from commit n's manifest — the
    // Iceberg/Delta read primitive that makes a training run
    // REPRODUCIBLE against a table that keeps ingesting (pin the
    // snapshot id in the run config; the reader sees that commit's
    // files regardless of later overwrites). Lifecycle: v1 = 4/5 of
    // the ledger, v2 = OVERWRITE with all of it; the query reads BOTH
    // through the source — versionAsOf v1 must equal DuckDB over the
    // raw events under v1's predicate while the current read sees
    // everything, and n_versions pins the snapshot count.
    checked("dsv2_mlog_time_travel",
      s"""SELECT
         |  (SELECT CAST(count(*) AS BIGINT) FROM events
         |    WHERE event_id % 5 <> 0) AS n_v1,
         |  (SELECT CAST(sum(epoch_us(ts) % 86400000000) AS BIGINT) FROM events
         |    WHERE event_id % 5 <> 0) AS sum_v1,
         |  CAST(count(*) AS BIGINT) AS n_cur,
         |  CAST(sum(epoch_us(ts) % 86400000000) AS BIGINT) AS sum_cur,
         |  CAST(2 AS BIGINT) AS n_versions
         |FROM events""".stripMargin) { (s, d) =>
      val (store, vs) = mlogTtStore(s, d)
      val v1 = s.read.format("mlog").option("versionAsOf", vs.head)
        .load(store)
        .agg(count(lit(1)).as("n_v1"), sum(col("v")).as("sum_v1"))
      val cur = s.read.format("mlog").load(store)
        .agg(count(lit(1)).as("n_cur"), sum(col("v")).as("sum_cur"))
      v1.crossJoin(cur).withColumn("n_versions", lit(vs.size.toLong))
    },

    // The PARSER route to the same time travel — `SELECT … FROM
    // graft.mlog.`store` VERSION AS OF n` — through
    // [[graft.sources.v2.GraftMLogCatalog]], the Delta-catalog shape:
    // Spark's session catalog refuses loadTable(ident, version) for
    // provider tables, so (exactly as Delta does) the route is a
    // custom TableCatalog whose loadTable(ident, version) pins the
    // snapshot manifest. Registered on the LIVE session by conf
    // (catalogs instantiate lazily on first reference — no session
    // rebuild needed). Same store, same oracle as the DataFrame route:
    // the two routes must agree bit-for-bit, which is the route-
    // equivalence pin. `TIMESTAMP AS OF` is the third route — Delta's
    // reproducibility idiom: every commit stamps its wall-clock into the
    // snapshot manifest, loadTable(ident, ts) resolves "the newest
    // snapshot <= ts" (here: 1 ms before v2's commit = v1 — the
    // n_ts/sum_ts legs must equal the VERSION AS OF legs bit-for-bit).
    // MLogCatalogDdlSpec pins the between/at/before-first resolution and
    // the expired-state refusal; MLogSpec pins pushdown-through-catalog
    // and the unknown-version refusal.
    checked("sql_mlog_time_travel",
      s"""SELECT
         |  (SELECT CAST(count(*) AS BIGINT) FROM events
         |    WHERE event_id % 5 <> 0) AS n_v1,
         |  (SELECT CAST(sum(epoch_us(ts) % 86400000000) AS BIGINT) FROM events
         |    WHERE event_id % 5 <> 0) AS sum_v1,
         |  (SELECT CAST(count(*) AS BIGINT) FROM events
         |    WHERE event_id % 5 <> 0) AS n_ts,
         |  (SELECT CAST(sum(epoch_us(ts) % 86400000000) AS BIGINT) FROM events
         |    WHERE event_id % 5 <> 0) AS sum_ts,
         |  CAST(count(*) AS BIGINT) AS n_cur,
         |  CAST(sum(epoch_us(ts) % 86400000000) AS BIGINT) AS sum_cur,
         |  CAST(2 AS BIGINT) AS n_versions
         |FROM events""".stripMargin) { (s, d) =>
      val (store, vs) = mlogTtStore(s, d)
      s.conf.set("spark.sql.catalog.graft",
        classOf[graft.sources.v2.GraftMLogCatalog].getName)
      val p = new org.apache.hadoop.fs.Path(store)
      val fs = p.getFileSystem(s.sessionState.newHadoopConf())
      // The instant just before the newest commit: resolves to v1 (the
      // fixture guarantees the ms clock ticked between the commits).
      val betweenMs =
        graft.sources.v2.MLog.commitTimeMs(fs, p, vs.last) - 1
      s.sql(
        s"""SELECT v1.n_v1, v1.sum_v1, ts.n_ts, ts.sum_ts,
           |  cur.n_cur, cur.sum_cur,
           |  CAST(${vs.size} AS BIGINT) AS n_versions
           |FROM (SELECT count(*) AS n_v1, sum(v) AS sum_v1
           |      FROM graft.mlog.`$store` VERSION AS OF ${vs.head}) v1
           |CROSS JOIN (SELECT count(*) AS n_ts, sum(v) AS sum_ts
           |            FROM graft.mlog.`$store`
           |            TIMESTAMP AS OF timestamp_millis(${betweenMs}L)) ts
           |CROSS JOIN (SELECT count(*) AS n_cur, sum(v) AS sum_cur
           |            FROM graft.mlog.`$store`) cur""".stripMargin)
    },

    // SQL DELETE FROM on the mlog store — the parser route to the
    // copy-on-write delete, via [[graft.sources.v2.GraftMLogCatalog]] +
    // `SupportsDelete`: an exactly-evaluable WHERE (all nodes are boolean
    // algebra over id/k/v comparisons) takes Spark's METADATA-ONLY path
    // (OptimizeMetadataOnlyDeleteFromTable → MLog.delete — manifest-
    // pruned, no query executed); anything else falls back to the
    // group-based row-level rewrite (sql_mlog_update's route). Pinned:
    // files outside the predicate's k bounds are carried BY REFERENCE
    // (identical manifest entries), the whole delete is ONE snapshot,
    // and the pre-delete snapshot still serves every deleted row.
    // Oracle: DuckDB over the raw events minus the predicate, plus the
    // predicate's own count as removed_rows. MLogRowLevelSqlSpec pins
    // the path choice itself (metadata-only vs group rewrite).
    checked("sql_mlog_delete",
      s"""WITH b AS (SELECT CAST(floor(0.30 * max(user_id)) AS BIGINT) AS klo,
         |    CAST(floor(0.70 * max(user_id)) AS BIGINT) AS khi FROM events)
         |SELECT CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(epoch_us(ts) % 86400000000) AS BIGINT) AS sum_v,
         |  CAST(min(event_id) AS BIGINT) AS min_id,
         |  CAST(max(event_id) AS BIGINT) AS max_id,
         |  (SELECT CAST(count(*) AS BIGINT) FROM events, b
         |    WHERE user_id BETWEEN b.klo AND b.khi) AS removed_rows,
         |  true AS carried_match, true AS single_commit,
         |  true AS pre_delete_visible
         |FROM events, b
         |WHERE NOT (user_id BETWEEN b.klo AND b.khi)""".stripMargin) { (s, d) =>
      val dir = TmpDirs.scoped(s"graft_mlogsqldel_${QuerySpec.jvmScopedKey(d)}")
      val ready = new java.io.File(dir, "_READY")
      val store = new java.io.File(dir, "store").getAbsolutePath
      val path = new org.apache.hadoop.fs.Path(store)
      val fs = path.getFileSystem(s.sessionState.newHadoopConf())
      import graft.sources.v2.MLog
      s.conf.set("spark.sql.catalog.graft",
        classOf[graft.sources.v2.GraftMLogCatalog].getName)
      val facts = if (!ready.exists()) {
        rmTree(dir); dir.mkdirs()
        Tables.events(s, d).select(col("event_id").as("id"),
          col("user_id").as("k"),
          (unix_micros(col("ts")) % 86400000000L).as("v"))
          .repartitionByRange(7, col("k"))
          .write.format("mlog").mode("overwrite").save(store)
        val pre = MLog.readManifest(fs, path)
        val preVersion = MLog.versions(fs, path).last
        val total = pre.map(_.rows).sum
        val maxK = pre.map(_.maxK).max
        val (kLo, kHi) =
          (math.floor(0.30 * maxK).toLong, math.floor(0.70 * maxK).toLong)
        val touchedExp = pre.count(e => e.minK <= kHi && e.maxK >= kLo)
        s.sql(s"DELETE FROM graft.mlog.`$store` " +
          s"WHERE k BETWEEN $kLo AND $kHi")
        val post = MLog.readManifest(fs, path)
        val removed = total - post.map(_.rows).sum
        val preSet = pre.toSet
        val carriedOk =
          post.count(preSet.contains) == pre.size - touchedExp
        val singleCommit =
          MLog.versions(fs, path) == (1 to preVersion + 1)
        val preVisible = s.read.format("mlog")
          .option("versionAsOf", preVersion).load(store).count() == total
        val f = Seq(removed, if (carriedOk) 1L else 0L,
          if (singleCommit) 1L else 0L, if (preVisible) 1L else 0L)
        java.nio.file.Files.write(ready.toPath,
          f.mkString(" ").getBytes("UTF-8"))
        f
      } else new String(
        java.nio.file.Files.readAllBytes(ready.toPath), "UTF-8")
        .trim.split(" ").toSeq.map(_.toLong)
      s.read.format("mlog").load(store)
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sum_v"),
          min(col("id")).as("min_id"), max(col("id")).as("max_id"))
        .withColumn("removed_rows", lit(facts(0)))
        .withColumn("carried_match", lit(facts(1) == 1L))
        .withColumn("single_commit", lit(facts(2) == 1L))
        .withColumn("pre_delete_visible", lit(facts(3) == 1L))
    },

    // SQL UPDATE on the mlog store — the GROUP-BASED row-level rewrite
    // (`SupportsRowLevelOperations`, the Iceberg copy-on-write shape):
    // Spark's RewriteUpdateTable reads the affected groups through the
    // operation's scan, recomputes their rows, and the replace-data
    // write swaps exactly those files in one snapshot. GROUP = data
    // file, keyed by the `_file` METADATA column; Spark's runtime group
    // filtering plans a subquery for the DISTINCT `_file` of matching
    // rows, so the rewrite touches EXACTLY the files containing matches
    // — pinned by deriving the expected touched set from a `_file`
    // scan under the same predicate (exact, not bounds-approximate) and
    // checking every other file carried by reference. Oracle: DuckDB
    // recomputes the conditional bump over the raw events.
    checked("sql_mlog_update",
      s"""WITH bb AS (SELECT CAST(floor(0.30 * max(event_id)) AS BIGINT) AS ilo,
         |    CAST(floor(0.70 * max(event_id)) AS BIGINT) AS ihi FROM events)
         |SELECT CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(CASE WHEN event_id BETWEEN bb.ilo AND bb.ihi
         |      AND event_id % 3 = 0
         |    THEN epoch_us(ts) % 86400000000 + 5
         |    ELSE epoch_us(ts) % 86400000000 END) AS BIGINT) AS sum_v,
         |  CAST(min(event_id) AS BIGINT) AS min_id,
         |  CAST(max(event_id) AS BIGINT) AS max_id,
         |  (SELECT CAST(count(*) AS BIGINT) FROM events, bb
         |    WHERE event_id BETWEEN bb.ilo AND bb.ihi AND event_id % 3 = 0)
         |    AS updated_rows,
         |  true AS group_filtered, true AS single_commit
         |FROM events, bb""".stripMargin) { (s, d) =>
      val dir = TmpDirs.scoped(s"graft_mlogsqlupd_${QuerySpec.jvmScopedKey(d)}")
      val ready = new java.io.File(dir, "_READY")
      val store = new java.io.File(dir, "store").getAbsolutePath
      val path = new org.apache.hadoop.fs.Path(store)
      val fs = path.getFileSystem(s.sessionState.newHadoopConf())
      import graft.sources.v2.MLog
      s.conf.set("spark.sql.catalog.graft",
        classOf[graft.sources.v2.GraftMLogCatalog].getName)
      val facts = if (!ready.exists()) {
        rmTree(dir); dir.mkdirs()
        Tables.events(s, d).select(col("event_id").as("id"),
          col("user_id").as("k"),
          (unix_micros(col("ts")) % 86400000000L).as("v"))
          .repartitionByRange(7, col("id"))
          .write.format("mlog").mode("overwrite").save(store)
        val pre = MLog.readManifest(fs, path)
        val preVersion = MLog.versions(fs, path).last
        val maxId = pre.map(_.maxId).max
        val (iLo, iHi) =
          (math.floor(0.30 * maxId).toLong, math.floor(0.70 * maxId).toLong)
        val predicate = col("id").between(iLo, iHi) && col("id") % 3 === 0
        // EXACT expected touch set: the files that hold matching rows,
        // read through the `_file` metadata column (what the runtime
        // group filter itself computes).
        val touchedExp = s.read.format("mlog").load(store)
          .filter(predicate).select(col("_file")).distinct().count()
        val updExp = s.read.format("mlog").load(store)
          .filter(predicate).count()
        s.sql(s"UPDATE graft.mlog.`$store` SET v = v + 5 " +
          s"WHERE id BETWEEN $iLo AND $iHi AND id % 3 = 0")
        val post = MLog.readManifest(fs, path)
        val preSet = pre.toSet
        val grouped =
          post.count(preSet.contains) == pre.size - touchedExp &&
          touchedExp < pre.size
        val singleCommit =
          MLog.versions(fs, path) == (1 to preVersion + 1)
        val f = Seq(updExp, if (grouped) 1L else 0L,
          if (singleCommit) 1L else 0L)
        java.nio.file.Files.write(ready.toPath,
          f.mkString(" ").getBytes("UTF-8"))
        f
      } else new String(
        java.nio.file.Files.readAllBytes(ready.toPath), "UTF-8")
        .trim.split(" ").toSeq.map(_.toLong)
      s.read.format("mlog").load(store)
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sum_v"),
          min(col("id")).as("min_id"), max(col("id")).as("max_id"))
        .withColumn("updated_rows", lit(facts(0)))
        .withColumn("group_filtered", lit(facts(1) == 1L))
        .withColumn("single_commit", lit(facts(2) == 1L))
    },

    // SQL MERGE INTO on the mlog store — the parser route to the upsert,
    // same oracle SHAPE as dsv2_mlog_merge but planned entirely by
    // Spark's RewriteMergeIntoTable over the group-based row-level
    // operation: matched rows update, unmatched source rows insert,
    // and the runtime group filter restricts the rewrite to the files
    // holding MATCHED rows (derived exactly via a `_file` scan of the
    // base under the source-key predicate); every other file carries by
    // reference, the whole merge is ONE snapshot, and the pre-merge
    // snapshot still serves the old values. Unlike the API route
    // (MLog.merge — broadcast-key low-shuffle upsert), this route
    // supports ARBITRARY WHEN clauses because Spark computes the
    // semantics and the format only swaps files; the two routes must
    // agree on the upsert they both express.
    checked("sql_mlog_merge",
      s"""WITH bb AS (SELECT CAST(floor(0.30 * max(event_id)) AS BIGINT) AS ilo,
         |    CAST(floor(0.70 * max(event_id)) AS BIGINT) AS ihi
         |  FROM events WHERE event_id % 5 <> 0),
         |base AS (SELECT event_id AS id, user_id AS k,
         |    epoch_us(ts) % 86400000000 AS v
         |  FROM events WHERE event_id % 5 <> 0),
         |src AS (SELECT event_id AS id, user_id AS k,
         |    epoch_us(ts) % 86400000000 + 1 AS v
         |  FROM events, bb
         |  WHERE event_id BETWEEN bb.ilo AND bb.ihi AND event_id % 3 = 0),
         |merged AS (SELECT * FROM base WHERE id NOT IN (SELECT id FROM src)
         |  UNION ALL SELECT * FROM src)
         |SELECT CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(v) AS BIGINT) AS sum_v,
         |  CAST(min(id) AS BIGINT) AS min_id,
         |  CAST(max(id) AS BIGINT) AS max_id,
         |  (SELECT CAST(count(*) AS BIGINT) FROM src
         |    WHERE id IN (SELECT id FROM base)) AS updated_rows,
         |  (SELECT CAST(count(*) AS BIGINT) FROM src
         |    WHERE id NOT IN (SELECT id FROM base)) AS inserted_rows,
         |  true AS single_commit, true AS group_filtered,
         |  true AS pre_merge_visible
         |FROM merged""".stripMargin) { (s, d) =>
      val dir = TmpDirs.scoped(s"graft_mlogsqlmrg_${QuerySpec.jvmScopedKey(d)}")
      val ready = new java.io.File(dir, "_READY")
      val store = new java.io.File(dir, "store").getAbsolutePath
      val path = new org.apache.hadoop.fs.Path(store)
      val fs = path.getFileSystem(s.sessionState.newHadoopConf())
      import graft.sources.v2.MLog
      s.conf.set("spark.sql.catalog.graft",
        classOf[graft.sources.v2.GraftMLogCatalog].getName)
      val facts = if (!ready.exists()) {
        rmTree(dir); dir.mkdirs()
        val ledger = Tables.events(s, d).select(col("event_id").as("id"),
          col("user_id").as("k"),
          (unix_micros(col("ts")) % 86400000000L).as("v"))
        ledger.filter(col("id") % 5 =!= 0).repartitionByRange(7, col("id"))
          .write.format("mlog").mode("overwrite").save(store)
        val pre = MLog.readManifest(fs, path)
        val preVersion = MLog.versions(fs, path).last
        val baseCount = pre.map(_.rows).sum
        val maxId = pre.map(_.maxId).max
        val (iLo, iHi) =
          (math.floor(0.30 * maxId).toLong, math.floor(0.70 * maxId).toLong)
        val view = s"mlog_sqlmrg_src_${QuerySpec.jvmScopedKey(d)}"
        ledger.filter(col("id").between(iLo, iHi) && col("id") % 3 === 0)
          .withColumn("v", col("v") + 1L)
          .createOrReplaceTempView(view)
        val srcCount = s.table(view).count()
        // EXACT expected touch set: base files holding a matched row.
        val touchedExp = s.read.format("mlog").load(store)
          .filter(col("id").between(iLo, iHi) && col("id") % 3 === 0)
          .select(col("_file")).distinct().count()
        s.sql(
          s"""MERGE INTO graft.mlog.`$store` t USING $view s
             |ON t.id = s.id
             |WHEN MATCHED THEN UPDATE SET *
             |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
        val post = MLog.readManifest(fs, path)
        val postCount = s.read.format("mlog").load(store).count()
        val inserted = postCount - baseCount
        val updated = srcCount - inserted
        val singleCommit =
          MLog.versions(fs, path) == (1 to preVersion + 1)
        val preSet = pre.toSet
        val grouped =
          post.count(preSet.contains) == pre.size - touchedExp &&
          touchedExp < pre.size
        val preVisible = s.read.format("mlog")
          .option("versionAsOf", preVersion).load(store).count() == baseCount
        val f = Seq(updated, inserted, if (singleCommit) 1L else 0L,
          if (grouped) 1L else 0L, if (preVisible) 1L else 0L)
        java.nio.file.Files.write(ready.toPath,
          f.mkString(" ").getBytes("UTF-8"))
        f
      } else new String(
        java.nio.file.Files.readAllBytes(ready.toPath), "UTF-8")
        .trim.split(" ").toSeq.map(_.toLong)
      s.read.format("mlog").load(store)
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sum_v"),
          min(col("id")).as("min_id"), max(col("id")).as("max_id"))
        .withColumn("updated_rows", lit(facts(0)))
        .withColumn("inserted_rows", lit(facts(1)))
        .withColumn("single_commit", lit(facts(2) == 1L))
        .withColumn("group_filtered", lit(facts(3) == 1L))
        .withColumn("pre_merge_visible", lit(facts(4) == 1L))
    },

    // SQL TABLE MAINTENANCE through stored procedures — `CALL
    // graft.system.{compact, expire_versions, vacuum}` (Spark 4's
    // ProcedureCatalog on [[graft.sources.v2.GraftMLogCatalog]], the
    // Iceberg maintenance surface; [[graft.sources.v2.MLogProcedures]]):
    // the lifecycle primitives that are COMMANDS rather than queries,
    // reachable from pure SQL with each call returning its measured
    // receipt as a result row. Lifecycle exercised end-to-end on
    // 12-file small-file debris: OPTIMIZE packs it (receipts pinned
    // against the manifest restatement: files strictly drop, >= 2
    // merged, one new snapshot), expire_versions(keep_last = 1) drops
    // the pre-compaction snapshot, vacuum reclaims EXACTLY the
    // superseded small files (receipt == the manifest name-diff), and
    // the store then reads bit-equal to DuckDB over the raw events —
    // maintenance changes layout, never content. Facts persist in the
    // _READY marker for memoized re-entries.
    checked("sql_mlog_maintenance",
      s"""SELECT CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(epoch_us(ts) % 86400000000) AS BIGINT) AS sum_v,
         |  CAST(min(event_id) AS BIGINT) AS min_id,
         |  CAST(max(event_id) AS BIGINT) AS max_id,
         |  true AS compact_receipt_ok, true AS expire_receipt_ok,
         |  true AS vacuum_receipt_ok, true AS dir_clean,
         |  true AS history_receipt_ok
         |FROM events""".stripMargin) { (s, d) =>
      val dir = TmpDirs.scoped(s"graft_mlogsqlmnt_${QuerySpec.jvmScopedKey(d)}")
      val ready = new java.io.File(dir, "_READY")
      val storeDir = new java.io.File(dir, "store")
      val store = storeDir.getAbsolutePath
      val path = new org.apache.hadoop.fs.Path(store)
      val fs = path.getFileSystem(s.sessionState.newHadoopConf())
      import graft.sources.v2.MLog
      s.conf.set("spark.sql.catalog.graft",
        classOf[graft.sources.v2.GraftMLogCatalog].getName)
      val facts = if (!ready.exists()) {
        rmTree(dir); dir.mkdirs()
        Tables.events(s, d).select(col("event_id").as("id"),
          col("user_id").as("k"),
          (unix_micros(col("ts")) % 86400000000L).as("v"))
          .repartitionByRange(12, col("k"))
          .write.format("mlog").mode("overwrite").save(store)
        val pre = MLog.readManifest(fs, path)
        val preVersion = MLog.versions(fs, path).last
        val total = pre.map(_.rows).sum
        val cmp = s.sql(
          s"CALL graft.system.compact('$store', ${total / 3 + 1})").head
        val post = MLog.readManifest(fs, path)
        val compactOk = cmp.getInt(0) == pre.size &&
          cmp.getInt(1) == post.size && cmp.getInt(1) < cmp.getInt(0) &&
          cmp.getInt(2) >= 2 && cmp.getInt(3) == preVersion + 1 &&
          post.map(_.rows).sum == total
        val superseded =
          (pre.map(_.name).toSet -- post.map(_.name).toSet).size.toLong
        // DESCRIBE HISTORY through CALL: one row per retained snapshot,
        // ascending, each (commit_at, files, rows, bytes) equal to that
        // snapshot's manifest read directly (commit_at = the stamped
        // wall-clock TIMESTAMP AS OF resolves by) — checked while
        // history is deep, and again after retention when exactly the
        // survivor must remain.
        def historyRows() = s.sql(s"CALL graft.system.history('$store')")
          .collect().map(r => (r.getInt(0), r.getTimestamp(1),
            r.getInt(2), r.getLong(3), r.getLong(4))).toSeq
        val histDeep = historyRows()
        val histDeepOk = histDeep.map(_._1) == (1 to preVersion + 1) &&
          histDeep.forall { case (v, ts, nf, nr, nb) =>
            val m = MLog.readManifestVersion(fs, path, v)
            ts != null && ts.getTime == MLog.commitTimeMs(fs, path, v) &&
              nf == m.size && nr == m.map(_.logicalRows).sum &&
              nb == m.map(_.sizeBytes).sum
          }
        val exp = s.sql(
          s"CALL graft.system.expire_versions('$store', 1)").head
        val expireOk = exp.getInt(0) == preVersion // all pre-compact snaps
        // min_age_seconds = 0: single-writer fixture, nothing is in flight.
        val vac = s.sql(s"CALL graft.system.vacuum('$store', 0)").head
        val vacuumOk = vac.getLong(0) == superseded
        val histAfter = historyRows()
        val historyOk = histDeepOk &&
          histAfter.map(_._1) == Seq(preVersion + 1) &&
          histAfter.head._4 == total
        val onDisk = Option(storeDir.listFiles()).getOrElse(Array.empty)
          .map(_.getName).filter(_.endsWith(".mlog")).toSet
        val dirClean = onDisk == post.map(_.name).toSet
        val f = Seq(compactOk, expireOk, vacuumOk, dirClean, historyOk)
          .map(b => if (b) 1L else 0L)
        java.nio.file.Files.write(ready.toPath,
          f.mkString(" ").getBytes("UTF-8"))
        f
      } else new String(
        java.nio.file.Files.readAllBytes(ready.toPath), "UTF-8")
        .trim.split(" ").toSeq.map(_.toLong)
      s.read.format("mlog").load(store)
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sum_v"),
          min(col("id")).as("min_id"), max(col("id")).as("max_id"))
        .withColumn("compact_receipt_ok", lit(facts(0) == 1L))
        .withColumn("expire_receipt_ok", lit(facts(1) == 1L))
        .withColumn("vacuum_receipt_ok", lit(facts(2) == 1L))
        .withColumn("dir_clean", lit(facts(3) == 1L))
        .withColumn("history_receipt_ok", lit(facts(4) == 1L))
    },

    // The RETENTION half of the mlog lifecycle: an overwrite SUPERSEDES
    // the previous commit’s files but its snapshot manifest still names
    // them (time travel), so reclamation is two-phase — EXPIRE the old
    // snapshot (`MLog.expireVersions`, keepLast = 1: exactly 1 here),
    // THEN `MLog.vacuum` reclaims exactly the now-unreferenced files.
    // Lifecycle: commit 1 writes the 4/5 ledger range-partitioned,
    // commit 2 OVERWRITES with the full ledger — expire drops snapshot
    // v1, and vacuum must remove EXACTLY the files v1 named that the
    // current manifest does not (the superseded set, measured from the
    // two manifests BEFORE expiry — not a hard-coded file count, which
    // would couple the gate to how many non-empty partitions the
    // range-writer happened to produce at this SF). The data dir ends
    // ≡ the manifest (`dir_clean`, recomputed per call) and the k-range
    // aggregate over the post-vacuum read is gated against DuckDB over
    // the RAW events: retention changed nothing a current reader can
    // see. The measured lifecycle facts persist in the _READY marker so
    // memoized re-entries re-report them.
    checked("dsv2_mlog_vacuum",
      s"""WITH b AS (SELECT CAST(floor(0.30 * max(user_id)) AS BIGINT) AS klo,
         |    CAST(floor(0.70 * max(user_id)) AS BIGINT) AS khi FROM events)
         |SELECT CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(epoch_us(ts) % 86400000000) AS BIGINT) AS sum_v,
         |  CAST(min(event_id) AS BIGINT) AS min_id,
         |  CAST(max(event_id) AS BIGINT) AS max_id,
         |  CAST(1 AS BIGINT) AS expired_versions,
         |  true AS vacuum_effective,
         |  true AS orphans_match_superseded,
         |  true AS dir_clean
         |FROM events, b WHERE user_id BETWEEN b.klo AND b.khi""".stripMargin) { (s, d) =>
      val dir = TmpDirs.scoped(s"graft_mlogvac_${QuerySpec.jvmScopedKey(d)}")
      val ready = new java.io.File(dir, "_READY2")
      val storeDir = new java.io.File(dir, "store")
      val store = storeDir.getAbsolutePath
      val fs = new org.apache.hadoop.fs.Path(store)
        .getFileSystem(s.sessionState.newHadoopConf())
      val ledger = Tables.events(s, d).select(col("event_id").as("id"),
        col("user_id").as("k"),
        (unix_micros(col("ts")) % 86400000000L).as("v"))
      val (expired, removed, superseded) = if (!ready.exists()) {
        rmTree(dir); dir.mkdirs()
        ledger.filter(col("id") % 5 =!= 0).repartitionByRange(7, col("k"))
          .write.format("mlog").mode("overwrite").save(store)
        ledger.repartitionByRange(3, col("k"))
          .write.format("mlog").mode("overwrite").save(store)
        val path = new org.apache.hadoop.fs.Path(store)
        // The EXPECTED reclamation set, from the manifests themselves
        // (pre-expiry): files snapshot v1 names that the current
        // manifest does not. Derived, never assumed — the range writer
        // creates no file for an empty partition, so file counts are an
        // SF-dependent fact of the layout, not of the product code.
        val v1 = graft.sources.v2.MLog.versions(fs, path).head
        val v1Files = graft.sources.v2.MLog
          .readManifestVersion(fs, path, v1).map(_.name).toSet
        val curFiles = graft.sources.v2.MLog
          .readManifest(fs, path).map(_.name).toSet
        val nSuperseded = (v1Files -- curFiles).size.toLong
        // Retention order (the Iceberg discipline): EXPIRE the snapshot
        // still naming the superseded files, THEN vacuum — a vacuum
        // before expiry removes nothing, because time travel to v1 must
        // keep working while its snapshot is retained.
        val nExp = graft.sources.v2.MLog.expireVersions(fs, path, keepLast = 1)
        // minAgeMs = 0: single-writer fixture, nothing is in flight.
        val n = graft.sources.v2.MLog.vacuum(fs, path, minAgeMs = 0L)
        java.nio.file.Files.write(ready.toPath,
          s"$nExp $n $nSuperseded".getBytes("UTF-8"))
        (nExp.toLong, n, nSuperseded)
      } else {
        val parts = new String(
          java.nio.file.Files.readAllBytes(ready.toPath), "UTF-8")
          .trim.split(" ")
        (parts(0).toLong, parts(1).toLong, parts(2).toLong)
      }
      val live = graft.sources.v2.MLog.readManifest(fs,
        new org.apache.hadoop.fs.Path(store))
      val onDisk = Option(storeDir.listFiles()).getOrElse(Array.empty)
        .map(_.getName).filter(_.endsWith(".mlog")).toSet
      val maxK = live.map(_.maxK).max
      val (kLo, kHi) =
        (math.floor(0.30 * maxK).toLong, math.floor(0.70 * maxK).toLong)
      s.read.format("mlog").load(store)
        .filter(col("k").between(kLo, kHi))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sum_v"),
          min(col("id")).as("min_id"), max(col("id")).as("max_id"))
        .withColumn("expired_versions", lit(expired))
        .withColumn("vacuum_effective", lit(removed >= 1L))
        .withColumn("orphans_match_superseded", lit(removed == superseded))
        .withColumn("dir_clean", lit(onDisk == live.map(_.name).toSet))
    },

    // COPY-ON-WRITE DELETE — the mlog row-lifecycle primitive
    // ([[graft.sources.v2.MLog.delete]]): a predicate delete touches ONLY
    // the files whose manifest (k) bounds could hold a match (each
    // rewritten by one task without its matching rows; an all-deleted
    // file leaves no replacement), every other file is carried into the
    // new manifest BY REFERENCE — zero bytes moved, the reason a
    // targeted delete at 100 TB costs its key range's files, not the
    // table. Lifecycle gated end-to-end: rewritten/carried are pinned
    // against counts DERIVED from the pre-delete manifest (never
    // hard-coded — the range writer's file count is an SF fact, not a
    // product fact); time travel to the pre-delete snapshot still serves
    // every deleted row (copy-on-write, not erase); then the GDPR
    // completion — expire the pre-delete snapshots + vacuum — makes them
    // unrecoverable (snapshot read fails loudly, exactly the superseded
    // files reclaimed, the dir holds only live files). The post-delete
    // store must equal DuckDB over the raw events MINUS the predicate,
    // and removed_rows equals DuckDB's count OF the predicate. Facts are
    // measured once per (JVM, sf) and persisted in the _READY marker so
    // memoized re-entries re-report them (dsv2_mlog_vacuum pattern).
    checked("dsv2_mlog_delete",
      s"""WITH b AS (SELECT CAST(floor(0.30 * max(user_id)) AS BIGINT) AS klo,
         |    CAST(floor(0.70 * max(user_id)) AS BIGINT) AS khi FROM events)
         |SELECT CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(epoch_us(ts) % 86400000000) AS BIGINT) AS sum_v,
         |  CAST(min(event_id) AS BIGINT) AS min_id,
         |  CAST(max(event_id) AS BIGINT) AS max_id,
         |  (SELECT CAST(count(*) AS BIGINT) FROM events, b
         |    WHERE user_id BETWEEN b.klo AND b.khi AND event_id % 3 = 0)
         |    AS removed_rows,
         |  true AS rewritten_match, true AS carried_match,
         |  true AS pre_delete_visible, true AS gdpr_unrecoverable
         |FROM events, b
         |WHERE NOT (user_id BETWEEN b.klo AND b.khi AND event_id % 3 = 0)
         |""".stripMargin) { (s, d) =>
      val dir = TmpDirs.scoped(s"graft_mlogdel_${QuerySpec.jvmScopedKey(d)}")
      val ready = new java.io.File(dir, "_READY")
      val store = new java.io.File(dir, "store").getAbsolutePath
      val path = new org.apache.hadoop.fs.Path(store)
      val fs = path.getFileSystem(s.sessionState.newHadoopConf())
      import graft.sources.v2.MLog
      val facts = if (!ready.exists()) {
        rmTree(dir); dir.mkdirs()
        Tables.events(s, d).select(col("event_id").as("id"),
          col("user_id").as("k"),
          (unix_micros(col("ts")) % 86400000000L).as("v"))
          .repartitionByRange(7, col("k"))
          .write.format("mlog").mode("overwrite").save(store)
        val pre = MLog.readManifest(fs, path)
        val preNames = pre.map(_.name).toSet
        val preVersion = MLog.versions(fs, path).last
        val total = pre.map(_.rows).sum
        // Bounds from the manifest's own k-maximum (== raw max(user_id);
        // the hash gate re-proves the equality via the oracle's b CTE).
        val maxK = pre.map(_.maxK).max
        val (kLo, kHi) =
          (math.floor(0.30 * maxK).toLong, math.floor(0.70 * maxK).toLong)
        val touchedExp = pre.count(e => e.minK <= kHi && e.maxK >= kLo)
        val stats = MLog.delete(s, path,
          e => e.minK <= kHi && e.maxK >= kLo,
          (id, k, _) => k >= kLo && k <= kHi && id % 3 == 0)
        // Copy-on-write proof, measured BEFORE retention erases it: the
        // pre-delete snapshot still serves the whole table.
        val preVisible = s.read.format("mlog")
          .option("versionAsOf", preVersion).load(store).count() == total
        val postNames = MLog.readManifest(fs, path).map(_.name).toSet
        val superseded = (preNames -- postNames).size.toLong
        // GDPR completion: drop every pre-delete snapshot, then reclaim.
        MLog.expireVersions(fs, path, keepLast = 1)
        val vacuumed = MLog.vacuum(fs, path, minAgeMs = 0L)
        val ttGone =
          try { MLog.readManifestVersion(fs, path, preVersion); false }
          catch { case _: Exception => true }
        val onDisk = Option(new java.io.File(store).listFiles())
          .getOrElse(Array.empty)
          .map(_.getName).filter(_.endsWith(".mlog")).toSet
        val f = Seq(stats.removedRows,
          if (stats.rewritten == touchedExp &&
            stats.newVersion == preVersion + 1) 1L else 0L,
          if (stats.carried == pre.size - touchedExp) 1L else 0L,
          if (preVisible) 1L else 0L,
          if (ttGone && vacuumed == superseded && onDisk == postNames) 1L
          else 0L)
        java.nio.file.Files.write(ready.toPath,
          f.mkString(" ").getBytes("UTF-8"))
        f
      } else new String(
        java.nio.file.Files.readAllBytes(ready.toPath), "UTF-8")
        .trim.split(" ").toSeq.map(_.toLong)
      s.read.format("mlog").load(store)
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sum_v"),
          min(col("id")).as("min_id"), max(col("id")).as("max_id"))
        .withColumn("removed_rows", lit(facts(0)))
        .withColumn("rewritten_match", lit(facts(1) == 1L))
        .withColumn("carried_match", lit(facts(2) == 1L))
        .withColumn("pre_delete_visible", lit(facts(3) == 1L))
        .withColumn("gdpr_unrecoverable", lit(facts(4) == 1L))
    },

    // BIN-PACKING COMPACTION — the mlog row-lifecycle primitive, part 2
    // ([[graft.sources.v2.MLog.compact]], Delta OPTIMIZE): files under
    // the target are first-fit packed and each multi-file bin merged by
    // one task via pure payload byte-copy; files already at target (and
    // bins of one) are carried by reference, and the replacement's
    // manifest stats are ALGEBRA (sum of rows, min of mins, max of
    // maxes) — compaction never re-parses a row. Gated: the post-compact
    // read is bit-equal to DuckDB over the raw events (content identity
    // — OPTIMIZE changes layout, never rows), rows/global-min/max are
    // conserved across the manifest restatement, the file count strictly
    // drops with >= 2 files merged, and the PRE-compaction snapshot
    // still reads the old layout (its planned file count is the
    // pre-compact manifest's). The 100 TB point: small-file debris from
    // fine-grained commits is what kills O(files) planning; this
    // restores it without touching row content. Facts persist in the
    // _READY marker for memoized re-entries.
    checked("dsv2_mlog_compact",
      s"""SELECT CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(epoch_us(ts) % 86400000000) AS BIGINT) AS sum_v,
         |  CAST(min(event_id) AS BIGINT) AS min_id,
         |  CAST(max(event_id) AS BIGINT) AS max_id,
         |  true AS files_reduced, true AS rows_conserved,
         |  true AS stats_algebra_ok, true AS old_layout_readable
         |FROM events""".stripMargin) { (s, d) =>
      val dir = TmpDirs.scoped(s"graft_mlogcmp_${QuerySpec.jvmScopedKey(d)}")
      val ready = new java.io.File(dir, "_READY")
      val store = new java.io.File(dir, "store").getAbsolutePath
      val path = new org.apache.hadoop.fs.Path(store)
      val fs = path.getFileSystem(s.sessionState.newHadoopConf())
      import graft.sources.v2.MLog
      val facts = if (!ready.exists()) {
        rmTree(dir); dir.mkdirs()
        // Small-file debris on purpose: 12 range files of ~1/12 of the
        // ledger each, the shape fine-grained commits leave behind.
        Tables.events(s, d).select(col("event_id").as("id"),
          col("user_id").as("k"),
          (unix_micros(col("ts")) % 86400000000L).as("v"))
          .repartitionByRange(12, col("k"))
          .write.format("mlog").mode("overwrite").save(store)
        val pre = MLog.readManifest(fs, path)
        val preVersion = MLog.versions(fs, path).last
        val total = pre.map(_.rows).sum
        val stats = MLog.compact(s, path, targetRows = total / 3 + 1)
        val post = MLog.readManifest(fs, path)
        val reduced = stats.after < stats.before && stats.merged >= 2 &&
          stats.before == pre.size && stats.after == post.size &&
          stats.newVersion == preVersion + 1
        val conserved = post.map(_.rows).sum == total
        val algebra = post.map(_.minId).min == pre.map(_.minId).min &&
          post.map(_.maxId).max == pre.map(_.maxId).max &&
          post.map(_.minK).min == pre.map(_.minK).min &&
          post.map(_.maxK).max == pre.map(_.maxK).max
        // The pre-compaction snapshot keeps the OLD layout readable:
        // same rows, planned from the pre-compact manifest's files.
        val oldDf = s.read.format("mlog").option("versionAsOf", preVersion)
          .load(store)
        val oldN = oldDf.count()
        val oldLayout = oldN == total &&
          MLog.planned(oldDf) == ((pre.size, pre.size))
        val f = Seq(reduced, conserved, algebra, oldLayout)
          .map(b => if (b) 1L else 0L)
        java.nio.file.Files.write(ready.toPath,
          f.mkString(" ").getBytes("UTF-8"))
        f
      } else new String(
        java.nio.file.Files.readAllBytes(ready.toPath), "UTF-8")
        .trim.split(" ").toSeq.map(_.toLong)
      s.read.format("mlog").load(store)
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sum_v"),
          min(col("id")).as("min_id"), max(col("id")).as("max_id"))
        .withColumn("files_reduced", lit(facts(0) == 1L))
        .withColumn("rows_conserved", lit(facts(1) == 1L))
        .withColumn("stats_algebra_ok", lit(facts(2) == 1L))
        .withColumn("old_layout_readable", lit(facts(3) == 1L))
    },

    // CLUSTERED OPTIMIZE — compact(cluster_by => 'k'): where plain
    // bin-packing UNIONS the merged files' bounds (pruning gets coarser
    // after maintenance), the clustered rewrite globally sorts the small
    // files by k through a real distributed range-partitioned sort, so
    // each output owns a disjoint k slice and the same k predicate plans
    // FEWER files after OPTIMIZE than before — the OPTIMIZE ZORDER
    // contract, pinned end-to-end: the store is built hash-partitioned
    // on id (every file spans the whole k range, the pruning worst
    // case), a k-range scan pre-compaction plans ALL files, and
    // post-compaction a strict subset. rows_conserved + the
    // oracle-checked count/sum/min/max prove the rewrite moved every
    // row exactly once. Facts persist in the _READY marker.
    checked("dsv2_mlog_cluster",
      s"""SELECT CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(epoch_us(ts) % 86400000000) AS BIGINT) AS sum_v,
         |  CAST(min(event_id) AS BIGINT) AS min_id,
         |  CAST(max(event_id) AS BIGINT) AS max_id,
         |  true AS pre_scan_unpruned, true AS ranges_disjoint,
         |  true AS pruning_tighter, true AS rows_conserved
         |FROM events""".stripMargin) { (s, d) =>
      val dir = TmpDirs.scoped(s"graft_mlogclu_${QuerySpec.jvmScopedKey(d)}")
      val ready = new java.io.File(dir, "_READY")
      val store = new java.io.File(dir, "store").getAbsolutePath
      val path = new org.apache.hadoop.fs.Path(store)
      val fs = path.getFileSystem(s.sessionState.newHadoopConf())
      import graft.sources.v2.MLog
      val facts = if (!ready.exists()) {
        rmTree(dir); dir.mkdirs()
        // Hash-partitioned on id: each of the 12 files spans (almost)
        // the WHOLE k range — k pruning is defeated by construction.
        Tables.events(s, d).select(col("event_id").as("id"),
          col("user_id").as("k"),
          (unix_micros(col("ts")) % 86400000000L).as("v"))
          .repartition(12, col("id"))
          .write.format("mlog").mode("overwrite").save(store)
        val pre = MLog.readManifest(fs, path)
        val total = pre.map(_.rows).sum
        val khi = pre.map(_.maxK).max / 4
        def kScan() = s.read.format("mlog").load(store)
          .filter(col("k") <= khi)
        val preScan = kScan(); preScan.count()
        val preUnpruned = MLog.planned(preScan) == ((pre.size, pre.size))
        val stats = MLog.compact(s, path, targetRows = total / 4 + 1,
          clusterBy = Some("k"))
        val post = MLog.readManifest(fs, path)
        val ranges = post.map(e => (e.minK, e.maxK)).sortBy(_._1)
        // Disjoint slices; a run of EQUAL ks may touch at one boundary
        // value (ties straddle a range-partition bound), never overlap
        // beyond it.
        val disjoint = post.size == stats.after &&
          ranges.sliding(2).forall {
            case Seq(a, b) => a._2 <= b._1
            case _ => true
          }
        val postScan = kScan(); postScan.count()
        val (plannedN, totalN) = MLog.planned(postScan)
        val tighter = totalN == post.size && plannedN < totalN
        val conserved = post.map(_.rows).sum == total &&
          stats.merged == pre.size
        val f = Seq(preUnpruned, disjoint, tighter, conserved)
          .map(b => if (b) 1L else 0L)
        java.nio.file.Files.write(ready.toPath,
          f.mkString(" ").getBytes("UTF-8"))
        f
      } else new String(
        java.nio.file.Files.readAllBytes(ready.toPath), "UTF-8")
        .trim.split(" ").toSeq.map(_.toLong)
      s.read.format("mlog").load(store)
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sum_v"),
          min(col("id")).as("min_id"), max(col("id")).as("max_id"))
        .withColumn("pre_scan_unpruned", lit(facts(0) == 1L))
        .withColumn("ranges_disjoint", lit(facts(1) == 1L))
        .withColumn("pruning_tighter", lit(facts(2) == 1L))
        .withColumn("rows_conserved", lit(facts(3) == 1L))
    },

    // MERGE-ON-READ DELETE — the deletion-vector flavor
    // ([[graft.sources.v2.MLog.deleteMor]]), the contrast query to
    // dsv2_mlog_delete's copy-on-write route: the SAME predicate-delete
    // semantics (and the same oracle shape — DuckDB over raw events
    // minus the predicate), but ZERO data bytes rewritten. One task per
    // bounds-touched file records the matching physical row positions in
    // a .dvec sidecar the manifest points at; readers skip the positions
    // in lockstep with the physical row counter. Pinned:
    // zero_bytes_rewritten — the post-delete manifest names EXACTLY the
    // pre-delete data files with every byte size unchanged, and the
    // vectored-file count equals the manifest-derived touched count;
    // vectors_cover_removed — the published vectors mask exactly
    // removed_rows positions; pre_delete_visible — the pre-delete
    // snapshot still serves every masked row. The 100 TB contrast: a
    // delete matching few rows of many large files costs O(matched
    // positions) here vs O(touched-file bytes) for copy-on-write — the
    // write-amplification trade every production table format offers
    // both sides of. Facts persist in the _READY marker.
    checked("dsv2_mlog_delete_mor",
      s"""WITH b AS (SELECT CAST(floor(0.30 * max(user_id)) AS BIGINT) AS klo,
         |    CAST(floor(0.70 * max(user_id)) AS BIGINT) AS khi FROM events)
         |SELECT CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(epoch_us(ts) % 86400000000) AS BIGINT) AS sum_v,
         |  CAST(min(event_id) AS BIGINT) AS min_id,
         |  CAST(max(event_id) AS BIGINT) AS max_id,
         |  (SELECT CAST(count(*) AS BIGINT) FROM events, b
         |    WHERE user_id BETWEEN b.klo AND b.khi AND event_id % 4 = 0)
         |    AS removed_rows,
         |  true AS zero_bytes_rewritten, true AS vectors_cover_removed,
         |  true AS pre_delete_visible, true AS dv_materialized
         |FROM events, b
         |WHERE NOT (user_id BETWEEN b.klo AND b.khi AND event_id % 4 = 0)
         |""".stripMargin) { (s, d) =>
      val dir = TmpDirs.scoped(s"graft_mlogmor_${QuerySpec.jvmScopedKey(d)}")
      val ready = new java.io.File(dir, "_READY")
      val store = new java.io.File(dir, "store").getAbsolutePath
      val path = new org.apache.hadoop.fs.Path(store)
      val fs = path.getFileSystem(s.sessionState.newHadoopConf())
      import graft.sources.v2.MLog
      val facts = if (!ready.exists()) {
        rmTree(dir); dir.mkdirs()
        Tables.events(s, d).select(col("event_id").as("id"),
          col("user_id").as("k"),
          (unix_micros(col("ts")) % 86400000000L).as("v"))
          .repartitionByRange(7, col("k"))
          .write.format("mlog").mode("overwrite").save(store)
        val pre = MLog.readManifest(fs, path)
        val preVersion = MLog.versions(fs, path).last
        val total = pre.map(_.rows).sum
        val preSizes = pre.map(e =>
          e.name -> new java.io.File(store, e.name).length()).toMap
        val maxK = pre.map(_.maxK).max
        val (kLo, kHi) =
          (math.floor(0.30 * maxK).toLong, math.floor(0.70 * maxK).toLong)
        val touchedExp = pre.count(e => e.minK <= kHi && e.maxK >= kLo)
        val stats = MLog.deleteMor(s, path,
          e => e.minK <= kHi && e.maxK >= kLo,
          (id, k, _) => k >= kLo && k <= kHi && id % 4 == 0)
        val post = MLog.readManifest(fs, path)
        val zeroBytes =
          post.map(_.name).toSet == pre.map(_.name).toSet &&
          post.forall(e =>
            new java.io.File(store, e.name).length() == preSizes(e.name)) &&
          stats.vectored == touchedExp &&
          stats.newVersion == preVersion + 1
        val vectorsCover =
          post.flatMap(_.dv).map(_.rows).sum == stats.removedRows &&
          post.count(_.dv.isDefined) == touchedExp
        val preVisible = s.read.format("mlog")
          .option("versionAsOf", preVersion).load(store).count() == total
        // The third step of the merge-on-read lifecycle: MATERIALIZE the
        // vectors (CALL graft.system.rewrite_dvs — Delta's REORG PURGE):
        // every vectored file is rewritten without its masked rows in
        // one snapshot, no vector remains, untouched files are carried
        // by reference, and current readers see the identical rows (the
        // oracle equality below gates that — the final read happens
        // AFTER materialization).
        s.conf.set("spark.sql.catalog.graft",
          classOf[graft.sources.v2.GraftMLogCatalog].getName)
        val rw = s.sql(s"CALL graft.system.rewrite_dvs('$store')").head
        val postRw = MLog.readManifest(fs, path)
        val postSet = post.toSet
        val dvMaterialized =
          rw.getInt(0) == touchedExp &&
          rw.getLong(1) == stats.removedRows &&
          rw.getInt(2) == preVersion + 2 &&
          postRw.forall(_.dv.isEmpty) &&
          postRw.count(postSet.contains) == post.size - touchedExp &&
          postRw.map(_.logicalRows).sum == total - stats.removedRows
        val f = Seq(stats.removedRows,
          if (zeroBytes) 1L else 0L,
          if (vectorsCover) 1L else 0L,
          if (preVisible) 1L else 0L,
          if (dvMaterialized) 1L else 0L)
        java.nio.file.Files.write(ready.toPath,
          f.mkString(" ").getBytes("UTF-8"))
        f
      } else new String(
        java.nio.file.Files.readAllBytes(ready.toPath), "UTF-8")
        .trim.split(" ").toSeq.map(_.toLong)
      s.read.format("mlog").load(store)
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sum_v"),
          min(col("id")).as("min_id"), max(col("id")).as("max_id"))
        .withColumn("removed_rows", lit(facts(0)))
        .withColumn("zero_bytes_rewritten", lit(facts(1) == 1L))
        .withColumn("vectors_cover_removed", lit(facts(2) == 1L))
        .withColumn("pre_delete_visible", lit(facts(3) == 1L))
        .withColumn("dv_materialized", lit(facts(4) == 1L))
    },

    // The incremental CONSUMER of the diff scan — why changesSince
    // exists at 100 TB: an incremental dedup/clean pass reads ONLY the
    // DIFF between the snapshot it last processed and now, classifying
    // the increment's keys against the already-processed base (new vs
    // returning — the keyed anti-join every incremental corpus-clean
    // runs). The diff side is the appended files alone (diff_only_scan
    // pins the planned file set to the manifest name-diff via
    // MLog.planned); the base side reduces to DISTINCT keys map-side
    // before its one shuffle, so the join crosses distinct keys, not
    // rows. Oracle: DuckDB recomputes the classification from the raw
    // events under the same commit predicates.
    checked("dsv2_mlog_incremental",
      s"""WITH base AS (SELECT DISTINCT user_id AS k FROM events
         |  WHERE event_id % 5 <> 0),
         |diff AS (SELECT event_id, user_id AS k FROM events
         |  WHERE event_id % 5 = 0)
         |SELECT CAST(count(*) AS BIGINT) AS n_diff,
         |  CAST(count(DISTINCT k) AS BIGINT) AS n_diff_keys,
         |  (SELECT CAST(count(DISTINCT k) AS BIGINT) FROM diff
         |    WHERE k NOT IN (SELECT k FROM base)) AS n_new_keys,
         |  (SELECT CAST(count(DISTINCT k) AS BIGINT) FROM diff
         |    WHERE k IN (SELECT k FROM base)) AS n_returning_keys,
         |  true AS diff_only_scan
         |FROM diff""".stripMargin) { (s, d) =>
      val (store, entries) = mlogStore(s, d)
      val path = new org.apache.hadoop.fs.Path(store)
      val fs = path.getFileSystem(s.sessionState.newHadoopConf())
      import graft.sources.v2.MLog
      val base = MLog.versions(fs, path).head
      val baseNames = MLog.readManifestVersion(fs, path, base)
        .map(_.name).toSet
      val diffExp = entries.count(e => !baseNames(e.name))
      val diff = s.read.format("mlog").option("changesSince", base)
        .load(store).select(col("id"), col("k"))
      val nDiff = diff.count()
      val diffOnly = MLog.planned(diff) == ((diffExp, diffExp))
      val baseKeys = s.read.format("mlog").option("versionAsOf", base)
        .load(store).select(col("k")).distinct()
      val diffKeys = QuerySpec.staged(diff.select(col("k")).distinct())
      val newKeys = diffKeys.join(baseKeys, Seq("k"), "left_anti").count()
      val retKeys = diffKeys.join(baseKeys, Seq("k"), "left_semi").count()
      diff.agg(count(lit(1)).as("n_diff"),
          count_distinct(col("k")).as("n_diff_keys"))
        .withColumn("n_new_keys", lit(newKeys))
        .withColumn("n_returning_keys", lit(retKeys))
        .withColumn("diff_only_scan", lit(diffOnly && nDiff > 0L))
    },

    // MERGE INTO on the mlog store ([[graft.sources.v2.MLog.merge]]) —
    // the upsert the two lifecycle primitives compose into, in ONE
    // snapshot commit: base = 4/5 of the events ledger id-range-
    // partitioned; source = an id-bounded CDC batch (ids in the middle
    // 30-70% with id % 3 = 0, each carrying a bumped v). Matched ids
    // are REPLACED (their files rewritten without them, the source row
    // standing in), new ids (the id % 5 = 0 fifth, absent from base)
    // are INSERTED, and files outside the source's id bounds are
    // carried by reference — the file-pruned merge shape (Delta's
    // low-shuffle merge: bounded source broadcast, touched files only).
    // Oracle: DuckDB computes the same upsert relationally (base anti
    // source ∪ source), plus updated/inserted counts from the raw
    // tables — the engine's file-rewrite arithmetic must agree with
    // set algebra. single_commit pins exactly one new snapshot for the
    // whole merge; pruned_merge pins rewritten == the pre-merge
    // manifest's touched count with >= 1 file carried. Facts persist in
    // the _READY marker for memoized re-entries.
    checked("dsv2_mlog_merge",
      s"""WITH bb AS (SELECT CAST(floor(0.30 * max(event_id)) AS BIGINT) AS ilo,
         |    CAST(floor(0.70 * max(event_id)) AS BIGINT) AS ihi
         |  FROM events WHERE event_id % 5 <> 0),
         |base AS (SELECT event_id AS id, user_id AS k,
         |    epoch_us(ts) % 86400000000 AS v
         |  FROM events WHERE event_id % 5 <> 0),
         |src AS (SELECT event_id AS id, user_id AS k,
         |    epoch_us(ts) % 86400000000 + 1 AS v
         |  FROM events, bb
         |  WHERE event_id BETWEEN bb.ilo AND bb.ihi AND event_id % 3 = 0),
         |merged AS (SELECT * FROM base WHERE id NOT IN (SELECT id FROM src)
         |  UNION ALL SELECT * FROM src)
         |SELECT CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(v) AS BIGINT) AS sum_v,
         |  CAST(min(id) AS BIGINT) AS min_id,
         |  CAST(max(id) AS BIGINT) AS max_id,
         |  (SELECT CAST(count(*) AS BIGINT) FROM src
         |    WHERE id IN (SELECT id FROM base)) AS updated_rows,
         |  (SELECT CAST(count(*) AS BIGINT) FROM src
         |    WHERE id NOT IN (SELECT id FROM base)) AS inserted_rows,
         |  true AS single_commit, true AS pruned_merge
         |FROM merged""".stripMargin) { (s, d) =>
      val dir = TmpDirs.scoped(s"graft_mlogmrg_${QuerySpec.jvmScopedKey(d)}")
      val ready = new java.io.File(dir, "_READY")
      val store = new java.io.File(dir, "store").getAbsolutePath
      val path = new org.apache.hadoop.fs.Path(store)
      val fs = path.getFileSystem(s.sessionState.newHadoopConf())
      import graft.sources.v2.MLog
      val facts = if (!ready.exists()) {
        rmTree(dir); dir.mkdirs()
        val ledger = Tables.events(s, d).select(col("event_id").as("id"),
          col("user_id").as("k"),
          (unix_micros(col("ts")) % 86400000000L).as("v"))
        ledger.filter(col("id") % 5 =!= 0).repartitionByRange(7, col("id"))
          .write.format("mlog").mode("overwrite").save(store)
        val pre = MLog.readManifest(fs, path)
        val preVersion = MLog.versions(fs, path).last
        // Source bounds from the base manifest's own id-maximum (== raw
        // max(event_id) over the id % 5 <> 0 rows, the oracle's bb CTE).
        val maxId = pre.map(_.maxId).max
        val (iLo, iHi) =
          (math.floor(0.30 * maxId).toLong, math.floor(0.70 * maxId).toLong)
        val source = ledger
          .filter(col("id").between(iLo, iHi) && col("id") % 3 === 0)
          .withColumn("v", col("v") + 1L)
          .repartitionByRange(3, col("id"))
        val srcCount = source.count()
        val touchedExp = pre.count(e => e.minId <= iHi && e.maxId >= iLo)
        val stats = MLog.merge(s, path, source)
        val singleCommit =
          MLog.versions(fs, path) == (1 to preVersion + 1) &&
          stats.newVersion == preVersion + 1
        val prunedMerge = stats.rewritten == touchedExp &&
          stats.carried == pre.size - touchedExp && stats.carried >= 1
        val f = Seq(stats.updatedRows, srcCount - stats.updatedRows,
          if (singleCommit) 1L else 0L, if (prunedMerge) 1L else 0L)
        java.nio.file.Files.write(ready.toPath,
          f.mkString(" ").getBytes("UTF-8"))
        f
      } else new String(
        java.nio.file.Files.readAllBytes(ready.toPath), "UTF-8")
        .trim.split(" ").toSeq.map(_.toLong)
      s.read.format("mlog").load(store)
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sum_v"),
          min(col("id")).as("min_id"), max(col("id")).as("max_id"))
        .withColumn("updated_rows", lit(facts(0)))
        .withColumn("inserted_rows", lit(facts(1)))
        .withColumn("single_commit", lit(facts(2) == 1L))
        .withColumn("pruned_merge", lit(facts(3) == 1L))
    },

    // INCREMENTAL SCAN — the mlog row-lifecycle primitive, part 3
    // (`.option("changesSince", v)`): the reader plans ONLY the files
    // the end manifest names that snapshot v does not — the appended
    // data as a manifest DIFF, no per-row change log, no rescan of
    // history. Reuses the shared two-commit store (commit 1 = 4/5 of
    // the ledger, commit 2 = the id % 5 = 0 fifth appended), so the
    // diff since v1 must equal DuckDB over EXACTLY the appended rows.
    // diff_is_file_level pins that the planned diff is the manifest
    // name-set difference; base_plus_diff_is_total re-proves the
    // decomposition (versionAsOf v1) ∪ (changesSince v1) = current with
    // no overlap. This is the 100 TB shape of incremental pipelines —
    // a downstream dedup/clean pass reads the DIFF between the snapshot
    // it last processed and now, paying for new data only.
    checked("dsv2_mlog_changes",
      s"""SELECT CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(epoch_us(ts) % 86400000000) AS BIGINT) AS sum_v,
         |  CAST(min(event_id) AS BIGINT) AS min_id,
         |  CAST(max(event_id) AS BIGINT) AS max_id,
         |  true AS diff_is_file_level, true AS base_plus_diff_is_total
         |FROM events WHERE event_id % 5 = 0""".stripMargin) { (s, d) =>
      val (store, entries) = mlogStore(s, d)
      val path = new org.apache.hadoop.fs.Path(store)
      val fs = path.getFileSystem(s.sessionState.newHadoopConf())
      import graft.sources.v2.MLog
      val base = MLog.versions(fs, path).head
      val baseNames = MLog.readManifestVersion(fs, path, base)
        .map(_.name).toSet
      val diffExp = entries.count(e => !baseNames(e.name))
      val diff = s.read.format("mlog").option("changesSince", base)
        .load(store)
      val nDiff = diff.count()
      val fileLevelDiff = MLog.planned(diff) == ((diffExp, diffExp))
      val nBase = s.read.format("mlog").option("versionAsOf", base)
        .load(store).count()
      val nCur = s.read.format("mlog").load(store).count()
      diff.agg(count(lit(1)).as("n"), sum(col("v")).as("sum_v"),
          min(col("id")).as("min_id"), max(col("id")).as("max_id"))
        .withColumn("diff_is_file_level", lit(fileLevelDiff))
        .withColumn("base_plus_diff_is_total", lit(nBase + nDiff == nCur))
    })

  /** Write-once clustered layouts of the 5-column lineitem projection,
    * keyed (JVM, sf dir). Layout width follows the session (round-6
    * verdict #3): a literal 32 would under-parallelize a real cluster's
    * write. But it is ALSO a clustering granularity: each output file is
    * one parquet row group, and row-group min/max stats are what the
    * scan prunes on — on a 4-core Verify session, 4 files give each file
    * a bounding box of ~half of each dimension and pruning collapses.
    * So: parallelism for the write, floored at 32 files so the stats
    * stay discriminating at test scale (at 100 TB the file count is
    * data-size-driven and far above any floor). Range partitioning +
    * in-partition sort stays deterministic for any width. Shared by
    * zorder_scan (row-group pruning measurement) and
    * layout_manifest_prune (metadata-driven file planning). */
  private def ensureLayout(s: SparkSession, d: String, tag: String)(
      keyed: org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.DataFrame): String = {
    val dir = TmpDirs.scoped(s"graft_${tag}_${QuerySpec.jvmScopedKey(d)}")
    if (!new java.io.File(dir, "_SUCCESS").exists()) {
      keyed(Tables.lineitem(s, d).select(col("l_orderkey"), col("l_partkey"),
        col("l_suppkey"), col("l_quantity"), col("l_extendedprice")))
        .write.mode("overwrite").parquet(dir.getAbsolutePath)
    }
    dir.getAbsolutePath
  }

  private[queries] def zorderLayoutDir(s: SparkSession, d: String): String = {
    import graft.functions.ZOrder
    val width = math.max(32, s.sparkContext.defaultParallelism)
    ensureLayout(s, d, "zord")(df => df
      .withColumn("zkey", ZOrder.morton2(col("l_partkey"), col("l_suppkey")))
      .repartitionByRange(width, col("zkey"))
      .sortWithinPartitions("zkey"))
  }

  private def linearLayoutDir(s: SparkSession, d: String): String = {
    val width = math.max(32, s.sparkContext.defaultParallelism)
    ensureLayout(s, d, "zlin")(df => df
      .repartitionByRange(width, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey"))
  }

  /** Memoized zorder_scan measurement per (JVM, sf dir): the layouts are
    * write-once per that key, so (bounds, scan-row counts) are constants of
    * the key — re-probing per execution was 2 extra actions on the declared
    * query's hot path (round-6 verdict #2). */
  private val zorderMeasured =
    new java.util.concurrent.ConcurrentHashMap[
      String, (Long, Long, Long, Long, Long, Long)]
}
