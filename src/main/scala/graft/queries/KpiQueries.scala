package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.DetAgg
import graft.operators.FlowOps

/** The KPI query family — the events-table restatement of the reference's
  * windowed KPI pipeline (`KafkaKpiPipeline.scala`). Thresholds are rescaled
  * to the events domain: `value` spans ~0-1000 (vs packet bytes 0-65535) and
  * inter-event gaps are minutes (vs µs), so idle = 1 hour, small < 50,
  * large > 400.
  */
object KpiQueries {
  import DetAgg._
  import QuerySpec._

  val IdleThr = 3600.0
  val SmallLen = 50.0
  val LargeLen = 400.0

  /** KMV estimator algebra over two sketch ARRAY columns (shared by
    * sketch_kmv_overlap and sketch_kmv_retention): distinct estimate
    * (k−1)/θ with the exact-regime fallback, the intersection threshold
    * θ = min(θ_a, θ_b) in the long hash domain, and the intersection
    * sample size below it. */
  private object Kmv {
    import org.apache.spark.sql.Column
    val M: Double = graft.functions.expr.KmvSketch.HashSpace
    def kth(sk: Column, k: Int): Column = element_at(sk, k)
    def estD(sk: Column, k: Int): Column =
      when(size(sk) < k, size(sk).cast("double"))
        .otherwise(lit((k - 1).toDouble) * M / kth(sk, k).cast("double"))
    def kthOrMax(sk: Column, k: Int): Column =
      when(size(sk) < k, lit(Long.MaxValue)).otherwise(kth(sk, k))
    def thr(a: Column, b: Column, k: Int): Column =
      least(kthOrMax(a, k), kthOrMax(b, k))
    def nCommon(a: Column, b: Column, t: Column): Column =
      size(filter(array_intersect(a, b), x => x < t))
    def estInt(nc: Column, t: Column): Column =
      when(t === Long.MaxValue, nc.cast("double"))
        .otherwise(nc.cast("double") * M / t.cast("double"))
  }

  /** Shared DuckDB twin of the KMV overlap contract (sketch_kmv_overlap +
    * its parser-route restatement sql_kmv_overlap): exact snapshot
    * cardinalities, literal-true measured booleans (sketch_rollup
    * pattern). */
  val kmvOverlapOracleSql: String =
    """WITH m AS (SELECT max(doc_id) AS mx FROM documents),
      |t AS (SELECT text,
      |    max(CASE WHEN doc_id <= CAST(floor(0.7 * mx) AS BIGINT)
      |      THEN 1 ELSE 0 END) = 1 AS in_a,
      |    max(CASE WHEN doc_id >= CAST(floor(0.3 * mx) AS BIGINT)
      |      THEN 1 ELSE 0 END) = 1 AS in_b
      |  FROM documents, m GROUP BY text)
      |SELECT CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |  CAST(sum(CASE WHEN in_b THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
      |  CAST(sum(CASE WHEN in_a OR in_b THEN 1 ELSE 0 END) AS BIGINT) AS n_union,
      |  CAST(sum(CASE WHEN in_a AND in_b THEN 1 ELSE 0 END) AS BIGINT) AS n_intersect,
      |  true AS est_a_ok, true AS est_b_ok, true AS est_union_ok,
      |  true AS est_intersect_ok, true AS exact_regime_consistent
      |FROM t""".stripMargin

  val all: Seq[QuerySpec] = Seq(
    // Step-0 flagship: tumbling 1-hour volume KPIs per slice
    // (reference volume block, KafkaKpiPipeline.scala:108-111).
    checked("kpi_volume",
      s"""SELECT event_type AS slice, date_trunc('hour', ts) AS window_start,
         |  count(*) AS total_events,
         |  ${sqlSum("value")} AS total_value,
         |  ${sqlAvg("value")} AS avg_value,
         |  ${sqlR6(s"${sqlSumRaw("value")} * 8")} AS throughput_bits
         |FROM events
         |GROUP BY 1, 2""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("event_type").as("slice"),
          date_trunc("hour", col("ts")).as("window_start"))
        .agg(
          count(lit(1)).as("total_events"),
          dsum(col("value")).as("total_value"),
          davg(col("value")).as("avg_value"),
          r6(dsumRaw(col("value")) * 8).as("throughput_bits"))
    },

    // The full 38-KPI table (36 reference KPIs + 2 Q7 gap-closers) per
    // (slice, day) with per-flow lag-derived IAT.
    checked("kpi_full_day",
      FlowOps.kpiTableSql("day", IdleThr, SmallLen, LargeLen)) { (s, d) =>
      FlowOps.kpiTable(Tables.events(s, d), "day", IdleThr, SmallLen, LargeLen)
    },

    // The 100 TB variants of the exact-distinct / exact-percentile KPIs
    // (SURVEY §7 "hard parts"): HLL++ approx_count_distinct and
    // GK-sketch percentile_approx. Sketch merges are order-independent →
    // deterministic across partitionings — but the raw sketch values are
    // not reproducible in DuckDB (different sketch families), so the
    // oracle checks the PROPERTY instead: each engine asserts its own
    // sketch against its own exact aggregate within the documented error
    // bound (HLL rsd 0.05 → 10 % slack, rsd 0.005 → 2 %; GK accuracy 1000
    // → approx percentile must land between the exact 0.45/0.55 — resp.
    // 0.97/0.999 — quantiles). Input data is fixed per SF, so the
    // booleans are deterministic; the exact counts also hash-compare.
    checked("approx_sketches",
      s"""SELECT event_type AS slice,
         |  CAST(count(DISTINCT user_id) AS BIGINT) AS users_exact,
         |  abs(approx_count_distinct(user_id) - count(DISTINCT user_id))
         |    <= 0.10 * count(DISTINCT user_id) AS users_approx_ok,
         |  abs(approx_count_distinct(user_id) - count(DISTINCT user_id))
         |    <= 0.02 * count(DISTINCT user_id) AS users_tight_ok,
         |  approx_quantile(value, 0.5)
         |    BETWEEN quantile_cont(value, 0.45) AND quantile_cont(value, 0.55) AS p50_ok,
         |  approx_quantile(value, 0.99)
         |    BETWEEN quantile_cont(value, 0.97) AND quantile_cont(value, 0.999) AS p99_ok
         |FROM events GROUP BY 1""".stripMargin) { (s, d) =>
      val exact = count_distinct(col("user_id"))
      def within(approx: org.apache.spark.sql.Column, slack: Double) =
        abs(approx - exact) <= lit(slack) * exact
      Tables.events(s, d)
        .groupBy(col("event_type").as("slice"))
        .agg(
          exact.cast("long").as("users_exact"),
          within(approx_count_distinct(col("user_id")), 0.10).as("users_approx_ok"),
          // tighter sketch (rsd 0.005) against the tighter bound; DuckDB's
          // fixed-precision HLL is checked against the same 2 % bound
          within(approx_count_distinct(col("user_id"), 0.005), 0.02).as("users_tight_ok"),
          percentile_approx(col("value"), lit(0.5), lit(1000))
            .between(percentile(col("value"), lit(0.45)),
              percentile(col("value"), lit(0.55))).as("p50_ok"),
          percentile_approx(col("value"), lit(0.99), lit(1000))
            .between(percentile(col("value"), lit(0.97)),
              percentile(col("value"), lit(0.999))).as("p99_ok"))
    },

    // Mergeable-sketch rollup — THE 100 TB distinct-count pattern: daily
    // HLL sketches are persisted once (here: built per (slice, day)), and
    // any coarser rollup unions the small sketch blobs instead of
    // rescanning raw data. Two properties are gated: the rolled-up
    // estimate lands within the sketch's error bound of the exact count
    // (each engine asserts its own sketch machinery, as in
    // approx_sketches), and union-of-daily-sketches stays within 2 % of
    // the one-pass direct sketch — NOT exact equality: a sketch built from
    // many small daily parts promotes sparse→dense at different points
    // than the direct build, so register states legitimately differ
    // (measured ~0.4 % at sf0.1). DuckDB exposes no mergeable sketch
    // objects, so its twin asserts the expected literals for the Spark-
    // internal properties — if Spark's sketches ever drift out of bound,
    // the false ≠ true hash mismatch fails the gate.
    checked("sketch_rollup",
      s"""SELECT event_type AS slice,
         |  CAST(count(DISTINCT user_id) AS BIGINT) AS users_exact,
         |  abs(approx_count_distinct(user_id) - count(DISTINCT user_id))
         |    <= 0.10 * count(DISTINCT user_id) AS rollup_ok,
         |  true AS merge_close
         |FROM events GROUP BY 1""".stripMargin) { (s, d) =>
      val daily = Tables.events(s, d)
        .groupBy(col("event_type").as("slice"),
          date_trunc("day", col("ts")).as("day"))
        .agg(hll_sketch_agg(col("user_id")).as("sk"))
      val rolled = daily.groupBy("slice")
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_rollup"))
      val direct = Tables.events(s, d)
        .groupBy(col("event_type").as("slice"))
        .agg(count_distinct(col("user_id")).cast("long").as("users_exact"),
          hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est_direct"))
      direct.join(rolled, "slice")
        .select(col("slice"), col("users_exact"),
          (abs(col("est_rollup") - col("users_exact")) <=
            lit(0.10) * col("users_exact")).as("rollup_ok"),
          (abs(col("est_rollup") - col("est_direct")) <=
            lit(0.02) * col("users_exact")).as("merge_close"))
    },

    // PERSISTED sketch store — the incremental-profiling lifecycle that
    // closes sketch_rollup's loop: a 100 TB deployment never re-scans
    // history to refresh a profile; it WRITES each day's HLL registers
    // (one ~KB binary row per (slice, day)) and answers cardinality
    // questions by merging the stored rows — O(days) sketch reads, zero
    // corpus rescans (the corpus_clean_incremental keeper-store
    // pattern applied to profiling). This query builds that store once
    // per (JVM, sf), then pins the lifecycle with two contracts:
    // `store_eq_mem` — the estimate from PARQUET-ROUND-TRIPPED sketches
    // EXACTLY equals the estimate from the same daily sketches merged
    // in memory (HLL register merge is a per-register max — commutative
    // and order-free — so any serialization drift flips an exact
    // equality, not a tolerance); and `rollup_ok` — the merged estimate
    // lands within the 10 % HLL++ error envelope of the exact count
    // (the sketch_rollup contract). DuckDB exposes no mergeable sketch
    // objects, so its twin computes the exact side and asserts the
    // measured booleans as literal true — the sketch_rollup pattern.
    checked("dq_profile_sketch_store",
      s"""SELECT event_type AS slice,
         |  CAST(count(DISTINCT user_id) AS BIGINT) AS users_exact,
         |  CAST(count(DISTINCT date_trunc('day', ts)) AS BIGINT) AS n_days,
         |  true AS store_eq_mem, true AS rollup_ok
         |FROM events GROUP BY 1""".stripMargin) { (s, d) =>
      val dir = TmpDirs.scoped(s"graft_hllstore_${QuerySpec.jvmScopedKey(d)}")
      val ready = new java.io.File(dir, "_READY")
      val daily = Tables.events(s, d)
        .groupBy(col("event_type").as("slice"),
          date_trunc("day", col("ts")).as("day"))
        .agg(hll_sketch_agg(col("user_id")).as("sk"))
      if (!ready.exists()) {
        daily.write.mode("overwrite")
          .parquet(new java.io.File(dir, "sketches").getAbsolutePath)
        ready.createNewFile()
      }
      val store = s.read
        .parquet(new java.io.File(dir, "sketches").getAbsolutePath)
        .groupBy("slice")
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_store"),
          count(lit(1)).as("n_days"))
      val mem = daily.groupBy("slice")
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_mem"))
      val exact = Tables.events(s, d)
        .groupBy(col("event_type").as("slice"))
        .agg(count_distinct(col("user_id")).cast("long").as("users_exact"))
      exact.join(store, "slice").join(mem, "slice")
        .select(col("slice"), col("users_exact"), col("n_days"),
          (col("est_store") === col("est_mem")).as("store_eq_mem"),
          (abs(col("est_store") - col("users_exact")) <=
            lit(0.10) * col("users_exact")).as("rollup_ok"))
    },

    // Mergeable QUANTILE sketch — the 100 TB percentile path the suite
    // previously only documented as a divergence: exact percentile
    // (sort/exact-rank) doesn't scale past a single aggregate's memory,
    // while percentile_approx (GK-style summaries) merges map-side and
    // ships O(accuracy) state per group. The sketch's returned value is
    // merge-order-dependent, so the query doesn't compare it directly;
    // it asserts the sketch's RANK-ERROR contract, measured in exact
    // integer arithmetic: with accuracy = 1000 (relative rank error
    // 1/accuracy), the count of values ≤/< the approx quantile must
    // bracket the target rank within 1 % of n — ties only widen the
    // margin (they lower the strict count and raise the non-strict one).
    // Shape: two aggregates over one scan + a broadcast-sized join of
    // 5 sketch rows back onto the events; the exact quantile columns are
    // the oracle's job at test scale (at 100 TB you keep only the
    // sketch). DuckDB's twin computes the exact quantiles and asserts
    // the measured contract booleans as literal true — the
    // sketch_rollup pattern.
    checked("sketch_quantiles",
      s"""SELECT event_type AS slice, count(*) AS n,
         |  ${sqlR6("quantile_cont(value, 0.5)")} AS p50_exact,
         |  ${sqlR6("quantile_cont(value, 0.95)")} AS p95_exact,
         |  true AS p50_ok, true AS p95_ok
         |FROM events GROUP BY 1""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d).select(col("event_type"), col("value"))
      val sk = ev.groupBy("event_type")
        .agg(percentile_approx(col("value"),
          array(lit(0.5), lit(0.95)), lit(1000)).as("ap"))
      def rankOk(a: org.apache.spark.sql.Column, pctX100: Int) = {
        val le = sum(when(col("value") <= a, 1L).otherwise(0L))
        val lt = sum(when(col("value") < a, 1L).otherwise(0L))
        // (p − 1%)·n ≤ #{v ≤ a} and #{v < a} ≤ (p + 1%)·n, integer-exact.
        le * 100 >= lit(pctX100.toLong - 1) * count(lit(1)) &&
          lt * 100 <= lit(pctX100.toLong + 1) * count(lit(1))
      }
      ev.join(broadcast(sk), "event_type")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          dpercentile(col("value"), 0.5).as("p50_exact"),
          dpercentile(col("value"), 0.95).as("p95_exact"),
          rankOk(element_at(col("ap"), 1), 50).as("p50_ok"),
          rankOk(element_at(col("ap"), 2), 95).as("p95_ok"))
        .withColumnRenamed("event_type", "slice")
    },

    // Sliding windows (T3 declared addition): 2-hour windows every hour —
    // each event lands in 2 windows. Spark plans this as a generate+agg;
    // the DuckDB twin spells out the same 2-window expansion.
    checked("kpi_sliding",
      s"""SELECT slice, ws AS window_start, count(*) AS n_events,
         |  ${sqlSum("value")} AS total_value
         |FROM (SELECT event_type AS slice, value,
         |    unnest([date_trunc('hour', ts) - INTERVAL 1 HOUR, date_trunc('hour', ts)]) AS ws
         |  FROM events)
         |GROUP BY slice, ws""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("event_type").as("slice"), window(col("ts"), "2 hours", "1 hour"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
        .select(col("slice"), col("window.start").as("window_start"),
          col("n_events"), col("total_value"))
    },

    // Session windows (T3): 30-minute-gap sessions per slice. The DuckDB
    // twin is the classic gaps-and-islands rewrite; Spark's session_window
    // end = last event + gap, replicated below.
    checked("kpi_session",
      s"""WITH e AS (SELECT event_type AS slice, ts, value FROM events),
         |m AS (SELECT slice, ts, value,
         |  CASE WHEN lag(ts) OVER w IS NULL
         |         OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
         |  FROM e WINDOW w AS (PARTITION BY slice ORDER BY ts)),
         |g AS (SELECT *, sum(new_s) OVER (PARTITION BY slice ORDER BY ts
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM m)
         |SELECT slice, min(ts) AS session_start, max(ts) + INTERVAL 30 MINUTE AS session_end,
         |  count(*) AS n_events, ${sqlSum("value")} AS total_value
         |FROM g GROUP BY slice, sid""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("event_type").as("slice"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
        .select(col("slice"),
          col("session_window.start").as("session_start"),
          col("session_window.end").as("session_end"),
          col("n_events"), col("total_value"))
    },

    // DYNAMIC-GAP session windows — the session_window surface
    // kpi_session's fixed 30-minute gap can't reach: each event
    // proposes its own window [ts, ts+gap) (30 min for small values,
    // 60 min for the heavy tail — both branches live at every SF) and
    // sessions are the union of overlapping intervals. The oracle
    // spells exactly that union: islanding on ts ≥ running-max of all
    // previous interval ENDS (a plain lag is wrong — an earlier event's
    // longer gap can bridge past a shorter successor's), session end =
    // max event end. Same one-shuffle shape as kpi_session.
    checked("kpi_session_dynamic",
      s"""WITH e AS (SELECT event_type AS slice, ts, event_id, value,
         |    CASE WHEN value < 100 THEN 1800000000 ELSE 3600000000 END
         |      AS gap_us FROM events),
         |m AS (SELECT slice, ts, event_id, value, gap_us,
         |    max(epoch_us(ts) + gap_us) OVER (PARTITION BY slice
         |      ORDER BY ts, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pend
         |  FROM e),
         |g AS (SELECT *, CASE WHEN pend IS NULL OR epoch_us(ts) >= pend
         |    THEN 1 ELSE 0 END AS new_s FROM m),
         |i AS (SELECT *, sum(new_s) OVER (PARTITION BY slice
         |    ORDER BY ts, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
         |  FROM g)
         |SELECT slice, min(ts) AS session_start,
         |  make_timestamp(max(epoch_us(ts) + gap_us)) AS session_end,
         |  count(*) AS n_events, ${sqlSum("value")} AS total_value
         |FROM i GROUP BY slice, sid""".stripMargin) { (s, d) =>
      // session_window's dynamic gap must be CalendarIntervalType —
      // ANSI INTERVAL literals are DayTimeIntervalType and are rejected.
      val gap = when(col("value") < 100, expr("make_interval(0,0,0,0,0,30,0)"))
        .otherwise(expr("make_interval(0,0,0,0,0,60,0)"))
      Tables.events(s, d)
        .groupBy(col("event_type").as("slice"), session_window(col("ts"), gap))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
        .select(col("slice"),
          col("session_window.start").as("session_start"),
          col("session_window.end").as("session_end"),
          col("n_events"), col("total_value"))
    },

    // Count-min sketch — the 100 TB per-key frequency path that
    // complements sketch_rollup's HLL (distinct) and sketch_quantiles'
    // GK (rank): CMS counters are mergeable by plain element-wise
    // addition, so a union of per-day sketches equals the one-pass
    // direct sketch EXACTLY (same seed → same hash grid → identical
    // counter arrays) — asserted as merge_exact, a property neither HLL
    // nor GK gives. The other two gates are the CMS contract measured
    // in exact integer arithmetic: est ≥ exact always (counters only
    // over-count), and est ≤ exact + ⌈eps·N⌉ (deterministic here for
    // fixed seed + fixed input). Shape: two sketch aggregates over one
    // scan (per-day partials merge map-side) plus one exact per-key
    // count; only O(days) sketch blobs and O(keys) counts reach the
    // driver — bounded state, the IVF-quantizer precedent. DuckDB has
    // no CMS, so its twin computes the exact counts and asserts the
    // measured contract booleans as literal true (sketch_rollup
    // pattern).
    checked("sketch_cms",
      """SELECT event_type AS slice, CAST(count(*) AS BIGINT) AS n_exact,
        |  true AS cms_ge_exact, true AS cms_within_eps, true AS merge_exact
        |FROM events GROUP BY 1""".stripMargin) { (s, d) =>
      val CmsEps = 0.001
      val ev = Tables.events(s, d).select(col("event_type"), col("ts"))
      def cms(c: org.apache.spark.sql.Column) =
        count_min_sketch(c, lit(CmsEps), lit(0.99), lit(42))
      val direct = ev.agg(cms(col("event_type")).as("sk"),
        count(lit(1)).as("n")).head()
      val total = direct.getLong(1)
      val directSk = org.apache.spark.util.sketch.CountMinSketch
        .readFrom(direct.getAs[Array[Byte]](0))
      // Daily partial sketches (bounded: one blob per day) merged on
      // the driver — at 100 TB these are the persisted nightly blobs.
      val daily = ev.groupBy(date_trunc("day", col("ts")))
        .agg(cms(col("event_type")).as("sk"))
        .collect().map(r => org.apache.spark.util.sketch.CountMinSketch
          .readFrom(r.getAs[Array[Byte]]("sk")))
      val mergedSk = daily.reduce((a, b) => a.mergeInPlace(b))
      val exact = ev.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
      val slack = math.ceil(CmsEps * total).toLong
      import s.implicits._
      exact.toSeq.map { case (k, n) =>
        val est = directSk.estimateCount(k)
        (k, n, est >= n, est <= n + slack, est == mergedSk.estimateCount(k))
      }.toDF("slice", "n_exact", "cms_ge_exact", "cms_within_eps",
        "merge_exact")
    },

    // Integer-exact exponential smoothing (EWMA, α = 1/2) per user —
    // the recurrence e_t = (e_{t−1} + v_t) div 2 on the 1e3-scaled
    // value grid, a genuinely ORDER-DEPENDENT sequential fold that no
    // plain aggregate expresses: Spark runs it as one shuffle to the
    // user key, an in-group sort (sort_array over (ts, event_id)-keyed
    // structs — event_id makes the order total), and a codegen'd
    // aggregate() HOF fold (shiftright = div 2 on the nonnegative
    // grid); per-group state is one user's history (bounded ≤ ~hundreds
    // of events per user at every SF — the ml_seq_windows per-key
    // contract; an unbounded key would stream through
    // flatMapGroups instead). DuckDB has no fold HOF, so the twin runs
    // the IDENTICAL recurrence as a recursive CTE stepping rn → rn+1.
    checked("ts_ewma",
      """WITH RECURSIVE ord AS (
        |  SELECT user_id, CAST(floor(value * 1000) AS BIGINT) AS v,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events),
        |r AS (
        |  SELECT user_id, rn, v AS e FROM ord WHERE rn = 1
        |  UNION ALL
        |  SELECT o.user_id, o.rn, (r.e + o.v) // 2
        |  FROM r JOIN ord o ON o.user_id = r.user_id AND o.rn = r.rn + 1)
        |SELECT user_id, CAST(max(rn) AS BIGINT) AS n_events,
        |  arg_max(e, rn) AS ewma_final
        |FROM r GROUP BY user_id""".stripMargin) { (s, d) =>
      val seq = Tables.events(s, d)
        .select(col("user_id"),
          struct(col("ts"), col("event_id"),
            floor(col("value") * 1000).cast("long").as("v")).as("x"))
        .groupBy("user_id")
        .agg(sort_array(collect_list(col("x"))).as("seq"),
          count(lit(1)).as("n_events"))
      seq.select(col("user_id"), col("n_events"),
        aggregate(
          slice(col("seq"), lit(2), greatest(size(col("seq")) - 1, lit(0))),
          element_at(col("seq"), 1).getField("v"),
          (acc, x) => shiftright(acc + x.getField("v"), 1)).as("ewma_final"))
    },

    // Trailing-window z-score anomaly flags — the monitoring pass a KPI
    // pipeline hangs alerts on, stated entirely in integer arithmetic so
    // the flag is bit-deterministic: over each slice's (ts, event_id)-
    // ordered stream, a 10-row trailing frame carries S = Σv and
    // Q = Σv² on the 1e3-scaled grid, and |v − μ| > 3σ is cleared of
    // divisions as (v·n − S)² > 9·(n·Q − S²) (all terms ≤ ~1e14 — long-
    // safe; a constant window makes both sides 0 → no flag, no ÷0 to
    // guard). One window pass + one aggregate, partitioned by slice —
    // embarrassingly scalable; n ≥ 5 warms up the frame.
    checked("anomaly_zscore",
      """WITH sv AS (SELECT event_type AS slice, event_id,
        |    CAST(floor(value * 1000) AS BIGINT) AS v, ts FROM events),
        |w AS (SELECT slice, event_id, v,
        |    sum(v) OVER tw AS sw, sum(v * v) OVER tw AS q,
        |    count(*) OVER tw AS n
        |  FROM sv WINDOW tw AS (PARTITION BY slice ORDER BY ts, event_id
        |    ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)),
        |f AS (SELECT slice, event_id,
        |    n >= 5 AND (v * n - sw) * (v * n - sw) > 9 * (n * q - sw * sw)
        |      AS is_anom
        |  FROM w)
        |SELECT slice, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(count(*) FILTER (WHERE is_anom) AS BIGINT) AS n_anomalies,
        |  CAST(COALESCE(sum(event_id) FILTER (WHERE is_anom), 0) AS BIGINT)
        |    AS anomaly_id_sum
        |FROM f GROUP BY slice""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val tw = Window.partitionBy("slice").orderBy("ts", "event_id")
        .rowsBetween(-9, 0)
      val w = Tables.events(s, d)
        .select(col("event_type").as("slice"), col("event_id"), col("ts"),
          floor(col("value") * 1000).cast("long").as("v"))
        .withColumn("sw", sum(col("v")).over(tw))
        .withColumn("q", sum(col("v") * col("v")).over(tw))
        .withColumn("n", count(lit(1)).over(tw))
      val isAnom = col("n") >= 5 &&
        (col("v") * col("n") - col("sw")) * (col("v") * col("n") - col("sw")) >
          lit(9) * (col("n") * col("q") - col("sw") * col("sw"))
      w.groupBy("slice").agg(
        count(lit(1)).as("n_events"),
        sum(when(isAnom, 1L).otherwise(0L)).as("n_anomalies"),
        sum(when(isAnom, col("event_id")).otherwise(0L)).as("anomaly_id_sum"))
    },

    // Time-series resample + gap-fill — the regime window_fill (ffill over
    // EXISTING rows) doesn't touch: the missing rows themselves are
    // GENERATED. Each slice's event stream is bucketed to a 15-minute
    // grid (gaps exist at every shipped SF: 1 400+/slice at sf0.01,
    // single digits at sf0.1), the full dense grid is produced per key
    // with sequence()+explode (generate_series in the twin — both
    // inclusive), actuals land on it via a left equi join, and empty
    // buckets carry the last observed bucket total forward (ffill) with
    // an is_gap marker. All integer: bucket ids are µs-epoch divs,
    // totals live on the 1e3 value grid. Scale shape: grid size is
    // span/900 s rows per key — generation is a per-key projection, the
    // join is equi on (slice, bucket), and the ffill window partitions
    // by slice; keys are the parallel unit (one multi-year series is
    // ~100k rows — trivial); a SINGLE series too long for one partition
    // would range-partition by time and carry one boundary value per
    // split, the flow_iat repartition-ffill pattern. The bucket
    // aggregate is staged: both the span computation and the join probe
    // consume it.
    checked("ts_gapfill",
      """WITH b AS (SELECT event_type AS slice,
        |    epoch_us(ts) // 900000000 AS bkt, count(*) AS n,
        |    sum(CAST(floor(value * 1000) AS BIGINT)) AS v
        |  FROM events GROUP BY 1, 2),
        |sp AS (SELECT slice, min(bkt) AS mn, max(bkt) AS mx
        |  FROM b GROUP BY slice),
        |grid AS (SELECT slice, unnest(generate_series(mn, mx)) AS bkt FROM sp),
        |j AS (SELECT g.slice, g.bkt, b.n, b.v
        |  FROM grid g LEFT JOIN b ON g.slice = b.slice AND g.bkt = b.bkt)
        |SELECT slice, bkt, CAST(COALESCE(n, 0) AS BIGINT) AS n_events,
        |  CAST(COALESCE(last_value(v IGNORE NULLS) OVER (
        |    PARTITION BY slice ORDER BY bkt
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS BIGINT)
        |    AS v_fill,
        |  n IS NULL AS is_gap
        |FROM j""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val b = staged(Tables.events(s, d)
        .groupBy(col("event_type").as("slice"),
          expr("unix_micros(ts) DIV 900000000").as("bkt"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("value") * 1000).cast("long")).as("v")))
      val grid = b.groupBy("slice")
        .agg(min(col("bkt")).as("mn"), max(col("bkt")).as("mx"))
        .select(col("slice"), explode(sequence(col("mn"), col("mx"))).as("bkt"))
      val w = Window.partitionBy("slice").orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(b, Seq("slice", "bkt"), "left")
        .select(col("slice"), col("bkt"),
          coalesce(col("n"), lit(0L)).as("n_events"),
          coalesce(last(col("v"), ignoreNulls = true).over(w), lit(0L))
            .as("v_fill"),
          col("n").isNull.as("is_gap"))
    },

    // Cross-correlation between the click and purchase series — "which
    // KPI leads which": both series land on the shared dense 15-minute
    // grid (zeros for empty buckets — absence is signal in a CCF), a
    // 3-row lag table joins each x-bucket to its lag-shifted y-bucket,
    // and each lag's Pearson r uses the ts_acf integer-moment identity
    // over exact DECIMAL(38)/HUGEINT products with one string-hop IEEE
    // division. The grid is span/900 s rows (bounded by time, not
    // corpus), so the pair join and moments are trivial at any scale.
    checked("ts_cross_corr", {
      val corr = "CAST(CAST((cnt * sxy - sx * sy) AS VARCHAR) AS DOUBLE) / " +
        "(sqrt(CAST(CAST((cnt * sxx - sx * sx) AS VARCHAR) AS DOUBLE)) * " +
        "sqrt(CAST(CAST((cnt * syy - sy * sy) AS VARCHAR) AS DOUBLE)))"
      s"""WITH e AS (SELECT epoch_us(ts) // 900000000 AS bkt,
         |    CAST(sum(CASE WHEN event_type = 'click'
         |      THEN CAST(floor(value * 1000) AS BIGINT) ELSE 0 END)
         |      AS BIGINT) AS x,
         |    CAST(sum(CASE WHEN event_type = 'purchase'
         |      THEN CAST(floor(value * 1000) AS BIGINT) ELSE 0 END)
         |      AS BIGINT) AS y
         |  FROM events GROUP BY 1),
         |sp AS (SELECT min(bkt) AS mn, max(bkt) AS mx FROM e),
         |grid AS (SELECT unnest(generate_series(mn, mx)) AS bkt FROM sp),
         |g AS (SELECT grid.bkt, COALESCE(e.x, 0) AS x, COALESCE(e.y, 0) AS y
         |  FROM grid LEFT JOIN e ON grid.bkt = e.bkt),
         |lags AS (SELECT unnest([-1, 0, 1]) AS lg),
         |pr AS (SELECT lg, a.x, b.y FROM g a CROSS JOIN lags
         |  JOIN g b ON b.bkt = a.bkt + lg),
         |m AS (SELECT lg, CAST(count(*) AS HUGEINT) AS cnt,
         |    CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
         |    CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
         |    CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
         |    CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
         |    CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
         |  FROM pr GROUP BY lg)
         |SELECT CAST(lg AS INT) AS lag, CAST(cnt AS BIGINT) AS n_pairs,
         |  ${graft.functions.DetAgg.sqlR6(corr)} AS ccf
         |FROM m""".stripMargin
    }) { (s, d) =>
      import org.apache.spark.sql.types.DecimalType
      def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(38, 0))
      val e = Tables.events(s, d)
        .groupBy(expr("unix_micros(ts) DIV 900000000").as("bkt"))
        .agg(sum(when(col("event_type") === "click",
          floor(col("value") * 1000).cast("long")).otherwise(0L)).as("x"),
          sum(when(col("event_type") === "purchase",
            floor(col("value") * 1000).cast("long")).otherwise(0L)).as("y"))
      val grid = e.agg(min(col("bkt")).as("mn"), max(col("bkt")).as("mx"))
        .select(explode(sequence(col("mn"), col("mx"))).as("bkt"))
      val g = staged(grid.join(e, Seq("bkt"), "left")
        .select(col("bkt"), coalesce(col("x"), lit(0L)).as("x"),
          coalesce(col("y"), lit(0L)).as("y")))
      val lags = { import s.implicits._; Seq(-1, 0, 1).toDF("lg") }
      val pr = g.as("a").crossJoin(broadcast(lags))
        .join(g.select(col("bkt").as("bb"), col("y").as("yy")),
          col("bb") === col("a.bkt") + col("lg"))
      val m = pr.groupBy("lg").agg(count(lit(1)).as("cnt"),
        sum(dec(col("a.x"))).as("sx"), sum(dec(col("yy"))).as("sy"),
        sum(dec(col("a.x")) * dec(col("a.x"))).as("sxx"),
        sum(dec(col("yy")) * dec(col("yy"))).as("syy"),
        sum(dec(col("a.x")) * dec(col("yy"))).as("sxy"))
      def sd(c: org.apache.spark.sql.Column) = c.cast("string").cast("double")
      m.select(col("lg").cast("int").as("lag"),
        col("cnt").cast("long").as("n_pairs"),
        graft.functions.DetAgg.r6(
          sd(dec(col("cnt")) * col("sxy") - col("sx") * col("sy")) /
            (sqrt(sd(dec(col("cnt")) * col("sxx") - col("sx") * col("sx"))) *
              sqrt(sd(dec(col("cnt")) * col("syy") - col("sy") * col("sy")))))
          .as("ccf"))
    },

    // DFT power at harmonics 1-3 per slice — the frequency-domain
    // diagnostic beside ts_acf's lag domain (is the KPI periodic, and
    // at which harmonic of its span): Σ v·cos(2πk(t−1)/n) and the sin
    // twin, with EVERY term quantized to the integer grid before the
    // sum — the cos/sin calls are the only libm in the tree and their
    // 1-ulp cross-engine divergence lands ~1e-10 of a grid step after
    // the v scaling (the text_lm_score argument, with ~15 orders of
    // margin), so the accumulated coefficients are exact BIGINTs in any
    // partition order. One (slice, time) window pass for ranks, one
    // aggregate; six trig calls per row, all inside whole-stage codegen.
    checked("ts_dft", {
      val twoPi = "6.283185307179586"
      def termSql(k: Int, f: String) =
        s"CAST(sum(CAST(floor(v * $f($twoPi * $k * (rn - 1) / n) + 0.5) " +
          s"AS BIGINT)) AS BIGINT)"
      def rowSql(k: Int) =
        s"""SELECT slice, $k AS harmonic, ${termSql(k, "cos")} AS c_sum,
           |  ${termSql(k, "sin")} AS s_sum,
           |  CAST(max(n) AS BIGINT) AS n_events
           |FROM w GROUP BY slice""".stripMargin
      s"""WITH sv AS (SELECT event_type AS slice, ts, event_id,
         |    CAST(floor(value * 1000) AS BIGINT) AS v FROM events),
         |w AS (SELECT slice, v,
         |    row_number() OVER (PARTITION BY slice ORDER BY ts, event_id)
         |      AS rn,
         |    count(*) OVER (PARTITION BY slice) AS n FROM sv)
         |${rowSql(1)} UNION ALL ${rowSql(2)} UNION ALL ${rowSql(3)}"""
        .stripMargin
    }) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val TwoPi = 6.283185307179586
      val ws = Window.partitionBy("slice").orderBy("ts", "event_id")
      val w = staged(Tables.events(s, d)
        .select(col("event_type").as("slice"), col("ts"), col("event_id"),
          floor(col("value") * 1000).cast("long").as("v"))
        .select(col("slice"), col("v"), row_number().over(ws).as("rn"),
          count(lit(1)).over(Window.partitionBy("slice")).as("n")))
      def term(k: Int, f: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
        sum(floor(col("v") * f(lit(TwoPi) * lit(k) * (col("rn") - 1) /
          col("n")) + 0.5).cast("long"))
      def rowK(k: Int) =
        w.groupBy("slice").agg(term(k, cos).as("c_sum"),
          term(k, sin).as("s_sum"), max(col("n")).cast("long").as("n_events"))
          .select(col("slice"), lit(k).as("harmonic"), col("c_sum"),
            col("s_sum"), col("n_events"))
      rowK(1).unionAll(rowK(2)).unionAll(rowK(3))
    },

    // CUSUM changepoint detection per slice — the "when did this KPI
    // shift" pass next to anomaly_zscore's "which rows are outliers":
    // the classic statistic argmax_t |Σ_{i≤t}(vᵢ − μ)| is cleared of
    // the rational mean by scaling through n: C·n = n·P_t − t·S over
    // exact BIGINTs (P_t prefix sums from ONE ordered window in the
    // slice partitioning; peak |C·n| ~ 5e15 ≪ 2^63 at sf0.1 — the
    // 2^63 headroom holds to ~10^9 rows/slice on this grid). The
    // argmax tie-breaks to the EARLIEST position via one rank window
    // over the same partitioning; the reported deviation |C| = |C·n|/n
    // is the single shared IEEE division.
    checked("ts_changepoint",
      """WITH sv AS (SELECT event_type AS slice, ts, event_id,
        |    CAST(floor(value * 1000) AS BIGINT) AS v FROM events),
        |p AS (SELECT slice,
        |    row_number() OVER w AS t,
        |    sum(v) OVER (PARTITION BY slice ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
        |    count(*) OVER (PARTITION BY slice) AS n,
        |    sum(v) OVER (PARTITION BY slice) AS s
        |  FROM sv WINDOW w AS (PARTITION BY slice ORDER BY ts, event_id)),
        |c AS (SELECT slice, t, n, abs(n * pt - t * s) AS cn,
        |    row_number() OVER (PARTITION BY slice
        |      ORDER BY abs(n * pt - t * s) DESC, t) AS rk
        |  FROM p)
        |SELECT slice, CAST(n AS BIGINT) AS n_events,
        |  CAST(t AS BIGINT) AS cp_pos, CAST(cn AS BIGINT) AS cp_num,
        |  CAST(floor(CAST(cn AS DOUBLE) / n * 1e6 + 0.5) / 1e6 AS DOUBLE)
        |    AS cp_dev
        |FROM c WHERE rk = 1""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val ws = Window.partitionBy("slice").orderBy("ts", "event_id")
      val whole = Window.partitionBy("slice")
      val p = Tables.events(s, d)
        .select(col("event_type").as("slice"), col("ts"), col("event_id"),
          floor(col("value") * 1000).cast("long").as("v"))
        .select(col("slice"), row_number().over(ws).as("t"),
          sum(col("v")).over(ws.rowsBetween(Window.unboundedPreceding,
            Window.currentRow)).as("pt"),
          count(lit(1)).over(whole).as("n"), sum(col("v")).over(whole).as("s"))
      val cn = abs(col("n") * col("pt") - col("t") * col("s"))
      p.select(col("slice"), col("t"), col("n"), cn.as("cn"))
        .withColumn("rk", row_number().over(
          Window.partitionBy("slice").orderBy(col("cn").desc, col("t"))))
        .filter(col("rk") === 1)
        .select(col("slice"), col("n").cast("long").as("n_events"),
          col("t").cast("long").as("cp_pos"), col("cn").as("cp_num"),
          (floor(col("cn").cast("double") / col("n") * 1e6 + 0.5) / 1e6)
            .as("cp_dev"))
    },

    // Autocorrelation function (lags 1-3) per slice — the diagnostic a
    // forecasting pipeline runs before choosing model order (the VAR/
    // GRU trainers' lag hyperparameters come from exactly this plot).
    // One lead() window pass produces the three lagged columns in the
    // same (slice, time) partitioning, one aggregate collects every
    // moment, and each r_k is the mean-centered estimator cleared of
    // rationals by multiplying through by n²:
    //   r_k = (n²·L_k − n·S·(Sh_k+St_k) + c_k·S²) / (n²·Q − n·S²)
    // with every term an exact DECIMAL(38)/HUGEINT product (peak ~5e24
    // at sf0.1; the 38-digit headroom holds to ~2³¹ rows per slice —
    // beyond that, center on a pre-pass mean on a coarser grid). The
    // single IEEE division rides the string-hop double conversion.
    checked("ts_acf", {
      def aggK(k: Int) =
        s"""CAST(count(v$k) AS HUGEINT) AS c$k,
           |    CAST(sum(CAST(v AS HUGEINT) * v$k) AS HUGEINT) AS l$k,
           |    CAST(sum(CASE WHEN v$k IS NOT NULL THEN v END) AS HUGEINT)
           |      AS sh$k,
           |    CAST(sum(v$k) AS HUGEINT) AS st$k""".stripMargin
      def rowK(k: Int) = {
        val num = s"(n * n * l$k - n * s * (sh$k + st$k) + c$k * s * s)"
        val den = "(n * n * q - n * s * s)"
        s"""SELECT slice, $k AS lag, CAST(c$k AS BIGINT) AS n_pairs,
           |  ${graft.functions.DetAgg.sqlR6(
              s"CAST(CAST($num AS VARCHAR) AS DOUBLE) / " +
                s"CAST(CAST($den AS VARCHAR) AS DOUBLE)")} AS acf
           |FROM a""".stripMargin
      }
      s"""WITH sv AS (SELECT event_type AS slice, ts, event_id,
         |    CAST(floor(value * 1000) AS BIGINT) AS v FROM events),
         |l AS (SELECT slice, v, lead(v, 1) OVER w AS v1,
         |    lead(v, 2) OVER w AS v2, lead(v, 3) OVER w AS v3
         |  FROM sv WINDOW w AS (PARTITION BY slice ORDER BY ts, event_id)),
         |a AS (SELECT slice, CAST(count(*) AS HUGEINT) AS n,
         |    CAST(sum(v) AS HUGEINT) AS s,
         |    CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT) AS q,
         |    ${aggK(1)},
         |    ${aggK(2)},
         |    ${aggK(3)}
         |  FROM l GROUP BY slice)
         |${rowK(1)} UNION ALL ${rowK(2)} UNION ALL ${rowK(3)}""".stripMargin
    }) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.types.DecimalType
      def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(38, 0))
      val w = Window.partitionBy("slice").orderBy("ts", "event_id")
      val l = Tables.events(s, d)
        .select(col("event_type").as("slice"), col("ts"), col("event_id"),
          floor(col("value") * 1000).cast("long").as("v"))
        .withColumn("v1", lead(col("v"), 1).over(w))
        .withColumn("v2", lead(col("v"), 2).over(w))
        .withColumn("v3", lead(col("v"), 3).over(w))
      val aggs = Seq(count(lit(1)).cast("long").as("n"),
        sum(col("v")).as("s"), sum(dec(col("v")) * dec(col("v"))).as("q")) ++
        (1 to 3).flatMap { k =>
          Seq(count(col(s"v$k")).as(s"c$k"),
            sum(dec(col("v")) * dec(col(s"v$k"))).as(s"l$k"),
            sum(when(col(s"v$k").isNotNull, col("v"))).as(s"sh$k"),
            sum(col(s"v$k")).as(s"st$k"))
        }
      val a = staged(l.groupBy("slice").agg(aggs.head, aggs.tail: _*))
      def rowK(k: Int) = {
        val num = dec(col("n")) * dec(col("n")) * col(s"l$k") -
          dec(col("n")) * dec(col("s")) *
            (dec(col(s"sh$k")) + dec(col(s"st$k"))) +
          dec(col(s"c$k")) * dec(col("s")) * dec(col("s"))
        val den = dec(col("n")) * dec(col("n")) * col("q") -
          dec(col("n")) * dec(col("s")) * dec(col("s"))
        a.select(col("slice"), lit(k).as("lag"),
          col(s"c$k").cast("long").as("n_pairs"),
          graft.functions.DetAgg.r6(num.cast("string").cast("double") /
            den.cast("string").cast("double")).as("acf"))
      }
      rowK(1).unionAll(rowK(2)).unionAll(rowK(3))
    },

    // Seasonal decomposition (hour-of-day profile) — the classical-
    // decomposition half of the ts family: each slice's 24-hour seasonal
    // profile is the truncated integer mean of its hourly millivalues,
    // and the residual sum-of-squares per (slice, hour) measures what
    // the profile fails to explain. Shape: one map-side-combined profile
    // aggregate (120 cells), profile broadcast back onto a second
    // corpus pass (no shuffle — the scan-side join every fit-then-
    // transform pass uses), one final cell aggregate. All BIGINT:
    // the squared residual sum peaks ~3e16 ≪ 2^63 at any shipped SF.
    checked("ts_seasonal",
      """WITH sv AS (SELECT event_type AS slice, CAST(hour(ts) AS INT) AS h,
        |    CAST(floor(value * 1000) AS BIGINT) AS v FROM events),
        |prof AS (SELECT slice, h, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(v) AS BIGINT) // count(*) AS m
        |  FROM sv GROUP BY 1, 2)
        |SELECT sv.slice, sv.h, CAST(max(n) AS BIGINT) AS n_events,
        |  CAST(max(m) AS BIGINT) AS seasonal_mv,
        |  CAST(sum((v - m) * (v - m)) AS BIGINT) AS resid_ss
        |FROM sv JOIN prof ON sv.slice = prof.slice AND sv.h = prof.h
        |GROUP BY 1, 2""".stripMargin) { (s, d) =>
      val sv = staged(Tables.events(s, d)
        .select(col("event_type").as("slice"), hour(col("ts")).as("h"),
          floor(col("value") * 1000).cast("long").as("v")))
      val prof = sv.groupBy("slice", "h")
        .agg(count(lit(1)).as("n"),
          expr("sum(v) DIV count(*)").as("m"))
      sv.join(broadcast(prof), Seq("slice", "h"))
        .groupBy("slice", "h")
        .agg(max(col("n")).as("n_events"), max(col("m")).as("seasonal_mv"),
          sum((col("v") - col("m")) * (col("v") - col("m"))).as("resid_ss"))
    },

    // Holt double-exponential smoothing (α = β = 1/2) per user — the
    // trend-aware sibling of ts_ewma, and the regime its scalar fold
    // can't express: the recurrence carries TWO coupled state variables
    // (level lₜ = (vₜ + lₜ₋₁ + bₜ₋₁) div 2, trend
    // bₜ = (lₜ − lₜ₋₁ + bₜ₋₁) div 2), so the aggregate() HOF folds a
    // STRUCT accumulator. The trend can go negative, so the halving is
    // spelled truncate-toward-zero on both engines (Spark: exact
    // double-divide-by-2 then long cast — |state| ≤ ~5.6e5 ≪ 2^53;
    // DuckDB: integer `//`): shiftright's floor semantics would diverge
    // on odd negative trends. Same single-shuffle/bounded-group contract
    // as ts_ewma; DuckDB steps the identical recurrence as a recursive
    // CTE. Forecast is the 1-step-ahead l + b, exact.
    checked("ts_holt",
      """WITH RECURSIVE ord AS (
        |  SELECT user_id, CAST(floor(value * 1000) AS BIGINT) AS v,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events),
        |r AS (
        |  SELECT user_id, rn, v AS l, CAST(0 AS BIGINT) AS b
        |  FROM ord WHERE rn = 1
        |  UNION ALL
        |  SELECT o.user_id, o.rn, (o.v + r.l + r.b) // 2,
        |    (((o.v + r.l + r.b) // 2) - r.l + r.b) // 2
        |  FROM r JOIN ord o ON o.user_id = r.user_id AND o.rn = r.rn + 1)
        |SELECT user_id, CAST(max(rn) AS BIGINT) AS n_events,
        |  arg_max(l, rn) AS level_final, arg_max(b, rn) AS trend_final,
        |  arg_max(l + b, rn) AS forecast1
        |FROM r GROUP BY user_id""".stripMargin) { (s, d) =>
      def div2(c: org.apache.spark.sql.Column) =
        (c / lit(2.0)).cast("long") // truncates toward zero, like `//`
      val seq = Tables.events(s, d)
        .select(col("user_id"),
          struct(col("ts"), col("event_id"),
            floor(col("value") * 1000).cast("long").as("v")).as("x"))
        .groupBy("user_id")
        .agg(sort_array(collect_list(col("x"))).as("seq"),
          count(lit(1)).as("n_events"))
      seq.select(col("user_id"), col("n_events"),
        aggregate(
          slice(col("seq"), lit(2), greatest(size(col("seq")) - 1, lit(0))),
          struct(element_at(col("seq"), 1).getField("v").as("l"),
            lit(0L).as("b")),
          (acc, x) => {
            val l2 = div2(x.getField("v") + acc.getField("l") + acc.getField("b"))
            struct(l2.as("l"),
              div2(l2 - acc.getField("l") + acc.getField("b")).as("b"))
          }).as("hb"))
        .select(col("user_id"), col("n_events"),
          col("hb").getField("l").as("level_final"),
          col("hb").getField("b").as("trend_final"),
          (col("hb").getField("l") + col("hb").getField("b")).as("forecast1"))
    },

    // Rolling-origin backtest — the forecast-evaluation regime every
    // production forecasting deployment runs (the M-competitions'
    // "rolling origin evaluation", statsmodels/sktime's
    // `cross_val_score` with expanding windows): at each of the last 6
    // hourly origins per slice, forecast the origin's value using ONLY
    // strictly-prior history, under three closed-form methods — naive
    // (last value), ma4 (trailing-4-hour mean), mean (expanding mean) —
    // and report per-(slice, method) fold counts and MAE. This is the
    // evaluation harness the ml_var_hybrid/ts_holt model families plug
    // into; the closed-form methods keep every fold exact: hourly sums
    // are BIGINTs on the 1e3 grid, the two mean forecasts divide via
    // the sign-consistent exact floor division (the ml_tree_depth2
    // spelling, mirrored verbatim), |err| sums are BIGINTs, and the
    // final MAE is one IEEE division r6-rounded. Plan: one hourly
    // aggregate (map-side combined), one window pass per slice, a
    // 3-way in-projection unpivot — no joins, no extra shuffles; folds
    // are O(slices · 6) rows.
    checked("ts_backtest", {
      def fdiv(a: String, b: String) = s"(($a) - ((($a) % ($b) + ($b)) % ($b))) // ($b)"
      s"""WITH h AS (SELECT event_type AS slice, date_trunc('hour', ts) AS t,
         |    CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS v
         |  FROM events GROUP BY 1, 2),
         |o AS (SELECT slice, v,
         |    row_number() OVER w AS rn,
         |    count(*) OVER (PARTITION BY slice) AS n,
         |    lag(v, 1) OVER w AS l1,
         |    sum(v) OVER (w ROWS BETWEEN 4 PRECEDING AND 1 PRECEDING) AS s4,
         |    sum(v) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS sp
         |  FROM h WINDOW w AS (PARTITION BY slice ORDER BY t)),
         |folds AS (SELECT slice, v, l1,
         |    ${fdiv("s4", "4")} AS ma4, ${fdiv("sp", "rn - 1")} AS em
         |  FROM o WHERE rn >= 5 AND rn > n - 6),
         |u AS (SELECT slice, 'naive' AS method, abs(v - l1) AS ae FROM folds
         |  UNION ALL SELECT slice, 'ma4', abs(v - ma4) FROM folds
         |  UNION ALL SELECT slice, 'mean', abs(v - em) FROM folds)
         |SELECT slice, method, CAST(count(*) AS BIGINT) AS n_folds,
         |  CAST(sum(ae) AS BIGINT) AS sum_abs_err,
         |  ${DetAgg.sqlR6("CAST(sum(ae) AS DOUBLE) / count(*)")} AS mae_mv
         |FROM u GROUP BY 1, 2""".stripMargin
    }) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      def fdiv(a: String, b: String) =
        expr(s"(($a) - ((($a) % ($b) + ($b)) % ($b))) DIV ($b)")
      val h = Tables.events(s, d)
        .groupBy(col("event_type").as("slice"),
          date_trunc("hour", col("ts")).as("t"))
        .agg(sum(floor(col("value") * 1000).cast("long")).as("v"))
      val w = Window.partitionBy("slice").orderBy("t")
      val o = h.select(col("slice"), col("v"),
        row_number().over(w).as("rn"),
        count(lit(1)).over(Window.partitionBy("slice")).as("n"),
        lag(col("v"), 1).over(w).as("l1"),
        sum(col("v")).over(w.rowsBetween(-4, -1)).as("s4"),
        sum(col("v")).over(w.rowsBetween(Window.unboundedPreceding, -1))
          .as("sp"))
      val folds = o.filter(col("rn") >= 5 && col("rn") > col("n") - 6)
        .select(col("slice"), col("v"), col("l1").as("p_naive"),
          fdiv("s4", "4").as("p_ma4"), fdiv("sp", "rn - 1").as("p_mean"))
      folds
        .select(col("slice"), col("v"), explode(array(
          struct(lit("naive").as("method"), col("p_naive").as("pred")),
          struct(lit("ma4").as("method"), col("p_ma4").as("pred")),
          struct(lit("mean").as("method"), col("p_mean").as("pred"))))
          .as("u"))
        .select(col("slice"), col("u.method").as("method"),
          abs(col("v") - col("u.pred")).as("ae"))
        .groupBy("slice", "method")
        .agg(count(lit(1)).as("n_folds"), sum(col("ae")).as("sum_abs_err"),
          DetAgg.r6(sum(col("ae")).cast("double") / count(lit(1)))
            .as("mae_mv"))
    },

    // Pinball (quantile) loss evaluation — the companion metric of
    // ts_backtest for QUANTILE forecasts (the M5-Uncertainty
    // competition's scoring rule; production demand/capacity forecasts
    // ship P10/P50/P90 bands and are graded exactly this way). At the
    // same rolling origins, the τ-quantile forecast is the TYPE-1 order
    // statistic of the trailing 8 hours (rank ceil(8τ) — an actual data
    // value, bit-identical by construction), and the pinball loss
    // max(τ·e, (τ−1)·e) is kept integer by scaling τ by 10
    // (τ10 ∈ {1,5,9} → L·10 = max(τ10·e, (τ10−10)·e), all BIGINT).
    // Declared surface: per (slice, τ10) fold count, exact summed
    // 10×-loss, and the r6 mean. Same plan economics as ts_backtest:
    // one hourly aggregate, one window pass (the trailing frame rides
    // the same sort), a 3-way in-projection unpivot.
    checked("ts_pinball",
      s"""WITH h AS (SELECT event_type AS slice, date_trunc('hour', ts) AS t,
         |    CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS v
         |  FROM events GROUP BY 1, 2),
         |o AS (SELECT slice, v,
         |    row_number() OVER w AS rn,
         |    count(*) OVER (PARTITION BY slice) AS n,
         |    list_sort(list(v) OVER (w ROWS BETWEEN 8 PRECEDING
         |      AND 1 PRECEDING)) AS trail
         |  FROM h WINDOW w AS (PARTITION BY slice ORDER BY t)),
         |folds AS (SELECT slice, v,
         |    trail[1] AS q10, trail[4] AS q50, trail[8] AS q90
         |  FROM o WHERE rn >= 9 AND rn > n - 6),
         |u AS (SELECT slice, CAST(1 AS BIGINT) AS tau10,
         |    greatest(1 * (v - q10), (1 - 10) * (v - q10)) AS l10 FROM folds
         |  UNION ALL SELECT slice, 5,
         |    greatest(5 * (v - q50), (5 - 10) * (v - q50)) FROM folds
         |  UNION ALL SELECT slice, 9,
         |    greatest(9 * (v - q90), (9 - 10) * (v - q90)) FROM folds)
         |SELECT slice, tau10, CAST(count(*) AS BIGINT) AS n_folds,
         |  CAST(sum(l10) AS BIGINT) AS sum_pinball10,
         |  ${DetAgg.sqlR6("CAST(sum(l10) AS DOUBLE) / count(*)")}
         |    AS mean_pinball10
         |FROM u GROUP BY 1, 2""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val h = Tables.events(s, d)
        .groupBy(col("event_type").as("slice"),
          date_trunc("hour", col("ts")).as("t"))
        .agg(sum(floor(col("value") * 1000).cast("long")).as("v"))
      val w = Window.partitionBy("slice").orderBy("t")
      val o = h.select(col("slice"), col("v"),
        row_number().over(w).as("rn"),
        count(lit(1)).over(Window.partitionBy("slice")).as("n"),
        sort_array(collect_list(col("v")).over(w.rowsBetween(-8, -1)))
          .as("trail"))
      val folds = o.filter(col("rn") >= 9 && col("rn") > col("n") - 6)
        .select(col("slice"), col("v"),
          element_at(col("trail"), 1).as("q10"),
          element_at(col("trail"), 4).as("q50"),
          element_at(col("trail"), 8).as("q90"))
      def loss(t10: Int, q: String) = {
        val e = col("v") - col(q)
        greatest(lit(t10.toLong) * e, lit(t10.toLong - 10L) * e)
      }
      folds
        .select(col("slice"), explode(array(
          struct(lit(1L).as("tau10"), loss(1, "q10").as("l10")),
          struct(lit(5L).as("tau10"), loss(5, "q50").as("l10")),
          struct(lit(9L).as("tau10"), loss(9, "q90").as("l10")))).as("u"))
        .select(col("slice"), col("u.tau10").as("tau10"),
          col("u.l10").as("l10"))
        .groupBy("slice", "tau10")
        .agg(count(lit(1)).as("n_folds"), sum(col("l10")).as("sum_pinball10"),
          DetAgg.r6(sum(col("l10")).cast("double") / count(lit(1)))
            .as("mean_pinball10"))
    },

    // Bloom-filter membership with its contract MEASURED, beside the
    // HLL/GK/CMS/MG sketches: build the filter over the distinct user
    // set (df.stat.bloomFilter — Spark's distributed treeAggregate
    // build), then probe DISTRIBUTEDLY through the same codegen'd
    // `BloomFilterMightContain` expression the runtime join filter
    // injects, with the serialized sketch inlined as a literal. Probes
    // are every present key plus an equal-size disjoint absent set
    // (+1e7 — user ids are ≪ 1e7); the contract rows assert (a) zero
    // false negatives — the bloom guarantee, (b) measured FPR within 3×
    // the configured 3 %, (c) a split-build (pre/post the IVM date)
    // merged via mergeInPlace answers every probe identically to the
    // whole-corpus build — the partition-merge identity a nightly
    // pipeline relies on (bit-OR of same-shape arrays, insertion
    // idempotent). Driver state: three ~2 kB blobs. DuckDB has no
    // bloom, so the twin computes the exact key count and asserts the
    // measured booleans literally (sketch_cms pattern).
    checked("sketch_bloom",
      """SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_keys,
        |  true AS no_false_negatives, true AS fpr_within_bound,
        |  true AS merge_exact
        |FROM events""".stripMargin) { (s, d) =>
      val Fpp = 0.03
      val Expected = 2048L
      val split = expr(s"TIMESTAMP '${AnalyticsQueries.IvmSplit}'")
      val ev = staged(Tables.events(s, d).select(col("user_id"), col("ts")))
      def build(df: org.apache.spark.sql.DataFrame) =
        df.stat.bloomFilter("user_id", Expected, Fpp)
      def bytesOf(b: org.apache.spark.util.sketch.BloomFilter) = {
        val bos = new java.io.ByteArrayOutputStream()
        b.writeTo(bos); bos.toByteArray
      }
      val whole = bytesOf(build(ev))
      val merged = bytesOf(build(ev.filter(col("ts") < split))
        .mergeInPlace(build(ev.filter(col("ts") >= split))))
      import org.apache.spark.sql.classic.GraftExpressionBridge
      def mightContain(blob: Array[Byte], key: org.apache.spark.sql.Column) =
        GraftExpressionBridge.column(
          org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
            GraftExpressionBridge.expression(lit(blob)),
            GraftExpressionBridge.expression(key)))
      val keys = ev.select("user_id").distinct()
      val probes = keys.select(col("user_id").as("k"), lit(true).as("present"))
        .unionAll(keys.select((col("user_id") + 10000000L).as("k"),
          lit(false).as("present")))
      probes
        .select(col("present"),
          mightContain(whole, col("k")).as("hd"),
          mightContain(merged, col("k")).as("hm"))
        .agg(sum(when(col("present"), 1L).otherwise(0L)).as("n_keys"),
          min(when(col("present"), col("hd")).otherwise(lit(true)))
            .as("no_false_negatives"),
          (sum(when(!col("present") && col("hd"), 1L).otherwise(0L)) <=
            ceil(lit(3 * Fpp) *
              sum(when(!col("present"), 1L).otherwise(0L))))
            .as("fpr_within_bound"),
          min(col("hd") === col("hm")).as("merge_exact"))
    },

    // K-Minimum-Values (theta) overlap sketch — the SET-EXPRESSION
    // cardinality the HLL family above cannot answer: HLL unions but
    // never intersects, and "how much of snapshot B is already in
    // snapshot A" (train/test contamination, crawl-over-crawl novelty)
    // is an intersection question. Two 70 %-of-corpus document snapshots
    // (planted 40 % id overlap) are sketched IN ONE RAW SCAN — no
    // per-text shuffle: kmv_sketch partials reduce map-side and only
    // O(k) longs per partial cross the exchange, the 100 TB operating
    // point where the exact per-text groupBy (kept here as the test-
    // scale oracle side) is unpayable. Union = k smallest of the merged
    // arrays; intersection = common hashes below θ = min(θ_a, θ_b),
    // scaled by 1/θ (Beyer et al., SIGMOD 2007) — both PURE ARRAY
    // ARITHMETIC over the two returned sketches, no re-scan. Contracts
    // hashed as booleans (deterministic: xxhash64 is seed-free and the
    // sketch is a pure function of the value set): each estimate within
    // 10 % of exact (k=1024 → RSE ≈ 3.1 %), intersection within 10 % of
    // the UNION (the theta-sketch error scale), and in the exact regime
    // (distinct < k, which sf0.01 exercises) the sketch must BE the
    // distinct hash set — union/intersection sizes exactly equal the
    // true counts. DuckDB has no KMV, so its twin computes the exact
    // side and asserts the measured booleans literally (sketch_rollup
    // pattern).
    checked("sketch_kmv_overlap", kmvOverlapOracleSql) { (s, d) =>
      import graft.functions.expr.KmvSketch
      val K = 1024
      val docs = Tables.documents(s, d)
        .crossJoin(broadcast(
          Tables.documents(s, d).agg(max(col("doc_id")).as("mx"))))
        .select(col("text"),
          xxhash64(col("text")).bitwiseAND(lit(Long.MaxValue)).as("h"),
          (col("doc_id") <= floor(lit(0.7) * col("mx")).cast("long")).as("in_a"),
          (col("doc_id") >= floor(lit(0.3) * col("mx")).cast("long")).as("in_b"))
      val scan = staged(docs)
      // Sketch side: ONE raw-scan aggregate, no per-text shuffle.
      val sk = scan.agg(
        KmvSketch.sketch(when(col("in_a"), col("h")), K).as("ska"),
        KmvSketch.sketch(when(col("in_b"), col("h")), K).as("skb"))
      // Exact side — the oracle's job at test scale; at 100 TB only the
      // sketches are kept.
      val exact = scan.groupBy("text")
        .agg(max(col("in_a")).as("a"), max(col("in_b")).as("b"))
        .agg(sum(when(col("a"), 1L).otherwise(0L)).as("n_a"),
          sum(when(col("b"), 1L).otherwise(0L)).as("n_b"),
          sum(when(col("a") || col("b"), 1L).otherwise(0L)).as("n_union"),
          sum(when(col("a") && col("b"), 1L).otherwise(0L)).as("n_intersect"))
      val merged = slice(array_sort(array_union(col("ska"), col("skb"))), 1, K)
      val thr = Kmv.thr(col("ska"), col("skb"), K)
      val nCommon = Kmv.nCommon(col("ska"), col("skb"), thr)
      val estInt = Kmv.estInt(nCommon, thr)
      val bothExact = size(col("ska")) < K && size(col("skb")) < K
      exact.crossJoin(broadcast(sk))
        .select(col("n_a"), col("n_b"), col("n_union"), col("n_intersect"),
          (abs(Kmv.estD(col("ska"), K) - col("n_a")) <= lit(0.10) * col("n_a"))
            .as("est_a_ok"),
          (abs(Kmv.estD(col("skb"), K) - col("n_b")) <= lit(0.10) * col("n_b"))
            .as("est_b_ok"),
          (abs(Kmv.estD(merged, K) - col("n_union")) <= lit(0.10) * col("n_union"))
            .as("est_union_ok"),
          (abs(estInt - col("n_intersect")) <= lit(0.10) * col("n_union"))
            .as("est_intersect_ok"),
          when(bothExact,
            size(merged) === col("n_union") && nCommon === col("n_intersect"))
            .otherwise(lit(true)).as("exact_regime_consistent"))
    },

    // Sketch-based RETENTION — the analytical payoff of kmv_sketch: "how
    // many of day d's users return on day d+1" is a per-day-pair set
    // intersection, which a 100 TB deployment answers from STORED daily
    // sketches (O(days × k) state, no raw-history rescan) — the
    // dq_profile_sketch_store lifecycle with an operator HLL cannot
    // serve. One scan builds per-day sketches AND exact distinct counts;
    // the exact day-pair overlap (the oracle's side at test scale) comes
    // from a distinct-pairs self-join; the sketch side re-derives the
    // same overlap from array arithmetic on consecutive days' sketches.
    // Exact columns are bit-matched cross-engine; the estimator rides as
    // measured 10 %-of-union bounds (sf0.01 exact regime: per-day
    // distinct < k; sf0.1 estimation regime: ~1 330 users/day > k).
    checked("sketch_kmv_retention",
      s"""WITH du AS (SELECT DISTINCT date_trunc('day', ts) AS day, user_id
         |  FROM events),
         |dc AS (SELECT day, CAST(count(*) AS BIGINT) AS u FROM du GROUP BY 1),
         |pair AS (SELECT a.day AS day, CAST(count(*) AS BIGINT) AS u_both
         |  FROM du a JOIN du b ON b.user_id = a.user_id
         |    AND b.day = a.day + INTERVAL 1 DAY
         |  GROUP BY 1)
         |SELECT x.day AS day, x.u AS u_day, y.u AS u_next, p.u_both,
         |  ${sqlR6("CAST(p.u_both AS DOUBLE) / x.u")} AS retention6,
         |  true AS est_day_ok, true AS est_overlap_ok
         |FROM dc x JOIN dc y ON y.day = x.day + INTERVAL 1 DAY
         |JOIN pair p ON p.day = x.day""".stripMargin) { (s, d) =>
      val K = 1024
      val day = date_trunc("day", col("ts")).as("day")
      val ev = staged(Tables.events(s, d).select(day,
        col("user_id"),
        xxhash64(col("user_id")).bitwiseAND(lit(Long.MaxValue)).as("h")))
      // ONE scan: per-day sketch + exact distinct count side by side.
      val daily = ev.groupBy("day").agg(
        graft.functions.expr.KmvSketch.sketch(col("h"), K).as("sk"),
        count_distinct(col("user_id")).cast("long").as("u"))
      // Exact day-pair overlap — the oracle's job at test scale; at
      // 100 TB only the stored sketches answer this.
      val du = ev.select(col("day"), col("user_id")).distinct()
      val pair = du.as("a").join(du.as("b"),
          col("b.user_id") === col("a.user_id") &&
            col("b.day") === col("a.day") + expr("INTERVAL 1 DAY"))
        .groupBy(col("a.day").as("day")).agg(count(lit(1)).as("u_both"))
      val joined = daily.as("x").join(daily.as("y"),
          col("y.day") === col("x.day") + expr("INTERVAL 1 DAY"))
        .join(pair.as("p"), col("p.day") === col("x.day"))
        .select(col("x.day").as("day"), col("x.u").as("u_day"),
          col("y.u").as("u_next"), col("u_both"),
          col("x.sk").as("ska"), col("y.sk").as("skb"))
      val thr = Kmv.thr(col("ska"), col("skb"), K)
      val estInt = Kmv.estInt(Kmv.nCommon(col("ska"), col("skb"), thr), thr)
      val unionExact = col("u_day") + col("u_next") - col("u_both")
      joined.select(col("day"), col("u_day"), col("u_next"), col("u_both"),
        r6(col("u_both").cast("double") / col("u_day")).as("retention6"),
        (abs(Kmv.estD(col("ska"), K) - col("u_day")) <=
          lit(0.10) * col("u_day")).as("est_day_ok"),
        (abs(estInt - col("u_both")) <= lit(0.10) * unionExact)
          .as("est_overlap_ok"))
    },

    // Per-flow sequencing exposed directly (reference :407-417): IAT rows.
    checked("flow_iat",
      s"""WITH pkt AS (${FlowOps.packetViewSql}),
         |seqd AS (${FlowOps.withIatSql("SELECT * FROM pkt")})
         |SELECT event_id, slice, flow, ${sqlR6("ts_sec")} AS ts_sec6,
         |  ${sqlR6("iat")} AS iat6
         |FROM seqd""".stripMargin) { (s, d) =>
      FlowOps.withIat(FlowOps.packetView(Tables.events(s, d)))
        .select(col("event_id"), col("slice"), col("flow"),
          r6(col("ts_sec")).as("ts_sec6"),
          r6(col("iat")).as("iat6"))
    }
  )
}
