package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.Tables

/** Product-analytics operators over the event stream — the funnel /
  * cohort / incremental-rollup trio every large event warehouse runs
  * nightly. All three are single-key-partitioned aggregation DAGs (the
  * user key or the (slice, day) rollup key), so at 100 TB they ride the
  * same bucketed-events layout: every join below is between frames
  * already hash-partitioned on the join key by their own aggregates, so
  * Catalyst plans them exchange-free past the first shuffle.
  */
object AnalyticsQueries {
  import QuerySpec._

  /** IVM split point — mid-range of the generator's 30-day event span. */
  val IvmSplit = "2024-01-16 00:00:00"

  /** funnel_conversion's DuckDB twin — shared with `sql_funnel_conversion`
    * (portable modulo the epoch_us -> unix_micros hop and the view
    * prefix). */
  private[queries] val funnelOracleSql: String = {
    def step(k: Int, ev: String) =
      s"""s$k AS (SELECT e.user_id, min(e.ts) AS t$k
         |  FROM events e JOIN s${k - 1} USING (user_id)
         |  WHERE e.event_type = '$ev' AND e.ts > s${k - 1}.t${k - 1}
         |  GROUP BY 1)""".stripMargin
    def row(k: Int, name: String) =
      s"""SELECT $k AS step_order, '$name' AS step,
         |  CAST(count(*) AS BIGINT) AS n_users,
         |  CAST(COALESCE(sum(epoch_us(t$k) - epoch_us(t1)), 0) AS BIGINT)
         |    AS lag_us_sum
         |FROM s$k JOIN s1 USING (user_id)""".stripMargin
    s"""WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
       |  WHERE event_type = 'signup' GROUP BY 1),
       |${step(2, "view")},
       |${step(3, "click")},
       |${step(4, "purchase")}
       |SELECT 1 AS step_order, 'signup' AS step,
       |  CAST(count(*) AS BIGINT) AS n_users, CAST(0 AS BIGINT) AS lag_us_sum
       |FROM s1
       |UNION ALL ${row(2, "view")}
       |UNION ALL ${row(3, "click")} UNION ALL ${row(4, "purchase")}""".stripMargin
  }

  val all: Seq[QuerySpec] = Seq(

    // Ordered funnel — signup → view → click → purchase with
    // strictly-after semantics: step k's timestamp is the user's FIRST
    // qualifying event after their step-(k−1) timestamp (the greedy
    // earliest chain — equivalent to the state-machine sessionization a
    // MATCH_RECOGNIZE engine would run). Each step is one filtered
    // aggregate joined to the previous frontier; all five shuffles key
    // on user_id, so the chain is co-partitioned end-to-end. Lag sums
    // are whole-µs integers (timestamp subtraction), bit-exact.
    checked("funnel_conversion",
      AnalyticsQueries.funnelOracleSql) { (s, d) =>
      val ev = staged(Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("ts")))
      val s1 = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min(col("ts")).as("t1"))
      // each frontier carries t1 forward so the lag sum needs no re-join
      val s2 = ev.filter(col("event_type") === "view").join(s1, "user_id")
        .filter(col("ts") > col("t1")).groupBy("user_id")
        .agg(min(col("ts")).as("t2"), min(col("t1")).as("t1"))
      val s3 = ev.filter(col("event_type") === "click").join(s2, "user_id")
        .filter(col("ts") > col("t2")).groupBy("user_id")
        .agg(min(col("ts")).as("t3"), min(col("t1")).as("t1"))
      val s4 = ev.filter(col("event_type") === "purchase").join(s3, "user_id")
        .filter(col("ts") > col("t3")).groupBy("user_id")
        .agg(min(col("ts")).as("t4"), min(col("t1")).as("t1"))
      def agg(k: Int, name: String, f: DataFrame): DataFrame =
        f.agg(count(lit(1)).as("n_users"),
          coalesce(sum(unix_micros(col(s"t$k")) - unix_micros(col("t1"))),
            lit(0L)).as("lag_us_sum"))
          .select(lit(k).as("step_order"), lit(name).as("step"),
            col("n_users"), col("lag_us_sum"))
      agg(1, "signup", s1).unionByName(agg(2, "view", s2))
        .unionByName(agg(3, "click", s3))
        .unionByName(agg(4, "purchase", s4))
    },

    // Cohort retention — users bucketed by first-seen day, activity
    // counted per (cohort, day-offset): the warehouse-standard retention
    // triangle. ONE aggregate per user computes both the cohort day
    // (min) and the active-day set (collect_set — bounded by the
    // retention horizon's day count per user, and partially aggregated
    // map-side), so the whole triangle costs two narrow shuffles and no
    // join at all; the SQL twin spells the same thing relationally.
    checked("retention_cohorts",
      """WITH firstd AS (SELECT user_id, date_trunc('day', min(ts)) AS c
        |  FROM events GROUP BY 1),
        |act AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS d FROM events)
        |SELECT c AS cohort_day,
        |  CAST(date_diff('day', c, d) AS INT) AS day_offset,
        |  CAST(count(*) AS BIGINT) AS n_active
        |FROM act JOIN firstd USING (user_id)
        |GROUP BY 1, 2""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy("user_id")
        .agg(date_trunc("day", min(col("ts"))).as("c"),
          collect_set(date_trunc("day", col("ts"))).as("days"))
        .select(col("c"), explode(col("days")).as("d"))
        .groupBy(col("c").as("cohort_day"),
          datediff(col("d"), col("c")).as("day_offset"))
        .agg(count(lit(1)).as("n_active"))
    },

    // Last-touch attribution — every purchase is credited to the user's
    // most recent preceding marketing touch (click/view/signup; `error`
    // rows are noise, purchases with no touch are 'direct'): the
    // IGNORE-NULLS carry-forward window (the window_fill surface) doing
    // real revenue accounting, with decimal-exact value totals. One
    // window pass per user + one narrow rollup — the same two-shuffle
    // budget as the retention triangle.
    checked("event_attribution",
      s"""WITH t AS (SELECT user_id, ts, event_id, event_type, value,
         |    last_value(CASE WHEN event_type IN ('click','view','signup')
         |                    THEN event_type END IGNORE NULLS)
         |      OVER (PARTITION BY user_id ORDER BY ts, event_id
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |      AS channel
         |  FROM events)
         |SELECT COALESCE(channel, 'direct') AS channel,
         |  CAST(count(*) AS BIGINT) AS n_purchases,
         |  ${graft.functions.DetAgg.sqlSum("value")} AS revenue
         |FROM t WHERE event_type = 'purchase'
         |GROUP BY 1""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.events(s, d)
        .withColumn("channel",
          last(when(col("event_type").isin("click", "view", "signup"),
            col("event_type")), ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .groupBy(coalesce(col("channel"), lit("direct")).as("channel"))
        .agg(count(lit(1)).as("n_purchases"),
          graft.functions.DetAgg.dsum(col("value")).as("revenue"))
    },

    // Incremental view maintenance — the algebraic-merge identity a
    // nightly rollup pipeline depends on: a (slice, day) stats view
    // built from pre-split history, merged with the append-batch's
    // partial aggregate via a full-outer combine (counts and sums ADD,
    // extrema take least/greatest — the mergeable-aggregate algebra),
    // must equal the full recompute, which is exactly what the DuckDB
    // twin runs. Value sums ride the 1e3-scaled integer grid so the
    // merge is associative bit-for-bit. At 100 TB the view is the
    // stored table and only the delta touches raw data — this query IS
    // that contract.
    checked("ivm_agg",
      """SELECT event_type AS slice, date_trunc('day', ts) AS day,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS vsum,
        |  min(CAST(floor(value * 1000) AS BIGINT)) AS vmin,
        |  max(CAST(floor(value * 1000) AS BIGINT)) AS vmax
        |FROM events GROUP BY 1, 2""".stripMargin) { (s, d) =>
      val split = expr(s"TIMESTAMP '$IvmSplit'")
      def viewOf(df: DataFrame): DataFrame =
        df.select(col("event_type").as("slice"),
          date_trunc("day", col("ts")).as("day"),
          floor(col("value") * 1000).cast("long").as("v"))
          .groupBy("slice", "day")
          .agg(count(lit(1)).as("n"), sum(col("v")).as("vsum"),
            min(col("v")).as("vmin"), max(col("v")).as("vmax"))
      val ev = Tables.events(s, d)
      val old = viewOf(ev.filter(col("ts") < split))
      val delta = viewOf(ev.filter(col("ts") >= split))
        .withColumnsRenamed(Map("n" -> "dn", "vsum" -> "dvsum",
          "vmin" -> "dvmin", "vmax" -> "dvmax"))
      old.join(delta, Seq("slice", "day"), "full_outer")
        .select(col("slice"), col("day"),
          (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
          (coalesce(col("vsum"), lit(0L)) +
            coalesce(col("dvsum"), lit(0L))).as("vsum"),
          least(coalesce(col("vmin"), col("dvmin")),
            coalesce(col("dvmin"), col("vmin"))).as("vmin"),
          greatest(coalesce(col("vmax"), col("dvmax")),
            coalesce(col("dvmax"), col("vmax"))).as("vmax"))
    },

    // Pearson correlation across per-user behavioral metrics — the
    // feature-screening pass before any model training, stated as the
    // integer-moment identity corr = (n·Σxy − Σx·Σy) /
    // (√(n·Σx²−(Σx)²)·√(n·Σy²−(Σy)²)) instead of Spark's corr()/DuckDB's
    // corr(), whose streaming float accumulation is
    // partition-order-dependent and can never hash-match cross-engine.
    // Every moment is an exact BIGINT on deliberately coarse grids
    // (value 1e0, span in hours) chosen so the largest term n·Σx² stays
    // ≤ ~1e17 < 2^63 at any shipped SF; the single float step per pair
    // (two casts, two sqrts, one divide — the same IEEE tree both
    // engines) happens after all accumulation. Two shuffles total at any
    // scale: the per-user aggregate (map-side combined) and the
    // all-moments reduction to ONE row; the 3×3 pair matrix is a
    // projection of that row.
    checked("stats_corr", {
      def corrSql(x: String, y: String) =
        s"CAST(n * s_$x$y - s_$x * s_$y AS DOUBLE) / " +
          s"(sqrt(CAST(n * s_$x$x - s_$x * s_$x AS DOUBLE)) * " +
          s"sqrt(CAST(n * s_$y$y - s_$y * s_$y AS DOUBLE)))"
      s"""WITH u AS (SELECT user_id, CAST(count(*) AS BIGINT) AS c,
         |    CAST(sum(CAST(floor(value) AS BIGINT)) AS BIGINT) AS v,
         |    (max(epoch_us(ts)) - min(epoch_us(ts))) // 3600000000 AS sp
         |  FROM events GROUP BY user_id),
         |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(c) AS BIGINT) AS s_c, CAST(sum(v) AS BIGINT) AS s_v,
         |    CAST(sum(sp) AS BIGINT) AS s_sp,
         |    CAST(sum(c * c) AS BIGINT) AS s_cc,
         |    CAST(sum(v * v) AS BIGINT) AS s_vv,
         |    CAST(sum(sp * sp) AS BIGINT) AS s_spsp,
         |    CAST(sum(c * v) AS BIGINT) AS s_cv,
         |    CAST(sum(c * sp) AS BIGINT) AS s_csp,
         |    CAST(sum(v * sp) AS BIGINT) AS s_vsp
         |  FROM u)
         |SELECT 'events_vs_value' AS pair,
         |  ${graft.functions.DetAgg.sqlR6(corrSql("c", "v"))} AS corr FROM m
         |UNION ALL SELECT 'events_vs_span',
         |  ${graft.functions.DetAgg.sqlR6(corrSql("c", "sp"))} FROM m
         |UNION ALL SELECT 'value_vs_span',
         |  ${graft.functions.DetAgg.sqlR6(corrSql("v", "sp"))} FROM m""".stripMargin
    }) { (s, d) =>
      val u = Tables.events(s, d).groupBy("user_id")
        .agg(count(lit(1)).as("c"),
          sum(floor(col("value")).cast("long")).as("v"),
          expr("(max(unix_micros(ts)) - min(unix_micros(ts))) DIV 3600000000")
            .as("sp"))
      val m = staged(u.agg(count(lit(1)).as("n"),
        sum(col("c")).as("s_c"), sum(col("v")).as("s_v"),
        sum(col("sp")).as("s_sp"),
        sum(col("c") * col("c")).as("s_cc"),
        sum(col("v") * col("v")).as("s_vv"),
        sum(col("sp") * col("sp")).as("s_spsp"),
        sum(col("c") * col("v")).as("s_cv"),
        sum(col("c") * col("sp")).as("s_csp"),
        sum(col("v") * col("sp")).as("s_vsp")))
      def corrOf(x: String, y: String, xy: String): Column =
        graft.functions.DetAgg.r6(
          (col("n") * col(s"s_$xy") - col(s"s_$x") * col(s"s_$y"))
            .cast("double") /
            (sqrt((col("n") * col(s"s_$x$x") -
              col(s"s_$x") * col(s"s_$x")).cast("double")) *
              sqrt((col("n") * col(s"s_$y$y") -
                col(s"s_$y") * col(s"s_$y")).cast("double"))))
      m.select(lit("events_vs_value").as("pair"),
          corrOf("c", "v", "cv").as("corr"))
        .unionAll(m.select(lit("events_vs_span"), corrOf("c", "sp", "csp")))
        .unionAll(m.select(lit("value_vs_span"), corrOf("v", "sp", "vsp")))
    }
  )
}
