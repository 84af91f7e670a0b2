package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

import graft.functions.KpiExprs

/** Flow sequencing — the reference's per-flow ordered analytics
  * (`KafkaKpiPipeline.scala:86-96` streaming intent, `:407-417` batch
  * reality): partition the event stream by (slice, flow), order by event
  * time, derive inter-arrival time with `lag`.
  *
  * The harness has no PCAPs, so the `events` table plays the packet stream
  * (SURVEY §7 mapping): `ts`→event time, `user_id`→flow, `event_type`→slice,
  * `value`→packet length, and `props.k` (a small non-negative int) supplies
  * the discrete header fields (ports/flags/window-size/seq proxies).
  *
  * Scale notes: the lag window shuffles once on (slice, flow) and sorts
  * within partitions — the same single shuffle the reference's batch path
  * pays. Timestamps are carried as exact microsecond longs divided by 1e6,
  * so Spark and the DuckDB oracle see bit-identical doubles.
  */
object FlowOps {

  /** Canonical packet view over `events` (column contract of
    * [[graft.functions.KpiExprs]]). */
  def packetView(events: DataFrame): DataFrame = {
    val k = graft.functions.JsonFns.jsonInt(col("props"), "k")
    events.select(
      col("event_id"),
      col("ts"),
      col("event_type").as("slice"),
      col("user_id").as("flow"),
      (unix_micros(col("ts")) / lit(1e6)).as("ts_sec"),
      col("value").as("len"),
      when(k % 3 === 0, "TCP").when(k % 3 === 1, "UDP").otherwise("OTHER").as("proto"),
      (col("event_id") % 1000).as("src_port"),
      col("user_id").as("dst_port"),
      k.as("win_size"),
      k.as("flags"),
      (k % 50).cast("long").as("seq"))
  }

  /** DuckDB twin of [[packetView]] (kept in lockstep). */
  val packetViewSql: String =
    s"""SELECT event_id, ts,
      |  event_type AS slice,
      |  user_id AS flow,
      |  epoch_us(ts) / 1000000.0 AS ts_sec,
      |  value AS len,
      |  CASE WHEN k % 3 = 0 THEN 'TCP' WHEN k % 3 = 1 THEN 'UDP' ELSE 'OTHER' END AS proto,
      |  event_id % 1000 AS src_port,
      |  user_id AS dst_port,
      |  k AS win_size,
      |  k AS flags,
      |  CAST(k % 50 AS BIGINT) AS seq
      |FROM (SELECT *, ${graft.functions.JsonFns.sqlJsonInt("props", "k")} AS k FROM events)""".stripMargin

  /** Per-flow inter-arrival time via `lag` (reference `:86-96`; quirk Q4:
    * a flow's first packet gets IAT = 0.0, faithfully replicated).
    * Ordering is made total with the unique event_id tie-break so results
    * are deterministic under any partitioning. */
  def withIat(pkt: DataFrame): DataFrame = {
    val w = Window.partitionBy("slice", "flow").orderBy(col("ts_sec"), col("event_id"))
    pkt.withColumn("iat",
      coalesce(col("ts_sec") - lag(col("ts_sec"), 1).over(w), lit(0.0)))
  }

  /** DuckDB twin of [[withIat]] — wraps a packet-view relation `rel`. */
  def withIatSql(rel: String): String =
    s"""SELECT *,
       |  COALESCE(ts_sec - lag(ts_sec, 1) OVER (PARTITION BY slice, flow ORDER BY ts_sec, event_id), 0.0) AS iat
       |FROM ($rel)""".stripMargin

  /** Spark-SQL spelling of [[packetViewSql]] over a registered events
    * view (the parser-route twin of [[packetView]]; kept in lockstep).
    * Dialect hops: `epoch_us` → `unix_micros`, divisor spelled `1e6` so
    * the parser types it DOUBLE (a `1000000.0` literal would parse as
    * DECIMAL and change the division), regex backslashes doubled for the
    * parser's escape pass. */
  def packetViewSparkSql(eventsRel: String): String =
    s"""SELECT event_id, ts,
       |  event_type AS slice,
       |  user_id AS flow,
       |  unix_micros(ts) / 1e6 AS ts_sec,
       |  value AS len,
       |  CASE WHEN k % 3 = 0 THEN 'TCP' WHEN k % 3 = 1 THEN 'UDP' ELSE 'OTHER' END AS proto,
       |  event_id % 1000 AS src_port,
       |  user_id AS dst_port,
       |  k AS win_size,
       |  k AS flags,
       |  CAST(k % 50 AS BIGINT) AS seq
       |FROM (SELECT *, CAST(nullif(regexp_extract(props, '"k"\\\\s*:\\\\s*(-?\\\\d+)', 1), '') AS INT) AS k
       |  FROM $eventsRel)""".stripMargin

  /** Spark-SQL spelling of [[withIatSql]] (`CAST(0 AS DOUBLE)` keeps the
    * no-previous-row default typed DOUBLE through the parser). */
  def withIatSparkSql(rel: String): String =
    s"""SELECT *,
       |  COALESCE(ts_sec - lag(ts_sec, 1) OVER (PARTITION BY slice, flow ORDER BY ts_sec, event_id), CAST(0 AS DOUBLE)) AS iat
       |FROM ($rel)""".stripMargin

  /** Spark-SQL spelling of [[kpiTableSql]] — the full 38-KPI aggregate
    * as ONE `spark.sql` statement over a registered events view, every
    * KPI expression derived from the same duck template via
    * [[KpiExprs.sparkSqlOf]]. Requires [[graft.GraftExtensions.register]]
    * (the `shannon_entropy` KPI resolves through the session UDF
    * registry). */
  def kpiTableSparkSql(eventsRel: String, bucket: String,
                       idleThr: Double, smallLen: Double, largeLen: Double): String = {
    val kpis = KpiExprs.kpis(idleThr, smallLen, largeLen)
    s"""WITH pkt AS (${packetViewSparkSql(eventsRel)}),
       |seqd AS (${withIatSparkSql("SELECT * FROM pkt")})
       |SELECT slice, date_trunc('$bucket', ts) AS window_start,
       |${kpis.map(_.sparkSqlNamed).mkString(",\n")}
       |FROM seqd
       |GROUP BY slice, date_trunc('$bucket', ts)""".stripMargin
  }

  /** The flagship aggregation: full KPI table per (slice, time bucket).
    * `bucket` is a `date_trunc` unit ("hour", "day") — the events-domain
    * analogue of the reference's 1-second tumbling window (its packet
    * streams are dense at seconds; events are dense at hours/days).
    *
    * Physical shape: shuffle #1 on (slice, flow) for the lag window,
    * shuffle #2 on (slice, bucket) for the hash aggregate with map-side
    * partials — identical to the reference batch lifecycle (SURVEY §3.2).
    */
  def kpiTable(events: DataFrame, bucket: String,
               idleThr: Double, smallLen: Double, largeLen: Double): DataFrame = {
    val kpis = KpiExprs.kpis(idleThr, smallLen, largeLen)
    withIat(packetView(events))
      .groupBy(col("slice"), date_trunc(bucket, col("ts")).as("window_start"))
      .agg(kpis.head.sparkNamed, kpis.tail.map(_.sparkNamed): _*)
  }

  /** DuckDB twin of [[kpiTable]]. */
  def kpiTableSql(bucket: String,
                  idleThr: Double, smallLen: Double, largeLen: Double): String = {
    val kpis = KpiExprs.kpis(idleThr, smallLen, largeLen)
    s"""WITH pkt AS (${packetViewSql}),
       |seqd AS (${withIatSql("SELECT * FROM pkt")})
       |SELECT slice, date_trunc('$bucket', ts) AS window_start,
       |${kpis.map(_.duckNamed).mkString(",\n")}
       |FROM seqd
       |GROUP BY slice, date_trunc('$bucket', ts)""".stripMargin
  }
}
