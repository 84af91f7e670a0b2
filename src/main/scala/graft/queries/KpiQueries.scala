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

  val all: Seq[QuerySpec] = Seq(
    // Step-0 flagship: tumbling 1-hour volume KPIs per slice
    // (reference volume block, KafkaKpiPipeline.scala:108-111).
    checked("kpi_volume",
      s"""SELECT event_type AS slice, date_trunc('hour', ts) AS window_start,
         |  count(*) AS total_events,
         |  ${sqlSum("value")} AS total_value,
         |  ${sqlAvg("value")} AS avg_value,
         |  round(${sqlSumRaw("value")} * 8, $Scale) AS throughput_bits
         |FROM events
         |GROUP BY 1, 2""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("event_type").as("slice"),
          date_trunc("hour", col("ts")).as("window_start"))
        .agg(
          count(lit(1)).as("total_events"),
          dsum(col("value")).as("total_value"),
          davg(col("value")).as("avg_value"),
          round(dsumRaw(col("value")) * 8, Scale).as("throughput_bits"))
    },

    // The full 38-KPI table (36 reference KPIs + 2 Q7 gap-closers) per
    // (slice, day) with per-flow lag-derived IAT.
    checked("kpi_full_day",
      FlowOps.kpiTableSql("day", IdleThr, SmallLen, LargeLen)) { (s, d) =>
      FlowOps.kpiTable(Tables.events(s, d), "day", IdleThr, SmallLen, LargeLen)
    },

    // Per-flow sequencing exposed directly (reference :407-417): IAT rows.
    checked("flow_iat",
      s"""WITH pkt AS (${FlowOps.packetViewSql}),
         |seqd AS (${FlowOps.withIatSql("SELECT * FROM pkt")})
         |SELECT event_id, slice, flow, round(ts_sec, 6) AS ts_sec6,
         |  round(iat, 6) AS iat6
         |FROM seqd""".stripMargin) { (s, d) =>
      FlowOps.withIat(FlowOps.packetView(Tables.events(s, d)))
        .select(col("event_id"), col("slice"), col("flow"),
          round(col("ts_sec"), 6).as("ts_sec6"),
          round(col("iat"), 6).as("iat6"))
    }
  )
}
