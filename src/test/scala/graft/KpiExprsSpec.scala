package graft

import org.apache.spark.sql.functions._

import graft.functions.{DetAgg, KpiExprs}

/** KPI expression spec: hand-computed fixtures (SURVEY §5.2) + invariants
  * (§5.3) over the 38-KPI aggregate set. */
class KpiExprsSpec extends SparkSpec {
  import spark.implicits._

  // 5-row fixture over the canonical packet view: one slice, one flow,
  // ts 0,1,3,6,10 → IAT 0,1,2,3,4 (first-packet IAT=0, quirk Q4).
  private lazy val fixture = Seq(
    ("s1", "f1", 0.0, 100.0, "TCP", 10, 20, 5, 0x04, 1L, 0.0),
    ("s1", "f1", 1.0, 200.0, "TCP", 10, 20, 0, 0x10, 2L, 1.0),
    ("s1", "f1", 3.0, 300.0, "UDP", 11, 21, 5, 0x00, 3L, 2.0),
    ("s1", "f1", 6.0, 400.0, "UDP", 11, 21, 5, 0x00, 3L, 3.0),
    ("s1", "f1", 10.0, 500.0, "OTHER", 12, 22, 7, 0x00, 4L, 4.0)
  ).toDF("slice", "flow", "ts_sec", "len", "proto", "src_port", "dst_port",
    "win_size", "flags", "seq", "iat")

  private def kpi(name: String): Double = {
    val ks = KpiExprs.kpis(2.5, 150.0, 450.0)
    val k = ks.find(_.name == name).get
    fixture.groupBy("slice").agg(k.sparkNamed)
      .select(col(name).cast("double")).head().getDouble(0)
  }

  test("volume block: counts, sums, throughput") {
    assert(kpi("Total_Packets") == 5.0)
    assert(kpi("Total_Bytes") == 1500.0)
    assert(kpi("Throughput_bps") == 12000.0)
  }

  test("temporal block: avg/min/max/median IAT, idle counting") {
    assert(kpi("Avg_IAT") == 2.0) // (0+1+2+3+4)/5
    assert(kpi("Min_IAT") == 0.0 && kpi("Max_IAT") == 4.0)
    assert(kpi("IAT_Median") == 2.0)
    assert(kpi("Idle_Periods") == 2.0) // IAT 3,4 > 2.5
    assert(kpi("Idle_Rate") == 0.4)
    assert(kpi("Transmission_Duration") == 10.0)
  }

  test("jitter = sample stddev of IAT") {
    // IATs 0..4: mean 2, sum sq dev 10, var 10/4 = 2.5
    assert(math.abs(kpi("Jitter") - math.sqrt(2.5)) < 1e-6)
  }

  test("size block: moments, distinct, small/large ratios") {
    assert(kpi("Avg_Packet_Size") == 300.0)
    assert(kpi("Unique_Pkt_Sizes") == 5.0)
    assert(kpi("Small_Pkt_Ratio") == 0.2) // 100 < 150
    assert(kpi("Large_Pkt_Ratio") == 0.2) // 500 > 450
  }

  test("protocol + tcp-health block") {
    assert(kpi("TCP_Ratio") == 0.4 && kpi("UDP_Ratio") == 0.4)
    assert(kpi("Protocol_Diversity") == 3.0)
    assert(kpi("Zero_Win_Count") == 1.0)
    assert(kpi("RST_Count") == 1.0) // only flags 0x04
    assert(kpi("Avg_Win_Size") == 4.4)
  }

  test("Q7 gap-closers: retransmission ratio + entropy") {
    // 5 packets, 4 distinct seq → (5-4)/5
    assert(math.abs(kpi("Retransmission_Ratio") - 0.2) < 1e-9)
    // seq histogram {1:1, 2:1, 3:2, 4:1} → H = 1.5 + 0.5*log2 ... compute:
    // p = [.2,.2,.4,.2]: H = 3*(.2*log2(5)) + .4*log2(2.5)
    val h = 3 * 0.2 * (math.log(5) / math.log(2)) + 0.4 * (math.log(2.5) / math.log(2))
    assert(math.abs(kpi("Entropy_Score") - math.floor(h * 1e6 + 0.5) / 1e6) < 1e-9)
  }

  test("invariants hold on the sf0.001 events-derived KPI table") {
    val df = SparkEntry.queries("kpi_full_day")(spark, "/root/testdata/sf0.001").cache()
    val n = df.count()
    assert(n > 0)
    val bad = df.filter(
      col("Small_Pkt_Ratio") < 0 || col("Small_Pkt_Ratio") > 1 ||
        col("TCP_Ratio") < 0 || col("TCP_Ratio") > 1 ||
        col("Min_IAT") > col("Max_IAT") ||
        col("Min_Pkt_Size") > col("Max_Pkt_Size") ||
        col("Total_Packets") <= 0 ||
        col("Jitter") < 0).count()
    assert(bad == 0)
    // window-sum conservation: Σ Total_Packets = event count
    val total = df.agg(sum("Total_Packets")).head().getLong(0)
    val events = Tables.events(spark, "/root/testdata/sf0.001").count()
    assert(total == events)
  }

  test("deterministic aggregates are partitioning-invariant") {
    val a = fixture.repartition(1).groupBy("slice")
      .agg(DetAgg.dsum(col("len")).as("s"), DetAgg.dstddev(col("iat")).as("sd"))
      .select("s", "sd").head()
    val b = fixture.repartition(5).groupBy("slice")
      .agg(DetAgg.dsum(col("len")).as("s"), DetAgg.dstddev(col("iat")).as("sd"))
      .select("s", "sd").head()
    assert(a == b)
  }
}
