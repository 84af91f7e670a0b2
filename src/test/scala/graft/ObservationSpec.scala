package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** `observe()` monitoring surface (T7's batch-side sibling): named metrics
  * ride the existing action — no second scan, no collect — which is how a
  * 100 TB pipeline watches row counts and quality gates without paying for
  * them. The streaming analogue (per-batch listener telemetry) is covered
  * by StreamingKpiSpec; this pins the batch API on a real query. */
class ObservationSpec extends SparkSpec {

  test("observe() collects row/volume metrics from a real query for free") {
    val obs = Observation("kpi_volume_obs")
    val df = SparkEntry.queries("kpi_volume")(spark, "/root/testdata/sf0.001")
      .observe(obs,
        count(lit(1)).as("n_rows"),
        sum(col("total_events")).as("n_events"),
        min(col("window_start")).as("first_window"))
    val rows = df.collect() // the one action both computes and observes
    val m = obs.get
    assert(m("n_rows") == rows.length.toLong)
    assert(m("n_events").asInstanceOf[Long] ==
      rows.map(_.getAs[Long]("total_events")).sum)
    assert(m("first_window") != null)
  }

  test("observe() gates data quality inline: corrupt-row count from the media pipeline") {
    import spark.implicits._
    val obs = Observation("media_quality")
    val feats = graft.multimodal.MediaOps
      .extract(graft.multimodal.MediaOps.corpus(spark, 150)).toDF()
      .observe(obs,
        sum(when(col("width") === -1, 1L).otherwise(0L)).as("n_corrupt"),
        count(lit(1)).as("n_total"))
    val n = feats.count()
    val m = obs.get
    assert(m("n_total") == n)
    assert(m("n_corrupt") == 3L) // ids 49, 99, 149 are torn by construction
  }
}
