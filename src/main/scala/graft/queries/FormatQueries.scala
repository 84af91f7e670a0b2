package graft.queries

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

  val all: Seq[QuerySpec] = Seq(

    // S10: CSV fallback with declared schema. Timestamps carried as exact
    // µs longs (CSV has no timestamp type); doubles survive textually via
    // Spark's shortest-round-trip formatting.
    checked("csv_roundtrip",
      s"""SELECT event_type, count(*) AS n,
         |  ${sqlSum("value")} AS total_value,
         |  CAST(min(epoch_us(ts)) AS BIGINT) AS first_us
         |FROM events GROUP BY event_type""".stripMargin) { (s, d) =>
      val dir = new java.io.File(
        sys.props("java.io.tmpdir"), s"graft_csv_${System.nanoTime()}").getAbsolutePath
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

    // S8/S9: hive-partitioned parquet sink, read back with a partition
    // filter — the scan must prune to the one slice directory (check with
    // graft.Explain: PartitionFilters, not PushedFilters).
    checked("partitioned_sink",
      s"""SELECT user_id, count(*) AS n, ${sqlSum("value")} AS total_value
         |FROM events WHERE event_type = 'click' GROUP BY user_id""".stripMargin) { (s, d) =>
      val dir = new java.io.File(
        sys.props("java.io.tmpdir"), s"graft_part_${System.nanoTime()}").getAbsolutePath
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("value"), col("event_type"))
        .write.mode("overwrite").partitionBy("event_type").parquet(dir)
      s.read.parquet(dir)
        .filter(col("event_type") === "click") // → partition pruning
        .groupBy("user_id")
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
    })
}
