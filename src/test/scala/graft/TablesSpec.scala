package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Pins `Tables.normEventsTs` — the one rule every events read rides
  * (13 suites broke when the round-8 testdata regeneration switched the
  * physical ts layout; this spec keeps all three layouts equivalent
  * forever, independent of what the current `/root/testdata` happens to
  * ship). */
class TablesSpec extends SparkSpec {

  test("events ts normalizes identically across ns-int64, NTZ, and TIMESTAMP layouts") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_tables_")
      .toFile.getAbsolutePath
    // Two instants with sub-millisecond µs parts (exercise exact integer
    // conversion, not just second boundaries).
    val micros = Seq(1700000000000000L, 1700000123456789L)
    val base = micros.zipWithIndex.map { case (us, i) =>
      (i.toLong, us, 7L, "click", 0.5, "{}")
    }.toDF("event_id", "us", "user_id", "event_type", "value", "props")

    // Layout A: ns-precision int64 (rounds ≤7 generator).
    base.withColumn("ts", col("us") * 1000L)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/ns/events.parquet")
    // Layout B: µs TIMESTAMP_NTZ (round-8 generator).
    base.withColumn("ts", timestamp_micros(col("us")).cast(TimestampNTZType))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/ntz/events.parquet")
    // Layout C: µs TIMESTAMP (isAdjustedToUTC) — the passthrough arm.
    base.withColumn("ts", timestamp_micros(col("us")))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/utc/events.parquet")

    def readUs(sub: String): Map[Long, Long] = {
      val df = Tables.events(spark, s"$dir/$sub")
      assert(df.schema("ts").dataType == TimestampType,
        s"$sub layout must normalize to TIMESTAMP, got ${df.schema("ts").dataType}")
      df.select(col("event_id"), unix_micros(col("ts")).as("us"))
        .as[(Long, Long)].collect().toMap
    }
    val expected = micros.zipWithIndex.map { case (us, i) => i.toLong -> us }.toMap
    assert(readUs("ns") == expected, "ns-int64 layout")
    assert(readUs("ntz") == expected, "TIMESTAMP_NTZ layout")
    assert(readUs("utc") == expected, "TIMESTAMP layout")
  }
}
