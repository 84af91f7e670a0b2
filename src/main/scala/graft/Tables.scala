package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's test tables (`/root/repo/TESTDATA.md`).
  *
  * Every query in [[SparkEntry.queries]] receives the scale-factor directory
  * and reads through here, so the scan layer is one place: plain columnar
  * parquet scans that Catalyst can push filters/pruning into. At cluster
  * scale the same call sites work unchanged against a 100 TB warehouse dir
  * (hive-partitioned layouts are handled by `spark.read.parquet` natively).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** `events.ts` normalized to a µs TIMESTAMP regardless of the physical
    * layout the data generator shipped — the driver has produced both:
    *
    *  - ns-precision INT64 (rounds ≤7), which Spark's vectorized reader
    *    rejects natively; read as raw Long ns (`nanosAsLong`) and convert
    *    with *integer* division to µs (a ns epoch ≈ 1.7e18 exceeds
    *    double's 2^53 mantissa — float division would corrupt low digits);
    *  - µs TIMESTAMP with isAdjustedToUTC=false (round 8+), which Spark 4
    *    infers as TIMESTAMP_NTZ; cast to TIMESTAMP — value-preserving
    *    under the UTC session zone every entry point pins.
    *
    * DuckDB reads either layout as a µs TIMESTAMP (truncating in the ns
    * case, exactly like `DIV 1000`), so both engines stay bit-identical. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normEventsTs(table(s, d, "events"))
  }

  /** The ts-normalization rule above, applied to an already-loaded frame
    * (batch or streaming) whose `ts` is Long ns, TIMESTAMP_NTZ, or already
    * a TIMESTAMP. */
  def normEventsTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
