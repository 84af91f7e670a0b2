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
  /** `events.ts` is nanosecond-precision parquet, which Spark's vectorized
    * reader rejects. Read it as raw Long ns (`nanosAsLong`) and convert with
    * *integer* division to µs (a ns epoch ≈ 1.7e18 exceeds double's 2^53
    * mantissa — float division would corrupt the low digits). DuckDB reads
    * the same file as µs TIMESTAMP by truncation, so `ts DIV 1000` keeps the
    * two engines bit-identical. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    table(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
