package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Declared-surface policy, enforced by code at Verify time (round-8
  * retro: three queries shipped representations the driver's pandas
  * comparator cannot process, and only the driver caught it).
  *
  * Two rules, both about what the DRIVER's comparator — pandas
  * `sort_values` over all columns on a `datetime64[ns]` spine — can
  * faithfully order and hash:
  *
  *  1. No non-scalar top-level columns. A raw `ArrayType`/`MapType`/
  *     `StructType` cell makes `sort_values` raise (`TypeError:
  *     unhashable type: numpy.ndarray` — the round-8 `scalar_array` /
  *     `ml_feature_hash` failure). Keep collection ops in the plan;
  *     scalarize the declared surface (`array_join`, posexplode).
  *  2. Timestamp values must sit inside pandas' `datetime64[ns]` range
  *     (1677-09-21 .. 2262-04-11). An out-of-range sentinel (the
  *     round-8 `scd2_upsert` year-9999 `valid_to`) coerces differently
  *     on the Spark-parquet path vs the DuckDB path and silently
  *     corrupts every affected row hash.
  */
object OracleSurfaceLint {

  /** Conservative whole-year bounds inside pandas' datetime64[ns]
    * representable range. */
  val TsMinMicros: Long = java.time.Instant.parse("1678-01-01T00:00:00Z")
    .getEpochSecond * 1000000L
  val TsMaxMicros: Long = java.time.Instant.parse("2261-12-31T23:59:59Z")
    .getEpochSecond * 1000000L

  /** Rule 1 — offending top-level non-scalar columns, if any. */
  def nonScalarColumns(df: DataFrame): Seq[String] =
    df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[ArrayType] ||
        f.dataType.isInstanceOf[MapType] ||
        f.dataType.isInstanceOf[StructType] => f.name
    }.toSeq

  /** Rule 2 — temporal columns whose min/max fall outside the pandas
    * range, as (column, boundMicros) pairs. Covers TIMESTAMP,
    * TIMESTAMP_NTZ (what a raw parquet ts infers as when a normalizing
    * cast is forgotten — see Tables.scala), and DATE: all three reach
    * the comparator as datetime64[ns]. One bounded min/max aggregate;
    * call it on the WRITTEN parquet so the query plan is not
    * re-executed. */
  def outOfRangeTimestamps(df: DataFrame): Seq[(String, Long)] = {
    val tsCols = df.schema.fields.filter(f =>
      f.dataType == TimestampType || f.dataType == TimestampNTZType ||
        f.dataType == DateType).map(_.name).toSeq
    if (tsCols.isEmpty) Nil
    else {
      val aggs = tsCols.flatMap(c => Seq(
        min(unix_micros(col(c).cast(TimestampType))).as(s"min_$c"),
        max(unix_micros(col(c).cast(TimestampType))).as(s"max_$c")))
      val row = df.agg(aggs.head, aggs.tail: _*).head()
      tsCols.flatMap { c =>
        def get(n: String): Option[Long] = {
          val i = row.fieldIndex(n)
          if (row.isNullAt(i)) None else Some(row.getLong(i))
        }
        get(s"min_$c").filter(_ < TsMinMicros).map(c -> _).toSeq ++
          get(s"max_$c").filter(_ > TsMaxMicros).map(c -> _).toSeq
      }
    }
  }

  /** Float64's largest exactly-representable integer magnitude (2^53):
    * past it, consecutive integers collapse onto one double. */
  val Float64ExactMax: BigDecimal = BigDecimal(2).pow(53)

  /** Rule 3 — DECIMAL columns whose values leave float64's exact range
    * (round-9 verdict #7). DuckDB's `fetchdf` hands DECIMAL results to
    * pandas as float64; a DECIMAL(38,0) beyond 2^53 (or any decimal
    * whose UNSCALED significand exceeds it) silently rounds there,
    * while the Spark-parquet side may round differently (or arrive as
    * an exact object dtype) — a per-row hash corruption with no error
    * anywhere, the same failure class as the year-9999 timestamps.
    * Probe the written parquet with one bounded max(abs()) aggregate;
    * compare the unscaled magnitude (value × 10^scale) against 2^53 so
    * fractional decimals are held to the same exactness bar as
    * integers. Declared surfaces should carry BIGINTs inside 2^53 or
    * r6-quantized DOUBLEs instead. */
  def overflowingDecimals(df: DataFrame): Seq[(String, java.math.BigDecimal)] = {
    val decCols = df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[DecimalType] =>
        (f.name, f.dataType.asInstanceOf[DecimalType])
    }.toSeq
    if (decCols.isEmpty) Nil
    else {
      val aggs = decCols.map { case (c, _) => max(abs(col(c))).as(s"maxabs_$c") }
      val row = df.agg(aggs.head, aggs.tail: _*).head()
      decCols.flatMap { case (c, dt) =>
        val i = row.fieldIndex(s"maxabs_$c")
        if (row.isNullAt(i)) None
        else {
          val v = row.getDecimal(i)
          val unscaled = BigDecimal(v) * BigDecimal(10).pow(dt.scale)
          if (unscaled > Float64ExactMax) Some(c -> v) else None
        }
      }
    }
  }

  /** Throws IllegalArgumentException naming the query and offending
    * columns if any rule is violated. `written` should be the
    * re-read of the dumped parquet (rules 2 and 3 scan values). */
  def check(name: String, declared: DataFrame, written: DataFrame): Unit = {
    val ns = nonScalarColumns(declared)
    require(ns.isEmpty,
      s"[lint] $name: top-level non-scalar columns ${ns.mkString(", ")} — " +
        "the driver's pandas comparator cannot sort/hash them; " +
        "scalarize the declared surface (array_join / posexplode)")
    val oor = outOfRangeTimestamps(written)
    require(oor.isEmpty,
      s"[lint] $name: timestamp values outside pandas datetime64[ns] " +
        s"range: ${oor.map { case (c, v) => s"$c=${v}us" }.mkString(", ")} — " +
        "use NULL or a sub-2262 sentinel")
    val od = overflowingDecimals(written)
    require(od.isEmpty,
      s"[lint] $name: DECIMAL values beyond float64's 2^53 exact range: " +
        s"${od.map { case (c, v) => s"$c=$v" }.mkString(", ")} — the " +
        "driver's DuckDB fetchdf path rounds them to float64 silently; " +
        "declare a BIGINT inside 2^53 or an r6-quantized DOUBLE instead")
  }
}
