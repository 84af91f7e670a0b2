package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Paired Spark/DuckDB JSON field extraction, two tiers:
  *
  *  - the full operators (`get_json_object`, `from_json`) stay in the
  *    JSON-surface queries (scalar_json, window_fill, transport_roundtrip)
  *    — they are part of the declared operator inventory (SURVEY §2.8);
  *  - [[jsonInt]] is the hot-path tier for flat integer fields: Spark's
  *    `get_json_object` builds an InputStreamReader + Jackson parser per
  *    evaluation (~20 µs/row, caught live eating 95 % of a KPI stage's
  *    task time), while a compiled-once regex costs ~1 µs/row and stays
  *    allocation-light. `packetView`/`featureSeries` sit under a dozen
  *    queries × multiple passes each, so the per-row constant is the
  *    single biggest CPU term in the whole bench.
  *
  * Contract: the field must be a top-level integer in flat JSON (no nested
  * objects that could alias the key — true for `events.props` by
  * construction). No-match → NULL on both engines (Spark and DuckDB
  * `regexp_extract` both return '' on no match; `nullif(…, '')` then casts
  * NULL), so nullability matches `get_json_object`'s.
  */
object JsonFns {
  /** `json_col.key` as INT via compiled-once regex (flat-JSON fast path). */
  def jsonInt(c: Column, key: String): Column =
    nullif(regexp_extract(c, "\"" + key + "\"\\s*:\\s*(-?\\d+)", 1), lit(""))
      .cast("int")

  /** DuckDB twin of [[jsonInt]] — same regex, same no-match semantics. */
  def sqlJsonInt(c: String, key: String): String =
    s"""CAST(nullif(regexp_extract($c, '"$key"\\s*:\\s*(-?\\d+)', 1), '') AS INTEGER)"""
}
