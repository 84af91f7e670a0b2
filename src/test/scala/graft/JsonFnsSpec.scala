package graft

import org.apache.spark.sql.functions._

import graft.functions.JsonFns

/** Pins the [[JsonFns.jsonInt]] fast-path contract against the full JSON
  * parser ON THE REAL DATA it is used with (ADVICE round 4): the regex tier
  * diverges from `get_json_object` on quoted numerics, floats, and
  * key-inside-string-value shapes, so "true for `events.props` by
  * construction" must be re-asserted whenever the data generator changes —
  * this spec is that assertion. Synthetic edge cases document the declared
  * divergences so a refactor cannot silently widen the fast path's claimed
  * surface.
  */
class JsonFnsSpec extends SparkSpec {

  private def mismatches(sfDir: String): Long =
    Tables.events(spark, sfDir)
      .select(
        JsonFns.jsonInt(col("props"), "k").as("fast"),
        get_json_object(col("props"), "$.k").cast("int").as("full"))
      .filter(!(col("fast") <=> col("full")))
      .count()

  test("jsonInt == get_json_object over every real events.props row (sf0.001)") {
    assert(mismatches("/root/testdata/sf0.001") == 0)
  }

  test("jsonInt == get_json_object over every real events.props row (sf0.01)") {
    assert(mismatches("/root/testdata/sf0.01") == 0)
  }

  test("declared divergences: shapes OUTSIDE the flat-top-level-int contract") {
    import spark.implicits._
    val rows = Seq(
      """{"k": 7}""",                 // contract shape
      """{"j": 1}""",                 // missing key
      """{"k": -12}""",               // negative int
      """{"k": "7"}""",               // quoted numeric — outside the contract
      """{"s": "k: 9", "k": 3}""")    // key-ish text inside a string value
    val df = rows.toDF("props")
      .select(col("props"),
        JsonFns.jsonInt(col("props"), "k").as("fast"),
        get_json_object(col("props"), "$.k").cast("int").as("full"))
      .collect()
    // Contract shapes must agree…
    assert(df(0).getInt(1) == 7 && df(0).getInt(2) == 7)
    assert(df(1).isNullAt(1) && df(1).isNullAt(2))
    assert(df(2).getInt(1) == -12 && df(2).getInt(2) == -12)
    // …quoted numeric is OUTSIDE the contract: the regex does not match
    // ("k": "7" has a quote before the digits → null), the full parser
    // coerces. This is the documented divergence the real-data tests above
    // prove never occurs in events.props.
    assert(df(3).isNullAt(1) && df(3).getInt(2) == 7)
    // Key text inside an earlier string value: the regex's first match is
    // inside the VALUE "k: 9"? No — the regex requires a quoted key
    // ("k" followed by colon), and `k: 9` inside the string has no quotes
    // around k, so both engines return the real field.
    assert(df(4).getInt(1) == 3 && df(4).getInt(2) == 3)
  }
}
