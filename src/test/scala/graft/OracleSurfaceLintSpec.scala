package graft

import org.apache.spark.sql.functions._

import graft.queries.OracleSurfaceLint

/** The declared-surface policy is enforced by code (Verify calls
  * OracleSurfaceLint.check before accepting a dump): these specs pin both
  * rules on planted violations AND prove the whole declared surface is
  * clean — the round-8 failure class (raw array columns, year-9999
  * timestamp sentinels reaching the driver's pandas comparator) can no
  * longer ship silently. */
class OracleSurfaceLintSpec extends SparkSpec {

  test("rule 1: top-level array/map/struct columns are flagged") {
    import spark.implicits._
    val df = Seq((1L, Seq(1, 2), Map("a" -> 1)))
      .toDF("id", "arr", "mp")
      .withColumn("st", struct(col("id")))
    assert(OracleSurfaceLint.nonScalarColumns(df).toSet ==
      Set("arr", "mp", "st"))
    assert(OracleSurfaceLint.nonScalarColumns(df.select("id")).isEmpty)
    val e = intercept[IllegalArgumentException] {
      OracleSurfaceLint.check("planted", df, df.select("id"))
    }
    assert(e.getMessage.contains("arr"))
  }

  test("rule 2: a planted year-9999 timestamp column is caught") {
    import spark.implicits._
    val bad = Seq("2001-06-01 00:00:00", "9999-12-31 00:00:00")
      .toDF("s").select(col("s").cast("timestamp").as("valid_to"))
    val oor = OracleSurfaceLint.outOfRangeTimestamps(bad)
    assert(oor.map(_._1) == Seq("valid_to"))
    val e = intercept[IllegalArgumentException] {
      OracleSurfaceLint.check("planted", bad.limit(0), bad)
    }
    assert(e.getMessage.contains("valid_to"))
    // pre-1678 is equally unrepresentable in datetime64[ns]
    val low = Seq("1600-01-01 00:00:00").toDF("s")
      .select(col("s").cast("timestamp").as("t"))
    assert(OracleSurfaceLint.outOfRangeTimestamps(low).map(_._1) == Seq("t"))
  }

  test("rule 2: in-range timestamps and all-NULL columns pass") {
    import spark.implicits._
    val ok = Seq(Some("1995-03-04 05:06:07"), None).toDF("s")
      .select(col("s").cast("timestamp").as("t"))
    assert(OracleSurfaceLint.outOfRangeTimestamps(ok).isEmpty)
    OracleSurfaceLint.check("ok", ok, ok)
  }

  test("rule 3: a planted beyond-2^53 decimal is caught; in-range passes") {
    import spark.implicits._
    // 2^53 + 1 = 9007199254740993 — the first integer float64 cannot hold
    val bad = Seq("9007199254740993", "12.5").toDF("s")
      .select(col("s").cast("decimal(38,0)").as("total"))
    assert(OracleSurfaceLint.overflowingDecimals(bad).map(_._1) ==
      Seq("total"))
    val e = intercept[IllegalArgumentException] {
      OracleSurfaceLint.check("planted", bad.limit(0), bad)
    }
    assert(e.getMessage.contains("total"))
    // a fractional decimal is held to the same UNSCALED-significand bar:
    // 90071992547409.93 at scale 2 has unscaled 2^53 + 1
    val frac = Seq("90071992547409.93").toDF("s")
      .select(col("s").cast("decimal(38,2)").as("v"))
    assert(OracleSurfaceLint.overflowingDecimals(frac).map(_._1) == Seq("v"))
    // in-range decimals and all-NULL columns pass
    val ok = Seq(Some("9007199254740992"), None).toDF("s")
      .select(col("s").cast("decimal(38,0)").as("total"))
    assert(OracleSurfaceLint.overflowingDecimals(ok).isEmpty)
    OracleSurfaceLint.check("ok", ok.limit(0), ok)
  }

  test("the flagship entry point answers the driver's smoke check") {
    // The driver calls SparkEntry.entry(spark) on sf0.001 and requires
    // rows > 0 — the one contract point no other spec exercised.
    try assert(SparkEntry.entry(spark).count() > 0L,
      "entry() must return rows on sf0.001")
    finally graft.queries.QuerySpec.releaseStaged()
  }

  test("every declared query carries a DuckDB oracle (0 rows-only)") {
    val rowsOnly = SparkEntry.allQueries.filter(_.oracle.isEmpty).map(_.name)
    assert(rowsOnly.isEmpty,
      s"rows-only queries get the driver's weakest check: $rowsOnly")
    // and names are unique — a duplicate would shadow in the driver maps
    val dup = SparkEntry.allQueries.groupBy(_.name).filter(_._2.size > 1).keys
    assert(dup.isEmpty, s"duplicate query names: $dup")
  }

  test("the whole declared surface passes rule 1 (no silent builder skips)") {
    // Rule 1 needs only the analyzed schema. Several builders DO run
    // bounded actions (median histograms, model totals, the MMR
    // window), so this is not free — but a builder that THROWS must
    // fail the test, not silently skip its lint (round-9 review nit:
    // a swallowed exception made the coverage claim vacuous for
    // exactly the queries most likely to regress).
    val sf = "/root/testdata/sf0.001"
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    val offending = SparkEntry.allQueries.flatMap { q =>
      val bad =
        try OracleSurfaceLint.nonScalarColumns(q.fn(spark, sf))
        catch {
          case e: Throwable =>
            failures += s"${q.name}: ${e.getClass.getSimpleName}"
            Nil
        }
      if (bad.isEmpty) Nil else Seq(q.name -> bad)
    }
    graft.queries.QuerySpec.releaseStaged()
    assert(offending.isEmpty,
      s"declared queries with non-scalar surfaces: $offending")
    assert(failures.isEmpty,
      s"builders threw (their lint coverage is unknown): $failures")
  }
}
