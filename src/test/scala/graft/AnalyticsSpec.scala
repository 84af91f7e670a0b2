package graft

import org.apache.spark.sql.functions._

import graft.queries.QuerySpec

/** Local contracts for the product-analytics family: the funnel's greedy
  * earliest-chain semantics, the retention triangle, and the IVM
  * merge-equals-rebuild identity, each replayed in plain Scala at
  * sf0.001. The DuckDB gate re-checks all three cross-engine. */
class AnalyticsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) =
    try {
      SparkEntry.allQueries.find(_.name == name)
        .getOrElse(fail(s"no query named $name")).fn(spark, sf).collect()
    } finally QuerySpec.releaseStaged()

  private lazy val events: Array[(Long, String, Long, Long)] =
    graft.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")),
        floor(col("value") * 1000).cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))

  test("funnel_conversion: greedy earliest chains, monotone step counts") {
    val got = run("funnel_conversion")
      .map(r => r.getInt(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    val funnel = Seq("signup", "view", "click", "purchase")
    val byUser = events.groupBy(_._1)
    // replay the chain per user
    val chains = byUser.values.map { rows =>
      var t = Long.MinValue
      var t1 = 0L
      val reached = Array.fill(4)(false)
      val lags = Array.fill(4)(0L)
      funnel.indices.foreach { i =>
        val nxt = rows.filter(r => r._2 == funnel(i) &&
          (if (i == 0) true else r._3 > t))
        if (nxt.nonEmpty && (i == 0 || reached(i - 1))) {
          t = nxt.map(_._3).min
          if (i == 0) t1 = t
          reached(i) = true
          lags(i) = t - t1
        }
      }
      (reached, lags)
    }.toSeq
    funnel.indices.foreach { i =>
      val n = chains.count(_._1(i))
      val lag = chains.filter(_._1(i)).map(_._2(i)).sum
      assert(got(i + 1) == ((funnel(i), n.toLong, lag)),
        s"step ${funnel(i)}: expected ($n, $lag), got ${got(i + 1)}")
    }
    // funnel counts can only shrink step to step
    assert((1 to 3).forall(k => got(k)._2 >= got(k + 1)._2))
  }

  test("retention_cohorts: day-0 actives equal cohort sizes; triangle matches replay") {
    val got = run("retention_cohorts")
      .map(r => (r.getTimestamp(0).getTime, r.getInt(1)) -> r.getLong(2)).toMap
    val DayUs = 86400000000L
    val firstDay = events.groupBy(_._1).view
      .mapValues(rows => rows.map(_._3).min / DayUs).toMap
    val want = events.map(r => (r._1, r._3 / DayUs)).distinct
      .groupBy { case (u, d) => (firstDay(u) * DayUs / 1000, (d - firstDay(u)).toInt) }
      .view.mapValues(_.length.toLong).toMap
    assert(got == want)
    // day-0 count per cohort == number of users first seen that day
    val cohortSizes = firstDay.values.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    cohortSizes.foreach { case (d, n) =>
      assert(got((d * DayUs / 1000, 0)) == n)
    }
  }

  test("event_attribution: purchases credited to the latest preceding touch") {
    val got = run("event_attribution")
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val touches = Set("click", "view", "signup")
    val ev = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")),
        col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val credited = ev.groupBy(_._1).values.toSeq.flatMap { rows =>
      val ord = rows.sortBy(r => (r._3, r._4))
      ord.indices.collect { case i if ord(i)._2 == "purchase" =>
        ord.take(i).filter(r => touches(r._2))
          .lastOption.map(_._2).getOrElse("direct")
      }
    }
    val want = credited.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got == want)
  }

  test("ivm_agg: old+delta merge equals the one-shot rebuild") {
    val q = SparkEntry.allQueries.find(_.name == "ivm_agg").get
    val inc = q.fn(spark, sf)
    val full = graft.Tables.events(spark, sf)
      .select(col("event_type").as("slice"),
        date_trunc("day", col("ts")).as("day"),
        floor(col("value") * 1000).cast("long").as("v"))
      .groupBy("slice", "day")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("vsum"),
        min(col("v")).as("vmin"), max(col("v")).as("vmax"))
    assert(inc.exceptAll(full).isEmpty && full.exceptAll(inc).isEmpty)
    QuerySpec.releaseStaged()
  }
}
