package graft

import org.apache.spark.sql.functions._

import graft.queries.{QuerySpec, WarehouseQueries}

/** Local contracts for the warehouse-maintenance family: SCD2 store
  * invariants + incremental-equals-rebuild, the recursive CTE's closed-form
  * chain arithmetic, lateral top-n vs a locally computed selection, and the
  * integer EWMA / z-score recurrences recomputed in plain Scala. The DuckDB
  * gate re-checks all of these cross-engine; these specs keep the
  * invariants pinned at dev time with explainable failures. */
class WarehouseSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) =
    try {
      SparkEntry.allQueries.find(_.name == name)
        .getOrElse(fail(s"no query named $name")).fn(spark, sf).collect()
    } finally QuerySpec.releaseStaged()

  test("scd2_upsert: one current row per key, gap-free non-overlapping chains") {
    val rows = run("scd2_upsert")
    val byKey = rows.groupBy(_.getLong(0))
    // every customer key appears, exactly one open row each
    assert(byKey.forall { case (_, vs) => vs.count(_.getBoolean(4)) == 1 })
    byKey.foreach { case (k, vs) =>
      val chain = vs.sortBy(_.getTimestamp(2).getTime)
      chain.sliding(2).foreach {
        case Array(a, b) =>
          // consecutive versions abut exactly: valid_to(i) == valid_from(i+1)
          assert(a.getTimestamp(3) == b.getTimestamp(2),
            s"key $k: chain must abut, got ${a.getTimestamp(3)} vs ${b.getTimestamp(2)}")
        case _ => ()
      }
      // the open row carries a NULL valid_to (year-9999 sentinels are
      // unrepresentable in the driver comparator's datetime64[ns])
      assert(chain.last.isNullAt(3))
    }
  }

  test("scd2_upsert: incremental merge equals the one-shot rebuild") {
    import org.apache.spark.sql.expressions.Window
    val q = SparkEntry.allQueries.find(_.name == "scd2_upsert").get
    val inc = q.fn(spark, sf)
    // one-shot: full history through a single lead() window
    val chg = graft.Tables.orders(spark, sf)
      .groupBy(col("o_custkey").as("custkey"), col("o_orderdate").as("vf"))
      .agg(max_by(col("o_orderpriority"), col("o_orderkey")).as("attr"))
    val init = graft.Tables.customer(spark, sf).select(
      col("c_custkey").as("custkey"),
      expr(s"TIMESTAMP '${WarehouseQueries.Scd2Epoch}'").as("vf"),
      col("c_mktsegment").as("attr"))
    val full = init.unionByName(chg)
      .withColumn("vt",
        lead(col("vf"), 1).over(Window.partitionBy("custkey").orderBy("vf")))
      .select(col("custkey"), col("attr"), col("vf").as("valid_from"),
        col("vt").as("valid_to"),
        col("vt").isNull.as("is_current"))
    assert(inc.exceptAll(full).isEmpty && full.exceptAll(inc).isEmpty)
    QuerySpec.releaseStaged()
  }

  test("recursive_cte: halving chains match the closed form per supplier") {
    val rows = run("recursive_cte").map(r =>
      r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getLong(3)))).toMap
    val keys = graft.Tables.supplier(spark, sf)
      .select("s_suppkey").collect().map(_.getLong(0))
    assert(rows.keySet == keys.toSet)
    keys.foreach { k =>
      var (a, depth, sum) = (k, 0, k)
      while (a > 1) { a /= 2; depth += 1; sum += a }
      assert(rows(k) == ((depth, depth.toLong + 1, sum)),
        s"supplier $k: expected (depth=$depth, n=${depth + 1}, sum=$sum), got ${rows(k)}")
    }
  }

  test("lateral_topn: per-nation rows equal the locally computed top-3") {
    val got = run("lateral_topn")
      .map(r => (r.getInt(0), r.getLong(2), r.getLong(3)))
      .groupBy(_._1).view.mapValues(_.map(v => (v._2, v._3)).toSet).toMap
    val cust = graft.Tables.customer(spark, sf)
      .select(col("c_nationkey"), col("c_custkey"),
        floor(col("c_acctbal") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val want = cust.groupBy(_._1).view.mapValues(
      _.sortBy(v => (-v._3, v._2)).take(3).map(v => (v._2, v._3)).toSet).toMap
    // nations with zero customers simply don't appear (inner lateral)
    assert(got == want.filter(_._2.nonEmpty))
  }

  test("snapshot_cdc: I rows are new keys, U rows changed attrs, nothing else") {
    val rows = run("snapshot_cdc")
    val split = expr(
      s"TIMESTAMP '${graft.queries.WarehouseQueries.Scd2Split}'")
    val chgDf = graft.Tables.orders(spark, sf)
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max_by(col("o_orderpriority"), col("o_orderkey")).as("attr"))
    def snap(df: org.apache.spark.sql.DataFrame) =
      df.select(col("o_custkey"),
        unix_micros(col("o_orderdate").cast("timestamp")), col("attr"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        .groupBy(_._1).view.mapValues(v => v.maxBy(_._2)._3).toMap
    val s1 = snap(chgDf.filter(col("o_orderdate") < split))
    val s2 = snap(chgDf)
    val want = s2.flatMap { case (k, attr) =>
      s1.get(k) match {
        case None => Some((k, "I", null, attr))
        case Some(old) if old != attr => Some((k, "U", old, attr))
        case _ => None
      }
    }.toSet
    val got = rows.map(r =>
      (r.getLong(0), r.getString(1), r.getString(2), r.getString(3))).toSet
    assert(got == want)
    assert(got.exists(_._2 == "U"),
      "the split must exercise the update regime")
    // The insert regime (a key whose FIRST change is post-split) only
    // materializes from sf0.01 up (9 keys there — the oracle gate covers
    // it); sf0.001's 150 customers all order before 1999.
  }

  test("ts_ewma: the fold matches the per-user integer recurrence") {
    val got = run("ts_ewma")
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val ev = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"),
        floor(col("value") * 1000).cast("long").as("v"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2), r.getLong(3)))
    val want = ev.groupBy(_._1).map { case (u, rows) =>
      val vs = rows.sortBy(r => (r._2, r._3)).map(_._4)
      u -> ((vs.length.toLong, vs.tail.foldLeft(vs.head)((e, v) => (e + v) >> 1)))
    }
    assert(got == want)
  }

  test("anomaly_zscore: integer z-flags match a local replay") {
    val got = run("anomaly_zscore")
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val ev = graft.Tables.events(spark, sf)
      .select(col("event_type"), col("ts"), col("event_id"),
        floor(col("value") * 1000).cast("long").as("v"))
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2), r.getLong(3)))
    val want = ev.groupBy(_._1).map { case (slice, rows) =>
      val ord = rows.sortBy(r => (r._2, r._3))
      var (nAnom, idSum) = (0L, 0L)
      ord.indices.foreach { i =>
        val w = ord.slice(math.max(0, i - 9), i + 1)
        val n = w.length.toLong
        val s = w.map(_._4).sum
        val q = w.map(x => x._4 * x._4).sum
        val v = ord(i)._4
        if (n >= 5 && (v * n - s) * (v * n - s) > 9 * (n * q - s * s)) {
          nAnom += 1; idSum += ord(i)._3
        }
      }
      slice -> ((ord.length.toLong, nAnom, idSum))
    }
    assert(got == want)
  }

  test("sketch_cms: every contract boolean holds at sf0.001") {
    val rows = run("sketch_cms")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(2), s"${r.getString(0)}: est must be >= exact")
      assert(r.getBoolean(3), s"${r.getString(0)}: est must be within eps*N")
      assert(r.getBoolean(4), s"${r.getString(0)}: daily-merged must equal direct")
    }
  }
}
