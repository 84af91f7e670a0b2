package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.GraftExtensions
import graft.plans.AsOf
import graft.queries.QuerySpec

/** The whole-operator as-of join ([[graft.plans.AsOfJoinExec]]):
  * pandas-`merge_asof(direction="backward")` semantics pinned on hand
  * datasets (backward pick, null keys/times, unmatched lefts, multi-key),
  * route equivalence against the tagged-union window composition
  * (`join_asof`), and the plan shape the operator exists for — the custom
  * exec node planning in with NO window buffers and the two
  * EnsureRequirements exchanges a shuffled join needs. */
class AsOfJoinSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def leftDf: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, "u1", ts("2024-01-01 00:00:10")),
      (2L, "u1", ts("2024-01-01 00:00:20")),
      (3L, "u2", ts("2024-01-01 00:00:05")),
      (4L, "u3", ts("2024-01-01 00:00:30")),
      (5L, null.asInstanceOf[String], ts("2024-01-01 00:00:30"))
    ).toDF("id", "user", "t")
  }

  private def rightDf: DataFrame = {
    import spark.implicits._
    Seq(
      (100L, "u1", ts("2024-01-01 00:00:08")),
      (101L, "u1", ts("2024-01-01 00:00:15")),
      (102L, "u1", ts("2024-01-01 00:00:25")), // future of every u1 left
      (103L, "u2", ts("2024-01-01 00:00:06")), // future of the only u2 left
      (104L, "u4", ts("2024-01-01 00:00:01")), // key with no left rows
      (105L, "u1", null.asInstanceOf[Timestamp]) // null time never matches
    ).toDF("rid", "r_user", "r_t")
  }

  private def run(l: DataFrame, r: DataFrame): Map[Long, Option[Long]] =
    AsOf.joinBackward(l, r, Seq("user"), Seq("r_user"), "t", "r_t")
      .select("id", "rid").collect()
      .map(row => row.getLong(0) ->
        (if (row.isNullAt(1)) None else Some(row.getLong(1)))).toMap

  test("backward pick: largest right time <= left time, per key") {
    val got = run(leftDf, rightDf)
    assert(got === Map(
      1L -> Some(100L), // 00:08 <= 00:10 < 00:15
      2L -> Some(101L), // 00:15 <= 00:20 < 00:25
      3L -> None, // only u2 right is in the future
      4L -> None, // no u3 rights
      5L -> None // null key never matches
    ))
  }

  test("null right times and unmatched right keys are ignored; empty right") {
    import spark.implicits._
    val emptyR = rightDf.filter(lit(false))
    assert(run(leftDf, emptyR).values.forall(_.isEmpty))
    // Only the null-time u1 row on the right: nothing can match.
    val nullOnly = rightDf.filter(col("rid") === 105L)
    assert(run(leftDf, nullOnly).values.forall(_.isEmpty))
    // Null left time never matches even when rights exist.
    val nullT = Seq((9L, "u1", null.asInstanceOf[Timestamp])).toDF("id", "user", "t")
    assert(run(nullT, rightDf) === Map(9L -> None))
  }

  test("exact time equality matches (>= not >)") {
    import spark.implicits._
    val l = Seq((1L, "u1", ts("2024-01-01 00:00:15"))).toDF("id", "user", "t")
    assert(run(l, rightDf) === Map(1L -> Some(101L)))
  }

  private def runFwd(l: DataFrame, r: DataFrame): Map[Long, Option[Long]] =
    AsOf.joinForward(l, r, Seq("user"), Seq("r_user"), "t", "r_t")
      .select("id", "rid").collect()
      .map(row => row.getLong(0) ->
        (if (row.isNullAt(1)) None else Some(row.getLong(1)))).toMap

  test("forward pick: smallest right time >= left time, per key") {
    val got = runFwd(leftDf, rightDf)
    assert(got === Map(
      1L -> Some(101L), // 00:10 → next u1 click 00:15
      2L -> Some(102L), // 00:20 → next u1 click 00:25
      3L -> Some(103L), // 00:05 → next u2 click 00:06
      4L -> None, // no u3 rights
      5L -> None // null key never matches
    ))
  }

  test("forward: inclusive equality, and one lookahead shared by many lefts") {
    import spark.implicits._
    val l = Seq(
      (1L, "u1", ts("2024-01-01 00:00:15")), // == right 101 exactly
      (2L, "u1", ts("2024-01-01 00:00:16")),
      (3L, "u1", ts("2024-01-01 00:00:17")), // both also land on 102? no: 101 is past → 102
      (4L, "u1", ts("2024-01-01 00:00:26")) // past the last right
    ).toDF("id", "user", "t")
    assert(runFwd(l, rightDf) === Map(
      1L -> Some(101L), 2L -> Some(102L), 3L -> Some(102L), 4L -> None))
    // Null left time never forward-matches.
    val nullT = Seq((9L, "u1", null.asInstanceOf[Timestamp])).toDF("id", "user", "t")
    assert(runFwd(nullT, rightDf) === Map(9L -> None))
  }

  test("multi-key equality: both keys must agree") {
    import spark.implicits._
    val l = Seq(
      (1L, "a", 1L, ts("2024-01-01 00:01:00")),
      (2L, "a", 2L, ts("2024-01-01 00:01:00"))
    ).toDF("id", "k1", "k2", "t")
    val r = Seq(
      (10L, "a", 1L, ts("2024-01-01 00:00:30")),
      (11L, "a", 2L, ts("2024-01-01 00:00:40"))
    ).toDF("rid", "rk1", "rk2", "r_t")
    val got = AsOf.joinBackward(l, r, Seq("k1", "k2"), Seq("rk1", "rk2"), "t", "r_t")
      .select("id", "rid").collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(got === Map(1L -> 10L, 2L -> 11L))
  }

  test("self-source frames: disjoint-name aliasing mints fresh attribute ids") {
    import spark.implicits._
    val base = Seq(("u1", 1L, 100L), ("u1", 2L, 200L)).toDF("u", "seq", "v")
    val l = base.select(col("u"), col("seq").as("t"), col("v").as("lv"))
    val r = base.select(col("u").as("ru"), col("seq").as("rt"), col("v").as("rv"))
    val out = AsOf.joinBackward(l, r, Seq("u"), Seq("ru"), "t", "rt")
      .select("t", "rv").collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(out === Map(1L -> 100L, 2L -> 200L))
  }

  test("column-name overlap is rejected, missing columns named in the error") {
    val err = intercept[IllegalArgumentException] {
      AsOf.joinBackward(leftDf, leftDf, Seq("user"), Seq("user"), "t", "t")
    }
    assert(err.getMessage.contains("disjoint"))
    val err2 = intercept[IllegalArgumentException] {
      AsOf.joinBackward(leftDf, rightDf, Seq("user"), Seq("nope"), "t", "r_t")
    }
    assert(err2.getMessage.contains("nope"))
  }

  test("time and key columns must share a type (DataFrame route = SQL route strictness)") {
    import spark.implicits._
    // Timestamp left vs BIGINT right: epoch-micros-vs-raw-long comparison
    // would be silently wrong — must be rejected at planning, exactly as
    // AsOfMark.checkInputDataTypes rejects it on the SQL route.
    val rLong = Seq((100L, "u1", 8L)).toDF("rid", "r_user", "r_t")
    val e1 = intercept[IllegalArgumentException] {
      AsOf.joinBackward(leftDf, rLong, Seq("user"), Seq("r_user"), "t", "r_t")
    }
    assert(e1.getMessage.contains("share a type"))
    // Mismatched equality-key types are rejected too.
    val rKeyInt = Seq((100L, 1L, ts("2024-01-01 00:00:08")))
      .toDF("rid", "r_user", "r_t")
    val e2 = intercept[IllegalArgumentException] {
      AsOf.joinBackward(leftDf, rKeyInt, Seq("user"), Seq("r_user"), "t", "r_t")
    }
    assert(e2.getMessage.contains("share a type"))
  }

  test("route equivalence: join_asof_exec == join_asof (composed window route)") {
    def rows(name: String): Set[String] =
      try {
        val q = SparkEntry.allQueries.find(_.name == name)
          .getOrElse(fail(s"no query named $name"))
        q.fn(spark, sf).collect().map(_.toString).toSet
      } finally QuerySpec.releaseStaged()
    val exec = rows("join_asof_exec")
    val composed = rows("join_asof")
    assert(exec.nonEmpty && exec === composed)
  }

  test("sql route: the marked LEFT JOIN rewrites into the custom exec") {
    try {
      for (name <- Seq("sql_join_asof_exec", "sql_join_asof_fwd_exec")) {
        val q = SparkEntry.allQueries.find(_.name == name)
          .getOrElse(fail(s"no query named $name"))
        val plan = q.fn(spark, sf).queryExecution.executedPlan.toString
        assert(plan.contains("AsOfJoin"),
          s"$name: AsOfJoinRewrite must fire on the marked join; got:\n$plan")
        assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin")
            && !plan.contains("BroadcastNestedLoopJoin") && !plan.contains("Window"),
          s"$name must not fall back to a generic join or window route")
      }
    } finally QuerySpec.releaseStaged()
  }

  test("unrewritable marked join degrades to the bare range predicate") {
    GraftExtensions.register(spark)
    leftDf.createOrReplaceTempView("asof_deg_l")
    rightDf.createOrReplaceTempView("asof_deg_r")
    // No equi conjunct → AsOfJoinRewrite declines → plain left range join:
    // EVERY right row with r_t <= t pairs up (not just the latest).
    val got = spark.sql(
      """SELECT id, rid FROM asof_deg_l l LEFT JOIN asof_deg_r r
        |  ON l.user = r.r_user AND l.t >= r.r_t AND 1 = 1
        |     AND asof_backward(l.t, l.t)""".stripMargin)
    // marker args both from the left side → sides not cleanly split →
    // rewrite declines; asof_backward(t, t) evaluates true, so the rows
    // are the plain range join's.
    val expect = spark.sql(
      """SELECT id, rid FROM asof_deg_l l LEFT JOIN asof_deg_r r
        |  ON l.user = r.r_user AND l.t >= r.r_t""".stripMargin)
    assert(got.collect().map(_.toString).sorted.toSeq ===
      expect.collect().map(_.toString).sorted.toSeq)
    assert(!got.queryExecution.executedPlan.toString.contains("AsOfJoin"),
      "a marker whose sides don't split left/right must not rewrite")
  }

  test("exec metrics: numOutputRows counts lefts, numMatched the joined ones") {
    val df = AsOf.joinBackward(leftDf, rightDf,
      Seq("user"), Seq("r_user"), "t", "r_t")
    df.collect()
    def find(p: org.apache.spark.sql.execution.SparkPlan)
        : Option[graft.plans.AsOfJoinExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        find(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        find(q.plan)
      case x: graft.plans.AsOfJoinExec => Some(x)
      case other => other.children.view.flatMap(find).headOption
    }
    val exec = find(df.queryExecution.executedPlan)
      .getOrElse(fail("no AsOfJoinExec in the executed plan"))
    assert(exec.metrics("numOutputRows").value === 5L) // every left row
    assert(exec.metrics("numMatched").value === 2L) // ids 1 and 2 only
  }

  test("plan shape: AsOfJoinExec node, no window buffers, shuffled-join exchanges") {
    try {
      val q = SparkEntry.allQueries.find(_.name == "join_asof_exec").get
      val plan = q.fn(spark, sf).queryExecution.executedPlan.toString
      assert(plan.contains("AsOfJoin"),
        s"the custom exec must plan in via AsOfJoinStrategy; got:\n$plan")
      assert(!plan.contains("Window"),
        "the whole point: no full-partition window buffers on this route")
      assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
        "the as-of must not decompose into a generic join + post-filter")
    } finally QuerySpec.releaseStaged()
  }
}
