package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, Expression, GenericInternalRow, JoinedRow,
  RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.classic.GraftExpressionBridge
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Whole-operator as-of join — SURVEY §4.3 path (c), the one extension
  * class the library's native expressions/generators/aggregates don't
  * cover: a custom `LogicalPlan` + `SparkStrategy` + `SparkPlan`
  * (planner-injected), for semantics Spark's built-in joins can't state
  * directly (reference analogue: the prior-sample alignment the KPI
  * pipeline performs when folding per-flow series onto slice timelines,
  * `PcapKpiExtractor.scala`'s slice/timestamp bucketing — generalized to
  * the pandas `merge_asof(direction="backward")` contract).
  *
  * Semantics (left outer, both directions): for each left row, the single
  * right row sharing its equi-key with — backward (`forward = false`) —
  * the LARGEST right time ≤ the left row's time (sort-order-last among
  * right rows tied on that time), or — forward (`forward = true`) — the
  * SMALLEST right time ≥ the left row's time (sort-order-first among
  * ties); unmatched left rows keep nulls. Equality keys compare by
  * Catalyst's natural ordering; null keys and null times never match.
  *
  * Physical contract (`AsOfJoinExec`): children hash-clustered on their
  * keys and sorted within partitions by (keys, time) — declared via
  * `requiredChildDistribution`/`requiredChildOrdering`, so Catalyst's
  * `EnsureRequirements` plants exactly one exchange per side (or none,
  * when an upstream bucketing/aggregate already satisfies it) plus the
  * two sorts, and AQE re-plans them like any shuffled join. Execution is
  * a streaming two-pointer merge per co-partition: O(1) state (one
  * candidate row), zero buffering, no candidate-pair explosion — the
  * shape a 100 TB as-of needs, vs the binned-range-join composition
  * (candidate multiplication) or the tagged-union window (full-partition
  * window buffers, single serial pass per key set). The composed route
  * remains `join_asof` in `RelationalQueries`; `join_asof_exec` answers
  * the identical query through this operator, bit-checked against the
  * same DuckDB `ASOF LEFT JOIN` oracle.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    forward: Boolean) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner rule: `AsOfJoinPlan` → `AsOfJoinExec`. Injected either via
  * `spark.sql.extensions=graft.GraftExtensions` or lazily by
  * [[AsOf.joinBackward]] through `experimentalMethods.extraStrategies`
  * (idempotent — it's a case object, `contains` dedups). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, fwd) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, fwd) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    forward: Boolean) extends BinaryExecNode {

  require(leftKeys.map(_.dataType) == rightKeys.map(_.dataType),
    "as-of join keys must agree in type on both sides")
  require(Seq(leftTime, rightTime).forall(t =>
    Seq(TimestampType, TimestampNTZType, LongType).contains(t.dataType)),
    "as-of time columns must be timestamp or long (µs-comparable)")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "number of matched rows"))

  // One hash exchange per side (elided when already satisfied), same
  // co-partitioning machinery as SortMergeJoinExec.
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  // The merge emits left rows in their incoming order within unchanged
  // partitions: left's partitioning and ordering survive.
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    val lOut = left.output
    val rOut = right.output
    val lk = leftKeys
    val rk = rightKeys
    val lt = leftTime
    val rt = rightTime
    val fwd = forward
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // Bind per partition: UnsafeProjections are not thread/host-safe
      // to ship pre-built.
      val lKeyProj = UnsafeProjection.create(lk, lOut)
      val rKeyProj = UnsafeProjection.create(rk, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lt), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rt), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lk.map(_.dataType))
      val nullRight = new GenericInternalRow(rOut.length)
      val joined = new JoinedRow
      // Downstream operators (exchange, collect, aggregate-without-
      // project) require UnsafeRow output — a bare JoinedRow class-casts
      // at the first getByteArrayRdd. Same resultProj discipline as
      // SortMergeJoinExec.
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)

      new Iterator[InternalRow] {
        // Lookahead right row (not yet consumed into the candidate).
        private var rRow: InternalRow = _
        private var rKey: InternalRow = _ // projection buffer, valid till advance
        private var rTimeNull = true
        private var rTime = 0L
        // Last right row proven ≤ some left time for candKey (owned copies).
        private var cand: InternalRow = _
        private var candKey: InternalRow = _

        private def advanceRight(): Unit =
          if (rIter.hasNext) {
            rRow = rIter.next()
            rKey = rKeyProj(rRow)
            val t = rTimeProj(rRow)
            rTimeNull = t.isNullAt(0)
            rTime = if (rTimeNull) 0L else t.getLong(0)
          } else { rRow = null; rKey = null }
        advanceRight()

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyProj(l)
          numOutputRows += 1
          if (lKey.anyNull) {
            // Null keys never match; null-key lefts sort first, so the
            // right cursor hasn't moved past anything they could need.
            resultProj(joined(l, nullRight))
          } else {
            val ltRow = lTimeProj(l)
            val lTimeNull = ltRow.isNullAt(0)
            val lTime = if (lTimeNull) 0L else ltRow.getLong(0)
            if (cand != null && keyOrd.compare(candKey, lKey) != 0) {
              cand = null; candKey = null
            }
            var done = false
            while (!done && rRow != null) {
              if (rKey.anyNull) advanceRight() // unmatchable, sorted first
              else {
                val c = keyOrd.compare(rKey, lKey)
                if (c < 0) advanceRight() // key exhausted, drop through
                else if (c > 0) done = true // right ahead: keep for later lefts
                else if (rTimeNull) advanceRight() // unmatchable, sorted first
                else if (lTimeNull) done = true // null left time never matches
                else if (fwd) {
                  // Forward: drop rights strictly before me (later lefts
                  // have time ≥ mine, so they can't want them either); the
                  // first right at/after me IS the match — keep it as the
                  // unconsumed lookahead, later lefts may share it.
                  if (rTime < lTime) advanceRight() else done = true
                } else if (rTime <= lTime) {
                  // New best backward match; later equal-or-earlier-time
                  // rights keep replacing it → sort-order-last tie-break.
                  cand = rRow.copy(); candKey = rKey.copy()
                  advanceRight()
                } else done = true // right is in this key's future
              }
            }
            if (fwd) {
              if (rRow != null && !lTimeNull && !rTimeNull && !rKey.anyNull &&
                  keyOrd.compare(rKey, lKey) == 0 && rTime >= lTime) {
                numMatched += 1
                resultProj(joined(l, rRow))
              } else resultProj(joined(l, nullRight))
            } else if (cand != null && !lTimeNull) {
              numMatched += 1
              resultProj(joined(l, cand))
            } else resultProj(joined(l, nullRight))
          }
        }
      }
    }
  }
}

/** DataFrame-level API over [[AsOfJoinPlan]] (the reference's users call
  * as-of through a library function, not SQL). Column names must be
  * disjoint across sides; each side is re-aliased so self-joins off one
  * source table get fresh attribute ids. */
object AsOf {
  import org.apache.spark.sql.functions.col

  /** Left-outer backward as-of join: each left row picks the right row
    * with equal `on` keys and the largest `rightTimeCol` ≤ its
    * `leftTimeCol` (ties: last in (keys, time) sort order). */
  def joinBackward(
      left: DataFrame, right: DataFrame,
      leftOn: Seq[String], rightOn: Seq[String],
      leftTimeCol: String, rightTimeCol: String): DataFrame =
    join(left, right, leftOn, rightOn, leftTimeCol, rightTimeCol,
      forward = false)

  /** Left-outer forward as-of join: each left row picks the right row
    * with equal `on` keys and the smallest `rightTimeCol` ≥ its
    * `leftTimeCol` (ties: first in (keys, time) sort order). */
  def joinForward(
      left: DataFrame, right: DataFrame,
      leftOn: Seq[String], rightOn: Seq[String],
      leftTimeCol: String, rightTimeCol: String): DataFrame =
    join(left, right, leftOn, rightOn, leftTimeCol, rightTimeCol,
      forward = true)

  private def join(
      left: DataFrame, right: DataFrame,
      leftOn: Seq[String], rightOn: Seq[String],
      leftTimeCol: String, rightTimeCol: String,
      forward: Boolean): DataFrame = {
    require(leftOn.size == rightOn.size && leftOn.nonEmpty,
      "as-of join needs one or more equality key pairs")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty,
      s"as-of join requires disjoint column names; rename ${overlap.mkString(", ")}")
    val spark = left.sparkSession
    ensureStrategy(spark)
    // Alias every column: fresh exprIds per side even when both frames
    // derive from one scan (Alias always mints a new id).
    def realias(df: DataFrame): LogicalPlan =
      df.select(df.columns.toIndexedSeq.map(n => col(n).as(n)): _*)
        .queryExecution.analyzed
    val la = realias(left)
    val ra = realias(right)
    def attr(out: Seq[Attribute], n: String, side: String): Attribute =
      out.find(_.name == n).getOrElse(throw new IllegalArgumentException(
        s"as-of $side column '$n' not in [${out.map(_.name).mkString(", ")}]"))
    // Same strictness as the SQL route's AsOfMark.checkInputDataTypes:
    // the ordering comparison is only meaningful over ONE type — a
    // Timestamp/Long mix would silently compare epoch-micros to raw longs.
    val lt = attr(la.output, leftTimeCol, "left")
    val rt = attr(ra.output, rightTimeCol, "right")
    require(lt.dataType == rt.dataType,
      s"as-of time columns must share a type; got $leftTimeCol: " +
        s"${lt.dataType.simpleString} vs $rightTimeCol: ${rt.dataType.simpleString}")
    leftOn.zip(rightOn).foreach { case (l, r) =>
      val (lk, rk) = (attr(la.output, l, "left"), attr(ra.output, r, "right"))
      require(lk.dataType == rk.dataType,
        s"as-of key pair ($l, $r) must share a type; got " +
          s"${lk.dataType.simpleString} vs ${rk.dataType.simpleString}")
    }
    GraftExpressionBridge.ofRows(spark, AsOfJoinPlan(
      la, ra,
      leftOn.map(attr(la.output, _, "left")),
      rightOn.map(attr(ra.output, _, "right")),
      lt, rt,
      forward))
  }

  /** Install [[AsOfJoinStrategy]] on a live session (idempotent). */
  def ensureStrategy(spark: SparkSession): Unit = {
    val em = spark.sessionState.experimentalMethods
    if (!em.extraStrategies.contains(AsOfJoinStrategy))
      em.extraStrategies = em.extraStrategies :+ AsOfJoinStrategy
  }

  /** Install [[AsOfJoinRewrite]] (the SQL-route marked-join rewrite) on a
    * live session (idempotent) — the `experimentalMethods` twin of the
    * extensions class's `injectOptimizerRule`. */
  def ensureRewrite(spark: SparkSession): Unit = {
    val em = spark.sessionState.experimentalMethods
    if (!em.extraOptimizations.contains(AsOfJoinRewrite))
      em.extraOptimizations = em.extraOptimizations :+ AsOfJoinRewrite
  }
}
