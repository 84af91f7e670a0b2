package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{
  BinaryExpression, EqualTo, Expression, GreaterThanOrEqual, LessThanOrEqual,
  Predicate, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.LeftOuter
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** SQL-surface marker for the as-of join (the parser route into
  * [[AsOfJoinExec]]): `asof_backward(l_time, r_time)` /
  * `asof_forward(l_time, r_time)` written as a LEFT JOIN conjunct —
  *
  * {{{
  *   FROM errs e LEFT JOIN clicks c
  *     ON e.user_id = c.r_user_id AND asof_backward(e.ts, c.r_ts)
  * }}}
  *
  * — is DuckDB's `ASOF LEFT JOIN … ON e.user_id = c.r_user_id AND
  * e.ts >= c.r_ts` with the direction carried by the function name
  * instead of the comparison operator (Spark's parser has no ASOF
  * keyword to extend non-invasively). [[AsOfJoinRewrite]] rewrites the
  * marked join into [[AsOfJoinPlan]]; when the rewrite declines (marker
  * under an OR, no equi-key conjunct, marker sides not cleanly split),
  * the marker DEGRADES to the bare range predicate it names (backward:
  * `l >= r`, forward: `l <= r`) — the query still runs, as the plain
  * range join its syntax reads as, never silently as something else. */
case class AsOfMark(left: Expression, right: Expression, forward: Boolean)
    extends BinaryExpression with Predicate
    with org.apache.spark.internal.Logging {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (l, r) if l == r &&
          Seq(TimestampType, TimestampNTZType, LongType).contains(l) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs two time columns of one type " +
          s"(timestamp, timestamp_ntz or bigint), got $l / $r")
    }

  override def prettyName: String =
    if (forward) "asof_forward" else "asof_backward"

  /** The comparison this marker degrades to when left in place. */
  private lazy val cmp: Expression =
    if (forward) LessThanOrEqual(left, right)
    else GreaterThanOrEqual(left, right)

  /** Degrade signal, AT THE EXECUTION SITE: a rewrite that fires DROPS the
    * marker (AsOfJoinPlan carries only its time expressions), so this
    * expression being asked to eval/codegen proves NO rewrite lifted it —
    * whatever reshaped the plan (marker under an OR, EliminateOuterJoin
    * turning the join inner and pushing the predicate, …). Logged once per
    * marker instance via the lazy val, not once per row/plan pass — the
    * round-14 post-rewrite O(plan) warn traversal re-scanned every
    * expression of every node on every optimizer invocation and duplicated
    * the warning across batches (ADVICE round 14). */
  @transient private lazy val degradeWarned: Boolean = {
    logWarning(
      s"$prettyName marker was NOT rewritten to AsOfJoinExec; it executes " +
        "as the bare range predicate (many-to-many range join, not " +
        "single-match as-of). Provable shape: LEFT OUTER join, condition " +
        "= equi-key conjuncts AND exactly one marker with left/right " +
        "sides from the respective join sides.")
    true
  }

  override def eval(input: InternalRow): Any = {
    val _ = degradeWarned
    cmp.eval(input)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val _ = degradeWarned
    val c = cmp.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AsOfMark =
    copy(left = newLeft, right = newRight)
}

/** `Rule[LogicalPlan]`: a LEFT OUTER join whose condition is
  * `equi-keys AND one AsOfMark` becomes [[AsOfJoinPlan]] (output
  * attributes are identical by construction — left ++ nullable right —
  * so the rewrite is a drop-in node swap). Injected via
  * `spark.sql.extensions` (`injectOptimizerRule`) and, on live sessions,
  * through `experimentalMethods.extraOptimizations`
  * ([[AsOf.ensureRewrite]]) — both run after the main operator batches,
  * where a left-outer join's condition conjuncts are stable (nothing
  * pushes two-sided predicates out of an outer join). Any shape the
  * rewrite can't prove — zero or several marks at the top level, a mark
  * under OR/NOT, a non-equi residual conjunct, mark sides not aligned
  * left-to-left/right-to-right — is left untouched and the marker
  * executes as its bare comparison. */
object AsOfJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  // The degrade signal lives in TWO places, neither costing marker-free
  // plans anything: (1) here, when this rule SEES a marked left-outer
  // join and declines it (shape unprovable — logged at the decline, with
  // the join's shape at hand); (2) in [[AsOfMark.degradeWarned]], when a
  // marker the rule never even saw as a candidate (an earlier rule
  // reshaped the join — e.g. EliminateOuterJoin under a null-rejecting
  // filter) reaches execution as its bare comparison. The round-14
  // post-rewrite warn traversal that re-walked every expression of every
  // node on every apply() is gone (ADVICE round 14: duplicate warnings +
  // O(plan) scans per optimizer pass for queries with no marker at all).
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformUp {
      case j @ Join(_, _, LeftOuter, Some(cond), _)
          if cond.exists(_.isInstanceOf[AsOfMark]) =>
        rewrite(j, cond).getOrElse {
          // Once per join NODE, not per optimizer pass: batches re-invoke
          // this rule on the unchanged plan, and tags survive the
          // optimizer's node copies (copyTagsFrom).
          if (j.getTagValue(DegradeWarnedTag).isEmpty) {
            j.setTagValue(DegradeWarnedTag, true)
            logWarning(
              "as-of marker join was NOT rewritten to AsOfJoinExec (shape " +
                "unprovable: need equi-key conjuncts AND exactly one " +
                "marker with left/right sides from the respective join " +
                "sides); the marker degrades to its bare range predicate " +
                "— a many-to-many range join, not single-match as-of.")
          }
          j
        }
    }

  private val DegradeWarnedTag =
    org.apache.spark.sql.catalyst.trees.TreeNodeTag[Boolean](
      "graft.asof.degradeWarned")

  private def rewrite(j: Join, cond: Expression): Option[AsOfJoinPlan] = {
    val (marks, rest) =
      splitConjunctivePredicates(cond).partition(_.isInstanceOf[AsOfMark])
    marks match {
      case Seq(m: AsOfMark)
          if rest.nonEmpty &&
            rest.forall(c => !c.exists(_.isInstanceOf[AsOfMark])) &&
            m.left.references.subsetOf(j.left.outputSet) &&
            m.right.references.subsetOf(j.right.outputSet) =>
        val keyPairs = rest.map {
          case EqualTo(a, b)
              if a.references.subsetOf(j.left.outputSet) &&
                b.references.subsetOf(j.right.outputSet) => Some((a, b))
          case EqualTo(a, b)
              if b.references.subsetOf(j.left.outputSet) &&
                a.references.subsetOf(j.right.outputSet) => Some((b, a))
          case _ => None
        }
        if (keyPairs.forall(_.isDefined)) {
          val (lk, rk) = keyPairs.flatten.unzip
          Some(AsOfJoinPlan(j.left, j.right, lk, rk, m.left, m.right, m.forward))
        } else None
      case _ => None
    }
  }
}
