package graft.functions.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.GraftExpressionBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Exact integer dot product of two BIGINT arrays as a native Catalyst
  * expression with whole-stage codegen — the hot inner op of the
  * embedding-similarity queries (cosine numerator and norms over
  * ×1e6-scaled vectors).
  *
  * Replaces the interpreted `aggregate(zip_with(a, b, _*_), 0L, _+_)`
  * higher-order form with a tight generated loop: HOF lambdas evaluate one
  * closure call per element outside codegen, while this emits
  * `acc += a[i] * b[i]` inside the enclosing WholeStageCodegen stage.
  * Semantics match the HOF form exactly, including nulls: NULL result when
  * either array is NULL, any element is NULL, or lengths differ (zip_with
  * pads the shorter side with NULLs, nulling the sum). One deliberate
  * divergence: the loop wraps on overflow (plain java long arithmetic)
  * where ANSI-mode built-in `*`/`+` would throw — callers keep
  * |Σ a_i·b_i| < 2^63 by construction (±1e6-scaled unit-ish vectors,
  * dim ≤ 64), so the distinction never fires.
  *
  * SURVEY §4.3 (custom pieces): preference order (a) compose built-ins —
  * done, the HOF twin remains in [[graft.functions.TextFns.dotIntHof]] as
  * the property-tested reference — then (b) a native `Expression` where
  * the composition is off the codegen path. This is (b).
  */
case class DotLong(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot_long needs two array<bigint> inputs, got $l / $r")
    }

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def prettyName: String = "dot_long"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getLong($i) * $b.getLong($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotLong =
    copy(left = newLeft, right = newRight)
}

object DotLong {
  /** Column-API entry point. */
  def apply(a: Column, b: Column): Column =
    GraftExpressionBridge.column(
      DotLong(GraftExpressionBridge.expression(a), GraftExpressionBridge.expression(b)))
}
