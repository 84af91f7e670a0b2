package graft.functions.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.GraftExpressionBridge
import org.apache.spark.sql.types.{ArrayType, LongType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Explode the word n-gram shingles of a token array as a native Catalyst
  * [[Generator]] — one output row per shingle, values byte-identical to
  * `explode(TextFns.shingles(toks, n))`.
  *
  * Why native: the composed form is a higher-order `transform` whose lambda
  * runs interpreted per shingle (sequence array + `slice` copy + `concat_ws`
  * expression eval each) — measured ~3 s of the dedup inverted-index build
  * at sf0.1, the single hottest term of the whole dedup family. This
  * generator emits each shingle with one `UTF8String.concatWs` over a
  * reused token buffer: one fresh object per output row, no intermediate
  * arrays. Fewer than n tokens (or a NULL token array) yields no rows,
  * exactly like exploding the empty/NULL shingle array.
  *
  * SURVEY §4.3 preference order: (a) compose built-ins — the HOF form
  * stays in [[graft.functions.TextFns.shingles]] as the property-tested
  * reference — then (b/c) a native expression where the composition is off
  * the codegen path. The DuckDB oracle twin (`TextFns.sqlShingles`) is
  * unchanged; cross-engine equality is pinned by the dedup query hashes.
  */
case class ShingleExplode(child: Expression, n: Int, withPos: Boolean = false)
  extends UnaryExpression with Generator with CodegenFallback {

  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingle_explode needs array<string> input, got $t")
  }

  override def elementSchema: StructType =
    if (withPos)
      // 0-based window start as BIGINT — byte-identical to the rows of
      // posexplode(shingles(toks, n)) with the pos cast to long (and to
      // DuckDB's zipped UNNEST(range(len(g))) twin).
      new StructType().add("pos", LongType, nullable = false)
        .add("shingle", StringType, nullable = true)
    else new StructType().add("shingle", StringType, nullable = true)

  private lazy val sep = UTF8String.fromString(" ")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val data = child.eval(input)
    if (data == null) return Iterator.empty
    val arr = data.asInstanceOf[ArrayData]
    val m = arr.numElements()
    if (m < n) return Iterator.empty
    val toks = new Array[UTF8String](m)
    var i = 0
    while (i < m) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      i += 1
    }
    (0 to m - n).iterator.map { s =>
      // concatWs skips NULL parts — same as the concat_ws expression in
      // the HOF reference form.
      val sh = UTF8String.concatWs(sep, java.util.Arrays.copyOfRange(toks, s, s + n): _*)
      if (withPos) InternalRow(s.toLong, sh) else InternalRow(sh)
    }
  }

  override def prettyName: String = "shingle_explode"

  override protected def withNewChildInternal(newChild: Expression): ShingleExplode =
    copy(child = newChild)
}

object ShingleExplode {
  /** Column-API entry point: `ShingleExplode(tokens(col("text")), 3)`. */
  def apply(toks: Column, n: Int): Column =
    GraftExpressionBridge.column(
      ShingleExplode(GraftExpressionBridge.expression(toks), n))

  /** Position-tagged variant: rows of (pos, shingle), the native form of
    * `posexplode(shingles(toks, n))` for span-level consumers. */
  def withPos(toks: Column, n: Int): Column =
    GraftExpressionBridge.column(
      ShingleExplode(GraftExpressionBridge.expression(toks), n, withPos = true))
}
