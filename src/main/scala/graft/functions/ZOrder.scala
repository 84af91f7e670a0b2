package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve encoding as pure Column combinators — every op
  * is a codegen'd long bit-op (shiftleft/and/or), no UDF. [[spread21]]
  * spaces the low 21 bits of x one apart via the classic magic-mask
  * sequence; [[morton2]] interleaves two 21-bit dimensions into one
  * sortable 42-bit key.
  *
  * Sorting a table by `morton2(a, b)` clusters rows so that ANY rectangle
  * in (a, b) space maps to a few contiguous key ranges — parquet
  * row-group/page min/max stats then prune most of the layout for 2-D
  * selective scans, where a single-column sort can only prune one
  * dimension. This is the lakehouse Z-ORDER table-layout operator,
  * expressed as a plain sorted write.
  */
object ZOrder {

  // The 2-D spread (bits one apart) — NOT the 3-apart 3-D sequence.
  private val Masks: Seq[(Int, Long)] = Seq(
    16 -> 0x0000FFFF0000FFFFL,
    8  -> 0x00FF00FF00FF00FFL,
    4  -> 0x0F0F0F0F0F0F0F0FL,
    2  -> 0x3333333333333333L,
    1  -> 0x5555555555555555L)

  /** Spread the low 21 bits of a non-negative integral column one apart. */
  def spread21(c: Column): Column =
    Masks.foldLeft(c.cast("long").bitwiseAND(lit(0x1FFFFFL))) {
      case (x, (sh, mask)) => x.bitwiseOR(shiftleft(x, sh)).bitwiseAND(lit(mask))
    }

  /** Morton key of two dimensions (a on even bits, b on odd). */
  def morton2(a: Column, b: Column): Column =
    spread21(a).bitwiseOR(shiftleft(spread21(b), 1))

  /** The same tree as raw Catalyst expressions — for the SQL function
    * builder (`morton2(a, b)` in GraftExtensions), where composed Columns
    * can't be injected (their inner functions would bypass resolution). */
  def morton2Expr(a: org.apache.spark.sql.catalyst.expressions.Expression,
                  b: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    import org.apache.spark.sql.catalyst.expressions.{BitwiseAnd, BitwiseOr, Cast, Literal, ShiftLeft}
    import org.apache.spark.sql.types.LongType
    def spread(e: org.apache.spark.sql.catalyst.expressions.Expression) =
      Masks.foldLeft[org.apache.spark.sql.catalyst.expressions.Expression](
        BitwiseAnd(Cast(e, LongType), Literal(0x1FFFFFL))) {
        case (x, (sh, mask)) =>
          BitwiseAnd(BitwiseOr(x, ShiftLeft(x, Literal(sh))), Literal(mask))
      }
    BitwiseOr(spread(a), ShiftLeft(spread(b), Literal(1)))
  }

  /** Reference single-bit interleave loop — the spec oracle for the
    * magic-mask version. */
  def morton2Ref(a: Long, b: Long): Long = {
    var out = 0L
    var i = 0
    while (i < 21) {
      out |= ((a >> i) & 1L) << (2 * i)
      out |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    out
  }
}
