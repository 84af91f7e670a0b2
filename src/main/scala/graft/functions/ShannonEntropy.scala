package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.{Column, Encoder, Encoders}

/** Shannon entropy (base 2) over the frequency histogram of a column —
  * the `Entropy_Score` KPI that the reference's trainer consumes
  * (`train.py:59`) but its pipeline never computes (SURVEY §4.4 Q7).
  *
  * Implemented as a typed [[Aggregator]] (histogram partial, exact Long
  * counts) registered through `udaf(...)`: partial maps merge
  * associatively, so the aggregate is map-side-combinable and scales like
  * any hash aggregate. Cardinality of the histogram — not row count —
  * bounds the state, which for KPI-style discrete inputs is tiny.
  * Matches DuckDB's `entropy(x)`: H = -Σ (c/n)·log2(c/n).
  */
object ShannonEntropy {
  private val aggregator: Aggregator[java.lang.Long, Map[Long, Long], Double] =
    new Aggregator[java.lang.Long, Map[Long, Long], Double] {
      def zero: Map[Long, Long] = Map.empty
      // Boxed input so NULLs are visible and skipped — DuckDB's entropy()
      // ignores NULLs, and the KPI caller feeds a nullable seq column.
      def reduce(b: Map[Long, Long], a: java.lang.Long): Map[Long, Long] =
        if (a == null) b
        else b.updated(a.longValue, b.getOrElse(a.longValue, 0L) + 1L)
      def merge(x: Map[Long, Long], y: Map[Long, Long]): Map[Long, Long] =
        y.foldLeft(x) { case (m, (k, v)) => m.updated(k, m.getOrElse(k, 0L) + v) }
      def finish(m: Map[Long, Long]): Double = {
        val n = m.valuesIterator.sum.toDouble
        if (n <= 0) 0.0
        else {
          val ln2 = math.log(2.0)
          var h = 0.0
          // Sort for a deterministic accumulation order regardless of
          // partitioning (sub-ulp determinism; cardinality is small).
          m.toSeq.sortBy(_._1).foreach { case (_, c) =>
            val p = c / n
            h -= p * (math.log(p) / ln2)
          }
          h
        }
      }
      def bufferEncoder: Encoder[Map[Long, Long]] = ExpressionEncoder()
      def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }

  /** The UDAF object — also registrable by name for SQL callers
    * (`GraftExtensions.register`). */
  lazy val udafFn: org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(aggregator, Encoders.LONG)

  /** Entropy of an integral column. NULLs are ignored (DuckDB `entropy`
    * semantics). */
  def ofLong(c: Column): Column = udafFn(c)
}
