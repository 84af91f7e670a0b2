package graft

import org.apache.spark.sql.functions._

import graft.functions.DetAgg

/** Deterministic-aggregate spec: moment formulas vs direct computation and
  * regression pins for the cross-engine hazards found in round 1. */
class DetAggSpec extends SparkSpec {
  import spark.implicits._

  private val xs = Seq(1.5, 2.0, 2.5, 4.0, 10.0)
  private lazy val df = xs.toDF("x")

  private def agg(c: org.apache.spark.sql.Column): Double =
    df.agg(c.cast("double")).head().getDouble(0)

  test("dsum/davg equal exact arithmetic") {
    assert(agg(DetAgg.dsum(col("x"))) == 20.0)
    assert(agg(DetAgg.davg(col("x"))) == 4.0)
  }

  test("dstddev matches direct sample stddev") {
    val mean = xs.sum / xs.size
    val expected = math.sqrt(xs.map(v => (v - mean) * (v - mean)).sum / (xs.size - 1))
    assert(math.abs(agg(DetAgg.dstddev(col("x"))) - expected) < 1e-6)
  }

  test("dskewness/dkurtosis match population-moment formulas") {
    val n = xs.size.toDouble
    val mu = xs.sum / n
    val m2 = xs.map(v => math.pow(v - mu, 2)).sum / n
    val m3 = xs.map(v => math.pow(v - mu, 3)).sum / n
    val m4 = xs.map(v => math.pow(v - mu, 4)).sum / n
    assert(math.abs(agg(DetAgg.dskewness(col("x"))) - m3 / math.pow(m2, 1.5)) < 1e-6)
    assert(math.abs(agg(DetAgg.dkurtosis(col("x"))) - (m4 / (m2 * m2) - 3)) < 1e-6)
  }

  test("single-row and constant groups never divide by zero (ANSI)") {
    // singleton: n-1 clamp; constant: m2 floor must not underflow m2^1.5
    val single = Seq(5.0).toDF("x")
    assert(single.agg(DetAgg.dstddev(col("x"))).head().getDouble(0) == 0.0)
    val const = Seq(3.0, 3.0, 3.0).toDF("x")
    assert(const.agg(DetAgg.dskewness(col("x"))).head().getDouble(0) == 0.0)
    assert(const.agg(DetAgg.dkurtosis(col("x"))).head().getDouble(0) == -3.0)
  }

  test("regression: grand-total decimal→double goes through string (cube_orders 3758439620.06)") {
    // 15000 × 250562.641⅓-ish constructed to reproduce the .06 total
    val v = Seq.fill(2)(1879219810.03).toDF("x")
    val got = v.agg(DetAgg.dsum(col("x"))).head().getDouble(0)
    // JVM-side reference: exact decimal 3758439620.06 → double → r6
    val exact = java.lang.Double.parseDouble("3758439620.06")
    assert(got == math.floor(exact * 1e6 + 0.5) / 1e6)
  }

  test("r6 is floor(x*1e6+0.5)/1e6 including negatives") {
    val d2 = Seq(1.2345675, -1.2345675, 0.0000004).toDF("x")
    val out = d2.select(DetAgg.r6(col("x"))).as[Double].collect()
    assert(out(0) == math.floor(1.2345675 * 1e6 + 0.5) / 1e6)
    assert(out(1) == math.floor(-1.2345675 * 1e6 + 0.5) / 1e6)
    assert(out(2) == 0.0)
  }

  test("moment aggregates invariant under 1 vs 7 partitions") {
    val big = (1 to 10000).map(i => (i % 97).toDouble + 0.125 * (i % 13))
    val one = big.toDF("x").repartition(1)
    val many = big.toDF("x").repartition(7)
    def stats(df: org.apache.spark.sql.DataFrame) =
      df.agg(DetAgg.dsum(col("x")), DetAgg.dstddev(col("x")),
        DetAgg.dskewness(col("x")), DetAgg.dkurtosis(col("x")),
        DetAgg.dmedian(col("x"))).head()
    assert(stats(one) == stats(many))
  }
}
