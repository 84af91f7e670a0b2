package graft

import breeze.linalg.DenseMatrix

import graft.ml.TimeSeries

/** VAR solver spec: the Gram/treeAggregate fit must recover known
  * coefficients (SURVEY §5.2 — "VAR solver vs closed-form AR(1)"). */
class VarModelSpec extends SparkSpec {
  import spark.implicits._

  test("recovers AR(1) coefficients from a noiseless univariate series") {
    // y_t = 2 + 0.8 y_{t-1}, exact — OLS must recover (2, 0.8). Start far
    // from the 10.0 fixed point: the transient provides the x-variance
    // (a constant series is collinear with the intercept).
    val ys = Iterator.iterate(100.0)(y => 2.0 + 0.8 * y).take(60).toSeq
    val rows = ys.sliding(2).map { case Seq(prev, cur) =>
      (Seq(prev), Seq(cur))
    }.toSeq
    val df = rows.toDF("x", "y")
    val m = TimeSeries.fitVar(df, p = 1, dim = 1)
    assert(math.abs(m.coef(0, 0) - 2.0) < 1e-4)
    assert(math.abs(m.coef(0, 1) - 0.8) < 1e-4)
  }

  test("recovers a 2-dim VAR(1) system") {
    // y = A x + c with known A, c; build exact data.
    val a = DenseMatrix((0.5, 0.2), (-0.1, 0.7))
    val c = Seq(1.0, -2.0)
    var state = Seq(3.0, 4.0)
    val rows = (0 until 300).map { _ =>
      val next = Seq(
        c(0) + a(0, 0) * state(0) + a(0, 1) * state(1),
        c(1) + a(1, 0) * state(0) + a(1, 1) * state(1))
      val r = (state, next)
      state = Seq(next(0) * 0.9 + 0.3, next(1) * 1.05 - 0.2) // perturb trajectory
      r
    }
    val df = rows.toDF("x", "y")
    val m = TimeSeries.fitVar(df, p = 1, dim = 2)
    assert(math.abs(m.coef(0, 0) - 1.0) < 1e-3)  // intercept eq 0
    assert(math.abs(m.coef(0, 1) - 0.5) < 1e-3)  // A(0,0)
    assert(math.abs(m.coef(0, 2) - 0.2) < 1e-3)  // A(0,1)
    assert(math.abs(m.coef(1, 0) + 2.0) < 1e-3)
    assert(math.abs(m.coef(1, 1) + 0.1) < 1e-3)
    assert(math.abs(m.coef(1, 2) - 0.7) < 1e-3)
  }

  test("forecast columns reproduce the fitted linear map") {
    val ys = Iterator.iterate(5.0)(y => 1.0 + 0.5 * y).take(100).toSeq
    val rows = ys.sliding(2).map { case Seq(p0, cur) => (Seq(p0), Seq(cur)) }.toSeq
    val df = rows.toDF("x", "y")
    val m = TimeSeries.fitVar(df, p = 1, dim = 1)
    import org.apache.spark.sql.functions._
    val fc = df.select((col("y")(0)).as("actual"), TimeSeries.forecastCols(m).head)
    val maxErr = fc.agg(max(abs(col("actual") - col("fc_0")))).head().getDouble(0)
    assert(maxErr < 1e-6)
  }

  test("chronological split is ordered and proportioned") {
    val series = TimeSeries.withSplit(
      TimeSeries.featureSeries(Tables.events(spark, "/root/testdata/sf0.001")))
    import org.apache.spark.sql.functions._
    val counts = series.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = counts.values.sum.toDouble
    assert(counts("train") / n > 0.65 && counts("train") / n < 0.75)
    // no train row may be later than any test row within a slice
    val maxTrain = series.filter(col("split") === "train")
      .groupBy("slice").agg(max("t").as("mt"))
    val minTest = series.filter(col("split") === "test")
      .groupBy("slice").agg(min("t").as("mt2"))
    val bad = maxTrain.join(minTest, "slice").filter(col("mt") >= col("mt2")).count()
    assert(bad == 0)
  }
}
