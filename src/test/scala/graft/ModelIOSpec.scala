package graft

import java.nio.file.Files

import graft.ml.{ModelIO, TimeSeries}

/** S11 model persistence: save → load must reproduce the fitted model
  * bit-for-bit, so reloaded forecasts are identical to fitted ones. */
class ModelIOSpec extends SparkSpec {
  import spark.implicits._

  private def fitSmall() = {
    val ys = Iterator.iterate(100.0)(y => 2.0 + 0.8 * y).take(60).toSeq
    val rows = ys.sliding(2).map { case Seq(prev, cur) => (Seq(prev), Seq(cur)) }.toSeq
    TimeSeries.fitVar(rows.toDF("x", "y"), p = 1, dim = 1)
  }

  test("coefficients and scaler stats round-trip bit-exactly") {
    val m = fitSmall()
    val sp = ModelIO.ScalerParams(
      Array(1.5, -0.0, 3.7e-9), Array(0.1, 1e300, 2.0 / 3.0))
    val path = Files.createTempFile("model-io", ".json")
    try {
      ModelIO.save(m, Some(sp), path.toString)
      val b = ModelIO.load(path.toString)
      assert(b.model.p == m.p && b.model.dim == m.dim)
      for (i <- 0 until m.dim; j <- 0 until m.coef.cols)
        assert(java.lang.Double.doubleToRawLongBits(b.model.coef(i, j)) ==
          java.lang.Double.doubleToRawLongBits(m.coef(i, j)))
      val got = b.scaler.get
      assert(got.median.zip(sp.median).forall { case (a, x) =>
        java.lang.Double.doubleToRawLongBits(a) == java.lang.Double.doubleToRawLongBits(x) })
      assert(got.range.zip(sp.range).forall { case (a, x) =>
        java.lang.Double.doubleToRawLongBits(a) == java.lang.Double.doubleToRawLongBits(x) })
    } finally Files.deleteIfExists(path)
  }

  test("reloaded-model forecasts are identical to fitted-model forecasts") {
    val m = fitSmall()
    val path = Files.createTempFile("model-io", ".json")
    val reloaded = try {
      ModelIO.save(m, None, path.toString)
      ModelIO.load(path.toString).model
    } finally Files.deleteIfExists(path)
    val df = Seq((Seq(3.25), Seq(0.0)), (Seq(-17.5), Seq(0.0)), (Seq(1e6), Seq(0.0)))
      .toDF("x", "y")
    val a = df.select(TimeSeries.forecastCols(m): _*).collect().map(_.getDouble(0))
    val b = df.select(TimeSeries.forecastCols(reloaded): _*).collect().map(_.getDouble(0))
    assert(a.zip(b).forall { case (x, y) =>
      java.lang.Double.doubleToRawLongBits(x) == java.lang.Double.doubleToRawLongBits(y) })
  }

  test("neural weight bundles round-trip bit-exactly and check their kind tag") {
    val dims = graft.ml.TftNet.Dims(n = 3, g1 = 4, d1 = 4, d2 = 4, heads = 2,
      g2 = 4, m = 2)
    val w = graft.ml.TftNet.init(dims, 99L)
      .map(v => v * 1.7e-300 + v) // exercise subnormal-adjacent magnitudes too
    val path = Files.createTempFile("net-io", ".json")
    try {
      ModelIO.saveNet(Seq(dims.n, dims.g1, dims.d1, dims.d2, dims.heads,
        dims.g2, dims.m), w, "tft", path.toString)
      val (d2, w2) = ModelIO.loadNet(path.toString, "tft")
      assert(d2 == Seq(3, 4, 4, 4, 2, 4, 2))
      assert(w2.length == w.length && w.indices.forall { i =>
        java.lang.Double.doubleToRawLongBits(w(i)) ==
          java.lang.Double.doubleToRawLongBits(w2(i))
      })
      // A reloaded net must predict bit-identically.
      val seq = Array.fill(4)(Array.tabulate(3)(i => 0.3 * i - 0.2))
      val a = graft.ml.TftNet.predict(seq, w, dims)
      val b = graft.ml.TftNet.predict(seq, w2, dims)
      assert(a.sameElements(b))
      intercept[IllegalArgumentException](ModelIO.loadNet(path.toString, "gru"))
    } finally Files.deleteIfExists(path)
  }

  test("save overwrites atomically and load rejects foreign files") {
    val m = fitSmall()
    val path = Files.createTempFile("model-io", ".json")
    try {
      ModelIO.save(m, None, path.toString)
      ModelIO.save(m, None, path.toString) // REPLACE_EXISTING path
      assert(ModelIO.load(path.toString).model.p == m.p)
      Files.write(path, "{\"something\":\"else\"}".getBytes)
      intercept[IllegalArgumentException](ModelIO.load(path.toString))
    } finally Files.deleteIfExists(path)
  }
}
