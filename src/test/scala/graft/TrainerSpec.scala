package graft

import graft.ml.{TimeSeries, Trainer}

/** Training-loop spec: convergence to the closed form, callback semantics
  * (EarlyStopping restore-best, ReduceLROnPlateau), determinism. */
class TrainerSpec extends SparkSpec {
  import spark.implicits._

  // Noiseless linear system y = W·[1, x]: Huber in its quadratic region is
  // least squares, so the loop must recover W.
  private val TrueW = Array(
    Array(0.5, 1.2, -0.7),
    Array(-0.3, 0.4, 0.9))

  private def syntheticLagged(n: Int) = {
    val rnd = new scala.util.Random(7)
    (0 until n).map { i =>
      val x = Array(rnd.nextDouble() * 2 - 1, rnd.nextDouble() * 2 - 1)
      val y = TrueW.map(row => row(0) + row(1) * x(0) + row(2) * x(1))
      (x.toSeq, y.toSeq, if (i * 10 < n * 8) "train" else "val")
    }.toDF("x", "y", "split")
  }

  test("converges to the closed-form solution on noiseless linear data") {
    val t = Trainer.fit(syntheticLagged(150), p = 1, dim = 2,
      Trainer.Config(lr = 0.05, maxEpochs = 500, patience = 40,
        huberDelta = 10.0))
    assert(t.history.nonEmpty)
    assert(t.history.last.trainLoss < t.history.head.trainLoss / 100,
      s"loss must collapse: ${t.history.head.trainLoss} → ${t.history.last.trainLoss}")
    assert(t.bestValLoss < 1e-3, s"val loss ${t.bestValLoss}")
    for (i <- 0 until 2; j <- 0 until 3)
      assert(math.abs(t.model.coef(i, j) - TrueW(i)(j)) < 0.05,
        s"coef($i,$j) = ${t.model.coef(i, j)} vs ${TrueW(i)(j)}")
  }

  test("EarlyStopping fires after patience epochs without val improvement and restores best weights") {
    val t = Trainer.fit(syntheticLagged(150), p = 1, dim = 2,
      Trainer.Config(lr = 0.05, maxEpochs = 2000, patience = 10,
        minDelta = 1e-4, huberDelta = 10.0))
    assert(t.stoppedEarly, "converged fit must early-stop before 2000 epochs")
    assert(t.history.length < 2000)
    // restore_best_weights: the returned model is the best-REGISTERED
    // epoch's (minDelta gates registration, Keras semantics — an epoch can
    // log a marginally lower val loss without resetting patience), and the
    // loop ran exactly patience epochs past that registration.
    assert(t.history.length == t.bestEpoch + 10,
      s"stopped at ${t.history.length}, best ${t.bestEpoch}, patience 10")
    assert(t.history(t.bestEpoch - 1).valLoss == t.bestValLoss)
  }

  test("ReduceLROnPlateau halves the LR after plateauPatience stale epochs") {
    val t = Trainer.fit(syntheticLagged(150), p = 1, dim = 2,
      Trainer.Config(lr = 0.05, maxEpochs = 2000, patience = 20,
        plateauPatience = 5, plateauFactor = 0.5, minDelta = 1e-4,
        huberDelta = 10.0))
    val lrs = t.history.map(_.lr).distinct
    assert(lrs.length >= 2, s"LR must step down on plateau, saw $lrs")
    assert(lrs.head == 0.05 && lrs(1) == 0.025)
    // LR only ever decreases.
    assert(t.history.map(_.lr).sliding(2).forall(p => p(1) <= p(0)))
  }

  test("fit is deterministic: identical runs produce identical history and weights") {
    val cfg = Trainer.Config(lr = 0.05, maxEpochs = 50, huberDelta = 10.0)
    val a = Trainer.fit(syntheticLagged(150), p = 1, dim = 2, cfg)
    val b = Trainer.fit(syntheticLagged(150), p = 1, dim = 2, cfg)
    assert(a.history == b.history)
    assert(a.model.coef == b.model.coef)
  }

  test("huber region: large residuals get clipped gradients (robustness to outliers)") {
    // One wild outlier in y; delta = 1 bounds its pull, so the fit stays
    // near the inlier solution instead of chasing the outlier.
    val rnd = new scala.util.Random(11)
    val rows = (0 until 150).map { i =>
      val x = Array(rnd.nextDouble() * 2 - 1, rnd.nextDouble() * 2 - 1)
      val clean = TrueW.map(row => row(0) + row(1) * x(0) + row(2) * x(1))
      val y = if (i == 0) clean.map(_ + 1000.0) else clean
      (x.toSeq, y.toSeq, if (i < 120) "train" else "val")
    }.toDF("x", "y", "split")
    val t = Trainer.fit(rows, p = 1, dim = 2,
      Trainer.Config(lr = 0.05, maxEpochs = 500, patience = 40,
        huberDelta = 1.0))
    for (i <- 0 until 2; j <- 0 until 3)
      assert(math.abs(t.model.coef(i, j) - TrueW(i)(j)) < 0.15,
        s"outlier must not drag coef($i,$j): ${t.model.coef(i, j)} vs ${TrueW(i)(j)}")
  }
}
