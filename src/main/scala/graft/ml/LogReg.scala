package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.storage.StorageLevel

/** Distributed logistic regression — the quality-classifier trainer of a
  * data pipeline (CCNet/GPT-3-style filters are linear classifiers over
  * cheap per-document features). Same scale contract as every trainer
  * here: per-sample work is embarrassingly parallel, one flat O(|θ|)
  * gradient partial per partition crosses the wire ([[DistGrad]],
  * partition-ordered fold), and the Adam/EarlyStopping/ReduceLROnPlateau
  * loop ([[Optimizer.adamLoop]]) holds only model-sized driver state.
  */
object LogReg {

  final case class TrainedLr(
      weights: Array[Double],
      history: Seq[Trainer.EpochLog],
      stoppedEarly: Boolean,
      bestEpoch: Int,
      bestValLoss: Double,
      valAccuracy: Double,
      valMajorityShare: Double)

  /** Numerically stable BCE: max(z,0) − z·y + ln(1+e^−|z|). */
  private def bce(z: Double, y: Double): Double =
    math.max(z, 0.0) - z * y + math.log1p(math.exp(-math.abs(z)))

  /** Train on `split = 'train'` rows of a frame with columns
    * (x: array<double> of nFeat, y: double in {0,1}, split: string);
    * validate per epoch on `split = 'val'`. Accuracy is decided by the
    * SIGN of w·x (the 0.5-probability boundary) — an integer count, so
    * the reported number is partition-order-independent. */
  def fit(rows: DataFrame, nFeat: Int, cfg: Trainer.Config): TrainedLr = {
    def rddOf(split: String) = rows
      .filter(col("split") === split)
      .select(col("x"), col("y")).rdd
      .map(r => (Array(r.getSeq[Double](0).toArray), Array(r.getDouble(1))))
    val train = rddOf("train").persist(StorageLevel.MEMORY_AND_DISK)
    val valid = rddOf("val").persist(StorageLevel.MEMORY_AND_DISK)
    try {
      def pass(rdd: org.apache.spark.rdd.RDD[(Array[Array[Double]], Array[Double])],
               w: Array[Double], withGrad: Boolean): (Double, Array[Double]) =
        DistGrad.meanLossGrad(rdd, nFeat, 1) { (xs, ys, g) =>
          val x = xs(0); val y = ys(0)
          var z = 0.0
          var i = 0; while (i < nFeat) { z += w(i) * x(i); i += 1 }
          if (withGrad) {
            val e = 1.0 / (1.0 + math.exp(-z)) - y
            var j = 0; while (j < nFeat) { g(j) += e * x(j); j += 1 }
          }
          bce(z, y)
        }
      val ff = Optimizer.adamLoop(new Array[Double](nFeat), cfg)(
        w => pass(train, w, withGrad = true),
        w => pass(valid, w, withGrad = false)._1)
      val w = ff.weights
      val stats = valid.map { case (xs, ys) =>
        val x = xs(0)
        var z = 0.0
        var i = 0; while (i < nFeat) { z += w(i) * x(i); i += 1 }
        val pred = if (z > 0) 1.0 else 0.0
        (if (pred == ys(0)) 1L else 0L, if (ys(0) == 1.0) 1L else 0L, 1L)
      }.reduce((a, b) => (a._1 + b._1, a._2 + b._2, a._3 + b._3))
      val n = math.max(stats._3, 1L).toDouble
      val posShare = stats._2 / n
      TrainedLr(w, ff.history, ff.stoppedEarly, ff.bestEpoch, ff.bestValLoss,
        stats._1 / n, math.max(posShare, 1.0 - posShare))
    } finally {
      train.unpersist(blocking = false)
      valid.unpersist(blocking = false)
    }
  }
}
