package graft.ml

import org.apache.spark.rdd.RDD

/** The distributed gradient pass shared by the sequence trainers
  * ([[GruNet]], [[TftNet]]): one flat O(|θ|) partial per partition,
  * folded on the driver in PARTITION ORDER — float addition isn't
  * associative, and a completion-ordered fold would drift between runs,
  * breaking the engine's bit-exact determinism contract.
  *
  * This is the scale shape of the whole training stack: per-sample work
  * is embarrassingly parallel, only (loss, gradient) vectors cross the
  * wire, and driver state stays O(|θ|) regardless of data volume.
  */
private[ml] object DistGrad {

  /** Mean (per sample × output) loss and gradient over `rows`. The
    * `sample` function returns one sample's RAW loss and, when it is a
    * gradient pass, ACCUMULATES the raw gradient into the array it is
    * handed (callers pass a loss-only function for validation passes —
    * the array then simply stays zero). */
  def meanLossGrad(
      rows: RDD[(Array[Array[Double]], Array[Double])],
      size: Int, mOut: Int)(
      sample: (Array[Array[Double]], Array[Double], Array[Double]) => Double)
      : (Double, Array[Double]) = {
    val partials = rows.mapPartitionsWithIndex { (pid, it) =>
      val g = new Array[Double](size)
      var l = 0.0
      var c = 0L
      it.foreach { case (xs, ys) => l += sample(xs, ys, g); c += 1 }
      Iterator.single((pid, l, g, c))
    }.collect().sortBy(_._1)
    var loss = 0.0
    var cnt = 0L
    val grad = new Array[Double](size)
    partials.foreach { case (_, l, g, c) =>
      loss += l; cnt += c
      var i = 0; while (i < size) { grad(i) += g(i); i += 1 }
    }
    val denom = math.max(cnt, 1L).toDouble * mOut
    var i = 0; while (i < size) { grad(i) /= denom; i += 1 }
    (loss / denom, grad)
  }
}
