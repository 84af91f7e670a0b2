package graft.ml

/** The shared training loop: Adam (bias-corrected) + EarlyStopping
  * (patience, restore_best_weights) + ReduceLROnPlateau over a FLAT
  * parameter vector — the loop mechanics of the reference trainer
  * (`train.py:239-249`), factored out of [[Trainer]] so the linear VAR
  * trainer and the GRU trainer ([[GruNet]]) share one implementation.
  *
  * The loop is driver-side O(|params|) state; each epoch calls the
  * caller's gradient function exactly once (one distributed pass) and the
  * validation function once. Everything here is plain elementwise
  * arithmetic in parameter order — deterministic for deterministic
  * gradient functions.
  */
object Optimizer {

  /** Fit result over flat parameters. */
  final case class FlatFit(
      weights: Array[Double],
      history: Seq[Trainer.EpochLog],
      stoppedEarly: Boolean,
      bestEpoch: Int,
      bestValLoss: Double)

  /** Run the Adam + callback loop from `init`.
    *
    * @param trainLossGrad mean loss and its gradient at the given weights
    *                      (one distributed pass)
    * @param valLoss       mean validation loss at the given weights
    */
  def adamLoop(init: Array[Double], cfg: Trainer.Config)(
      trainLossGrad: Array[Double] => (Double, Array[Double]),
      valLoss: Array[Double] => Double): FlatFit = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val k = init.length
    var w = init.clone()
    val m = new Array[Double](k)
    val v = new Array[Double](k)
    var lr = cfg.lr
    var best = w.clone()
    var bestVal = Double.MaxValue
    var bestEpoch = 0
    var sincePatience = 0
    var sincePlateau = 0
    var stopped = false
    val history = scala.collection.mutable.ArrayBuffer.empty[Trainer.EpochLog]
    var epoch = 1
    // Epoch pipelining (r21, guide §2.6 "overlap independent jobs"): the
    // gradient at the POST-UPDATE weights and the validation loss at the
    // same weights are independent pure functions — the LR/callback
    // decisions below never enter the gradient — so each epoch launches
    // the NEXT epoch's gradient pass concurrently with this epoch's
    // validation pass. Both passes keep their own RDD and partition-
    // ordered fold, so every float is bit-identical to the sequential
    // loop; only the wall clock changes (two ~equal distributed passes
    // per epoch overlap instead of serializing). The one speculative
    // pass in flight when EarlyStopping fires is awaited and discarded —
    // bounded waste, and nothing leaks past the fit.
    // Guard the initial launch on maxEpochs (ADVICE r21): with
    // maxEpochs == 0 the sequential loop ran no gradient pass at all, so
    // the speculative launch must not either.
    var gradFut: Future[(Double, Array[Double])] =
      if (cfg.maxEpochs >= 1) Future(trainLossGrad(w)) else null
    try {
    while (epoch <= cfg.maxEpochs && !stopped) {
      val (trainLoss, grad) = Await.result(gradFut, Duration.Inf)
      gradFut = null
      // Adam (bias-corrected), t = epoch.
      val bc1 = 1 - math.pow(cfg.beta1, epoch)
      val bc2 = 1 - math.pow(cfg.beta2, epoch)
      val next = new Array[Double](k)
      var i = 0
      while (i < k) {
        m(i) = m(i) * cfg.beta1 + grad(i) * (1 - cfg.beta1)
        v(i) = v(i) * cfg.beta2 + grad(i) * grad(i) * (1 - cfg.beta2)
        next(i) = w(i) - (m(i) / bc1) / (math.sqrt(v(i) / bc2) + cfg.adamEps) * lr
        i += 1
      }
      w = next
      val wSnap = w // w is only ever REPLACED, never mutated in place
      if (epoch < cfg.maxEpochs) gradFut = Future(trainLossGrad(wSnap))
      val vl = valLoss(w)
      history += Trainer.EpochLog(epoch, trainLoss, vl, lr)
      if (vl < bestVal - cfg.minDelta) {
        bestVal = vl; best = w.clone(); bestEpoch = epoch
        sincePatience = 0; sincePlateau = 0
      } else {
        sincePatience += 1; sincePlateau += 1
        if (sincePlateau >= cfg.plateauPatience && lr > cfg.minLr) {
          lr = math.max(lr * cfg.plateauFactor, cfg.minLr) // ReduceLROnPlateau
          sincePlateau = 0
        }
        if (sincePatience >= cfg.patience) stopped = true // EarlyStopping
      }
      epoch += 1
    }
    } finally {
      // Drain the in-flight speculative pass on EVERY exit path (ADVICE
      // r21: a valLoss/callback throw would otherwise leak a distributed
      // pass past the fit, racing the caller's finally-unpersist of the
      // training RDD it still reads): the caller unpersists the training
      // RDD right after, and the bench's timing window for the NEXT
      // query must not inherit a stray job.
      if (gradFut != null) { Await.ready(gradFut, Duration.Inf); () }
    }
    FlatFit(best, history.toSeq, stopped, bestEpoch, bestVal)
  }

  /** Huber ρ and ψ (loss and d loss/d residual) at delta. */
  def huber(r: Double, delta: Double): (Double, Double) =
    if (math.abs(r) <= delta) (0.5 * r * r, r)
    else (delta * (math.abs(r) - 0.5 * delta), delta * math.signum(r))
}
