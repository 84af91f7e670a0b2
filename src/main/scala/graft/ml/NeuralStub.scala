package graft.ml

/** Inference-only forward pass of the reference's hybrid residual model
  * (`train.py:115-173` — M6 GRN, M7 GRN→GRU→GRU→MultiHeadAttention→
  * LayerNorm→GlobalAvgPool→GRN→Dense), in pure Scala over small arrays.
  *
  * Training (Adam/Huber, callbacks, MirroredStrategy — `train.py:236-249`)
  * is out of relational scope (SURVEY §2.10 M7): the engine ships the
  * deterministic forward pass; weights would be loaded from JSON in
  * production. Here they are seeded pseudo-random so results are
  * reproducible across runs and partitionings — each weight is a pure
  * function of (seed, layer, position).
  *
  * Executed as a scalar UDF over `array<array<double>>` sequence windows
  * (the M5/W2 tensors): per-row compute, no shuffle, embarrassingly
  * parallel — the right shape for batch inference at any scale.
  */
object NeuralStub extends Serializable {

  val Dim = 7      // features (train.py:52-61)
  val DGrn = 16    // GRN hidden (scaled down from 64 — train.py:236)
  val DGru = 24    // GRU units (scaled down from 128/64 — train.py:158-160)

  /** Deterministic weight: hash-based uniform in [-0.5, 0.5). */
  private def w(seed: Long, i: Int, j: Int): Double = {
    var h = seed * 6364136223846793005L + (i.toLong << 32 | j.toLong) + 1442695040888963407L
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
    (h >>> 11).toDouble / (1L << 53).toDouble - 0.5
  }

  /** Weight matrices are pure functions of (seed, shape) — memoized per
    * JVM so the per-row inference UDF doesn't re-derive every hash on
    * every call (measured ~2.5× on ml_gru_infer; values unchanged). */
  private val matCache =
    new java.util.concurrent.ConcurrentHashMap[(Long, Int, Int), Array[Array[Double]]]

  private def mat(seed: Long, rows: Int, cols: Int): Array[Array[Double]] =
    matCache.computeIfAbsent((seed, rows, cols), { case (s, r, c) =>
      Array.tabulate(r, c)((i, j) => w(s, i, j) / math.sqrt(c))
    })

  private def matVec(m: Array[Array[Double]], v: Array[Double]): Array[Double] =
    m.map { row =>
      var s = 0.0; var j = 0
      while (j < v.length) { s += row(j) * v(j); j += 1 }
      s
    }

  private def sigmoid(x: Double) = 1.0 / (1.0 + math.exp(-x))
  private def elu(x: Double) = if (x >= 0) x else math.exp(x) - 1
  private def tanh(x: Double) = math.tanh(x)

  private def layerNorm(x: Array[Double]): Array[Double] = {
    val mu = x.sum / x.length
    val sd = math.sqrt(x.map(v => (v - mu) * (v - mu)).sum / x.length + 1e-6)
    x.map(v => (v - mu) / sd)
  }

  /** Gated Residual Network (`train.py:115-145`): Dense-ELU → Dense →
    * sigmoid gate (GLU) → LayerNorm(skip + gated), linear skip-projection
    * when dims differ. */
  def grn(x: Array[Double], dOut: Int, seed: Long): Array[Double] = {
    val h = matVec(mat(seed, dOut, x.length), x).map(elu)
    val a = matVec(mat(seed + 1, dOut, dOut), h)
    val g = matVec(mat(seed + 2, dOut, dOut), h).map(sigmoid)
    val gated = a.zip(g).map { case (ai, gi) => ai * gi }
    val skip = if (x.length == dOut) x else matVec(mat(seed + 3, dOut, x.length), x)
    layerNorm(skip.zip(gated).map { case (s, v) => s + v })
  }

  /** Single-layer GRU over a sequence, returning all hidden states
    * (`return_sequences=True`, train.py:158-160). */
  def gru(seq: Array[Array[Double]], d: Int, seed: Long): Array[Array[Double]] = {
    val (wz, uz) = (mat(seed, d, seq(0).length), mat(seed + 1, d, d))
    val (wr, ur) = (mat(seed + 2, d, seq(0).length), mat(seed + 3, d, d))
    val (wh, uh) = (mat(seed + 4, d, seq(0).length), mat(seed + 5, d, d))
    var h = Array.fill(d)(0.0)
    seq.map { x =>
      val z = matVec(wz, x).zip(matVec(uz, h)).map { case (a, b) => sigmoid(a + b) }
      val r = matVec(wr, x).zip(matVec(ur, h)).map { case (a, b) => sigmoid(a + b) }
      val hr = h.zip(r).map { case (hi, ri) => hi * ri }
      val cand = matVec(wh, x).zip(matVec(uh, hr)).map { case (a, b) => tanh(a + b) }
      h = z.indices.map(i => (1 - z(i)) * h(i) + z(i) * cand(i)).toArray
      h
    }
  }

  val Heads = 4 // MultiHeadAttention heads (train.py:162-164)

  /** Scaled-dot multi-head self-attention (train.py:162-164:
    * `MultiHeadAttention(num_heads=4, key_dim=32)`; key dim scaled to
    * d/4 in line with the other scaled-down widths). Per head: Q/K/V
    * projections to keyDim, softmax(QKᵀ/√keyDim)·V; the four head outputs
    * are concatenated and passed through the output projection, exactly
    * the Keras layer's shape. */
  def attention(seq: Array[Array[Double]], seed: Long): Array[Array[Double]] = {
    val d = seq(0).length
    val kd = math.max(1, d / Heads)
    val headOuts = (0 until Heads).map { h =>
      val hs = seed + 16L * h
      val q = seq.map(x => matVec(mat(hs, kd, d), x))
      val k = seq.map(x => matVec(mat(hs + 1, kd, d), x))
      val v = seq.map(x => matVec(mat(hs + 2, kd, d), x))
      val scale = 1.0 / math.sqrt(kd)
      seq.indices.map { i =>
        val scores = k.map(kj => q(i).zip(kj).map { case (a, b) => a * b }.sum * scale)
        val m = scores.max
        val e = scores.map(s => math.exp(s - m))
        val z = e.sum
        val out = Array.fill(kd)(0.0)
        v.indices.foreach { j =>
          val wgt = e(j) / z
          var t = 0; while (t < kd) { out(t) += wgt * v(j)(t); t += 1 }
        }
        out
      }.toArray
    }
    val wo = mat(seed + 99, d, Heads * kd)
    seq.indices.map { i =>
      matVec(wo, headOuts.flatMap(_(i)).toArray)
    }.toArray
  }

  /** Full hybrid-network forward pass (train.py:147-173):
    * per-step GRN(DGrn) → GRU(DGru) → attention → LayerNorm(+skip) →
    * global average pool → GRN(DGrn) → Dense(Dim). Input: (steps × Dim)
    * window, output: Dim residual predictions. */
  def forward(window: Array[Array[Double]]): Array[Double] = {
    val grned = window.map(x => grn(x, DGrn, 11L))
    val g = gru(grned, DGru, 22L)
    val att = attention(g, 33L)
    val normed = g.zip(att).map { case (a, b) =>
      layerNorm(a.zip(b).map { case (x, y) => x + y })
    }
    val pooled = Array.tabulate(DGru)(i => normed.map(_(i)).sum / normed.length)
    val head = grn(pooled, DGrn, 44L)
    matVec(mat(55L, Dim, DGrn), head)
  }
}
