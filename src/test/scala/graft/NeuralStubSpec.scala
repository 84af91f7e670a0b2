package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ml.NeuralStub

/** Forward-pass contract for the hybrid-network inference stub (M6/M7,
  * reference train.py:115-173): deterministic across calls, shape-correct,
  * and a real 4-head attention (train.py:162-164) — checked through
  * weight-independent structural properties (permutation equivariance, the
  * convex-combination fixed point) rather than pinned output values. */
class NeuralStubSpec extends AnyFunSuite {

  private def seqIn(steps: Int, d: Int, seed: Int): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(steps, d)(rnd.nextGaussian())
  }

  test("forward is deterministic and returns Dim finite outputs") {
    val w = seqIn(12, NeuralStub.Dim, 7)
    val a = NeuralStub.forward(w)
    val b = NeuralStub.forward(w.map(_.clone()))
    assert(a.length == NeuralStub.Dim)
    assert(a.toSeq == b.toSeq)
    assert(a.forall(v => !v.isNaN && !v.isInfinite))
  }

  test("attention uses 4 heads and keeps the sequence shape") {
    assert(NeuralStub.Heads == 4)
    val s = seqIn(9, NeuralStub.DGru, 13)
    val out = NeuralStub.attention(s, 33L)
    assert(out.length == 9)
    assert(out.forall(_.length == NeuralStub.DGru))
    assert(out.flatten.forall(v => !v.isNaN && !v.isInfinite))
  }

  test("attention is permutation-equivariant (no positional encoding)") {
    val s = seqIn(9, NeuralStub.DGru, 13)
    val out = NeuralStub.attention(s, 33L)
    val perm = Array(4, 2, 7, 0, 8, 1, 6, 3, 5)
    val out2 = NeuralStub.attention(perm.map(s), 33L)
    perm.zipWithIndex.foreach { case (src, i) =>
      assert(out2(i).zip(out(src)).forall { case (x, y) => math.abs(x - y) < 1e-12 },
        s"row $i should equal unpermuted row $src")
    }
  }

  test("attention over a constant sequence returns identical rows") {
    // Softmax weights form a convex combination; equal V rows are a fixed
    // point regardless of head count or projections.
    val row = Array.tabulate(NeuralStub.DGru)(i => math.sin(i + 1.0))
    val s = Array.fill(5)(row.clone())
    val out = NeuralStub.attention(s, 33L)
    out.foreach(r => assert(
      r.zip(out(0)).forall { case (x, y) => math.abs(x - y) < 1e-12 }))
  }
}
