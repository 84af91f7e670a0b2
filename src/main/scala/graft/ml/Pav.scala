package graft.ml

/** Pool-adjacent-violators isotonic regression over PRE-POOLED integer
  * mass — the exact-rational core of `ml_isotonic_calibration`.
  *
  * Input: one point per distinct score, already aggregated to
  * (score, hits, cnt) with hits = Σ 0/1 labels and cnt = point count —
  * both exact BIGINTs produced by a distributed one-scan groupBy (the
  * only part of the fit that touches the corpus; this module sees only
  * the bounded pooled state, the quantizer-collect contract).
  *
  * The PAV fixpoint itself runs in INTEGER arithmetic: the merge
  * condition `mean(prev) >= mean(cur)` is the cross-multiplication
  * `hits_p * cnt_c >= hits_c * cnt_p`, evaluated in BigInt so block
  * masses up to full-corpus row counts (100 TB ≫ 2^31 rows) can never
  * overflow the compare. The fitted blocks therefore carry exact
  * (hits, cnt) rationals and the ONLY float
  * operation in the whole fit is the final hits/cnt division per block —
  * one correctly-rounded IEEE divide, reproducible on any engine.
  *
  * Why this matches the DuckDB minimax twin bit-for-bit (the proof the
  * query comment cites): the isotonic fit at point t equals
  * `max_{j<=t} min_{k>=t} avg[j..k]` (Robertson-Wright-Dykstra §1.2),
  * where every window avg is one division of exact integers. IEEE
  * round-to-nearest is MONOTONE, so `min_k round(q_k) = round(min_k q_k)`
  * (the min of rounded values is attained at a real minimizer) and
  * likewise for max — hence the double-computed minimax equals
  * round(real fit) = round(hits_B/cnt_B) of the PAV block B containing t,
  * which is exactly the division this module emits.
  *
  * Output blocks are compressed by DOUBLE prediction equality: PAV with
  * merge-on->= leaves adjacent blocks with strictly increasing real
  * means, but two reals within half an ulp can round to the same double;
  * both engines compress on the rounded value, so the run grouping is
  * identical by construction. A compressed row keeps the shared double
  * (NOT a re-division of the merged sums, which could round differently)
  * and the exact integer mass sums.
  */
object Pav {

  /** One fitted (compressed) calibration block. */
  final case class Block(
      scoreLo: Long, scoreHi: Long, hits: Long, cnt: Long,
      prediction: Double)

  /** Exact PAV over points sorted by score ascending. */
  def fit(points: Seq[(Long, Long, Long)]): Vector[Block] = {
    require(points.sliding(2).forall {
      case Seq(a, b) => a._1 < b._1
      case _ => true
    }, "PAV input must be strictly sorted by score")
    // mutable block stack: (scoreLo, scoreHi, hits, cnt)
    val st = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    points.foreach { case (score, hits, cnt) =>
      require(cnt > 0 && hits >= 0 && hits <= cnt, s"bad pooled mass at $score")
      var lo = score; var hi = score; var h = hits; var c = cnt
      // merge while the previous block's mean >= this one's: exact
      // integer cross-multiplication, no floats in the fixpoint
      while (st.nonEmpty &&
             BigInt(st.last._3) * c >= BigInt(h) * st.last._4) {
        val (plo, _, ph, pc) = st.remove(st.length - 1)
        lo = plo; h += ph; c += pc
      }
      st += ((lo, hi, h, c))
    }
    // compress adjacent blocks whose ROUNDED predictions coincide
    val out = scala.collection.mutable.ArrayBuffer.empty[Block]
    st.foreach { case (lo, hi, h, c) =>
      val p = h.toDouble / c.toDouble
      if (out.nonEmpty && out.last.prediction == p) {
        val prev = out.remove(out.length - 1)
        out += Block(prev.scoreLo, hi, prev.hits + h, prev.cnt + c, p)
      } else out += Block(lo, hi, h, c, p)
    }
    out.toVector
  }
}
