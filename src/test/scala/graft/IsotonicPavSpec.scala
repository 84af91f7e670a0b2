package graft

import graft.ml.Pav

/** Exact-PAV contract: brute-force minimax equivalence on adversarial
  * small cases, PAV invariants, and a cross-check against MLlib's
  * production IsotonicRegression on real data (ulp-tolerant — MLlib
  * pools pre-averaged weighted doubles, so its block means are float
  * paths, not the exact hits/cnt rationals the declared query emits).
  */
class IsotonicPavSpec extends SparkSpec {

  /** Reference fit: the minimax identity, in exact rational arithmetic
    * (BigInt cross-compare), evaluated pointwise — O(n^3), test-only. */
  private def minimax(pts: Seq[(Long, Long, Long)]): Seq[Double] = {
    val n = pts.length
    def avgNum(j: Int, k: Int) = (j to k).map(pts(_)._2).sum
    def avgDen(j: Int, k: Int) = (j to k).map(pts(_)._3).sum
    (0 until n).map { t =>
      // max over j<=t of min over k>=t, chosen by exact rational compare
      val best = (0 to t).map { j =>
        (t until n).map(k => (avgNum(j, k), avgDen(j, k)))
          .minBy(r => (BigDecimal(r._1) / BigDecimal(r._2)))
      }.maxBy(r => (BigDecimal(r._1) / BigDecimal(r._2)))
      best._1.toDouble / best._2.toDouble
    }
  }

  private def expand(blocks: Vector[Pav.Block],
                     pts: Seq[(Long, Long, Long)]): Seq[Double] =
    pts.map { case (s, _, _) =>
      blocks.find(b => b.scoreLo <= s && s <= b.scoreHi)
        .getOrElse(fail(s"score $s not covered by any block")).prediction
    }

  private val cases: Seq[Seq[(Long, Long, Long)]] = Seq(
    // already isotonic — no merges
    Seq((1L, 0L, 2L), (2L, 1L, 2L), (3L, 2L, 2L)),
    // fully anti-isotonic — collapses to one pool
    Seq((1L, 3L, 3L), (2L, 2L, 3L), (3L, 1L, 3L), (4L, 0L, 3L)),
    // the classic zig-zag: merge cascades backwards through the stack
    Seq((1L, 1L, 1L), (2L, 0L, 1L), (3L, 1L, 1L), (4L, 0L, 1L),
      (5L, 1L, 1L)),
    // unequal masses: a heavy violator drags a long prefix down
    Seq((1L, 0L, 10L), (2L, 9L, 10L), (3L, 0L, 30L), (4L, 5L, 5L)),
    // equal means across a gap (1/3 then 2/6): merge-on->= pools them
    Seq((1L, 1L, 3L), (2L, 2L, 6L), (3L, 3L, 3L)),
    // single point
    Seq((7L, 2L, 5L)))

  test("PAV equals the exact minimax fit on adversarial cases") {
    cases.foreach { pts =>
      val got = expand(Pav.fit(pts), pts)
      val want = minimax(pts)
      assert(got == want, s"pts=$pts got=$got want=$want")
    }
  }

  test("PAV invariants: monotone, unit range, exact mass preservation") {
    cases.foreach { pts =>
      val blocks = Pav.fit(pts)
      assert(blocks.sliding(2).forall {
        case Seq(a, b) => a.prediction < b.prediction // compressed: strict
        case _ => true
      })
      assert(blocks.forall(b => b.prediction >= 0.0 && b.prediction <= 1.0))
      assert(blocks.map(_.hits).sum == pts.map(_._2).sum)
      assert(blocks.map(_.cnt).sum == pts.map(_._3).sum)
      // blocks tile the score range in order
      assert(blocks.sliding(2).forall {
        case Seq(a, b) => a.scoreHi < b.scoreLo
        case _ => true
      })
    }
  }

  test("cross-check vs MLlib IsotonicRegression on sf0.001 events") {
    import org.apache.spark.sql.functions._
    val s = spark
    val data = Tables.events(s, "/root/testdata/sf0.001")
      .select(
        when(col("event_type") === "purchase", 1.0).otherwise(0.0)
          .as("label"),
        floor(col("value")).cast("double").as("score"))
    val assembled = new org.apache.spark.ml.feature.VectorAssembler()
      .setInputCols(Array("score")).setOutputCol("features")
      .transform(data)
    val model = new org.apache.spark.ml.regression.IsotonicRegression()
      .setLabelCol("label").setFeaturesCol("features").fit(assembled)
    val pts = data.groupBy(col("score").cast("long").as("score"))
      .agg(sum(col("label")).cast("long").as("hits"),
        count(lit(1)).as("cnt"))
      .orderBy("score").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val blocks = Pav.fit(pts)
    val exact = expand(blocks, pts)
    val mllib = pts.map(p => model.predict(p._1.toDouble))
    exact.zip(mllib).zip(pts).foreach { case ((e, m), p) =>
      assert(math.abs(e - m) < 1e-9,
        s"score ${p._1}: exact PAV $e vs MLlib $m")
    }
  }
}
