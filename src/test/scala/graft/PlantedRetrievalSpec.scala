package graft

import graft.queries.QuerySpec

/** Pins the round-20 planted-relevance harness (verdict #2): the fusion
  * evals' truth is PLANTED (deterministic lex/vec/both perturbations of
  * fixed doc ids — see TextQueries.PlantedQueries), independent of both
  * rankers, so the alpha sweep can have — and measurably HAS — an
  * interior optimum. The round-19 harness used the exhaustive vector
  * ranking as truth, which made the sweep monotone toward the vector
  * end by construction; these tests are the regression fence against
  * that bias ever returning.
  *
  * Pinned at BOTH SFs (the gate SFs), with the measured curves quoted:
  *   sf0.01: 0.850 | 0.925 0.925 0.925 | 0.800
  *   sf0.1:  0.850 | 0.875 0.875 0.825 | 0.675
  * (endpoints wl=1,9 outside the bars). The argmax is interior at both
  * — a TIE among interior cells is honest and allowed; what must never
  * hold is an ENDPOINT matching the max (the monotone-bias signature).
  */
class PlantedRetrievalSpec extends SparkSpec {

  private def run(name: String, d: String): Array[org.apache.spark.sql.Row] =
    try {
      SparkEntry.allQueries.find(_.name == name)
        .getOrElse(fail(s"no query named $name")).fn(spark, d).collect()
    } finally QuerySpec.releaseStaged()

  private def meanRecallByAlpha(d: String): Map[Long, Double] =
    run("retrieval_alpha_ladder", d)
      .groupBy(_.getAs[Long]("alpha_lex10"))
      .map { case (wl, rs) =>
        wl -> rs.map(_.getAs[Long]("n_hits")).sum.toDouble /
          (rs.length * graft.queries.TextQueries.Bm25TopK)
      }

  for (sf <- Seq("sf0.01", "sf0.1"))
    test(s"alpha ladder has an interior argmax at $sf (no endpoint " +
        "matches the max)") {
      val m = meanRecallByAlpha(s"/root/testdata/$sf")
      assert(m.keySet == Set(1L, 3L, 5L, 7L, 9L), s"grid missing: $m")
      val endpointMax = math.max(m(1L), m(9L))
      val interiorMax = Seq(m(3L), m(5L), m(7L)).max
      info(s"$sf curve: " + Seq(1L, 3L, 5L, 7L, 9L)
        .map(w => f"wl=$w ${m(w)}%.3f").mkString(", "))
      assert(interiorMax > endpointMax,
        s"alpha sweep argmax is at an endpoint ($m) — the harness has " +
          "re-acquired a single-side bias and cannot tune alpha")
    }

  test("fused retrieval beats BM25-only on the planted truth at sf0.01 " +
      "(the reason to fuse, measured)") {
    val rows = run("retrieval_rrf_recall", "/root/testdata/sf0.01")
    assert(rows.length == graft.queries.TextQueries.PlantedQueries.length)
    rows.foreach { r =>
      val (rrf, bm25) = (r.getAs[Double]("recall_rrf6"),
        r.getAs[Double]("recall_bm25_6"))
      assert(rrf >= bm25,
        s"query ${r.getAs[Int]("query_id")}: fused recall $rrf < " +
          s"BM25-only $bm25")
    }
    // and strictly better somewhere: the vec-planted truth is invisible
    // to BM25, so fusion must add recall on at least one query
    assert(rows.exists(r => r.getAs[Double]("recall_rrf6") >
      r.getAs[Double]("recall_bm25_6")),
      "fusion added no recall over BM25-only anywhere — the vector " +
        "side has stopped contributing")
  }
}
