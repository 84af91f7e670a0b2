package graft

import graft.queries.QuerySpec

/** Pins rag_context_pack_mmr's diversity-vs-plain comparison (verdict
  * r19 #6): exact-integer MMR over the packing window must never REDUCE
  * the packed set's minimum pairwise chunk distance vs plain
  * retrieval-order packing from the same window and budget, and must
  * strictly improve it somewhere — measured gains at the gate SFs:
  * sf0.01 (2, 2, 0, 0), sf0.1 (6, 1, 1, 1) (plain packing at sf0.1
  * carries a near-dup pair at distance 1 that MMR pushes to 7). */
class MmrPackSpec extends SparkSpec {

  private def run(d: String): Array[org.apache.spark.sql.Row] =
    try {
      SparkEntry.allQueries.find(_.name == "rag_context_pack_mmr")
        .getOrElse(fail("no query named rag_context_pack_mmr"))
        .fn(spark, d).collect()
    } finally QuerySpec.releaseStaged()

  for (sf <- Seq("sf0.01", "sf0.1"))
    test(s"MMR packing never loses diversity and gains it somewhere at $sf") {
      val rows = run(s"/root/testdata/$sf")
      assert(rows.length == graft.queries.TextQueries.Bm25Queries.length)
      info(sf + " gains: " + rows.sortBy(_.getAs[Int]("query_id"))
        .map(r => r.getAs[Long]("diversity_gain")).mkString(", "))
      rows.foreach { r =>
        assert(r.getAs[Long]("diversity_gain") >= 0L,
          s"query ${r.getAs[Int]("query_id")}: MMR packing REDUCED " +
            s"min-pair distance (gain ${r.getAs[Long]("diversity_gain")})")
        // same window, same budget: MMR reorders, it must not pack less
        // text than some floor — both orders must have hit the budget
        // boundary (packed below the full window) for the comparison to
        // mean anything
        assert(r.getAs[Long]("n_packed_plain") <
          graft.queries.TextQueries.PackMmrCand.toLong,
          "plain packing consumed the whole candidate window — the " +
            "budget boundary is not being exercised; raise PackMmrCand")
      }
      assert(rows.exists(_.getAs[Long]("diversity_gain") > 0L),
        "MMR packing gained no diversity on any query — the re-rank " +
          "has stopped doing anything")
    }
}
