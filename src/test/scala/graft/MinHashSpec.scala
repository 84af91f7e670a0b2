package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFns._

/** MinHash/LSH semantics: identical docs always collide; signature
  * similarity tracks Jaccard; the banded pipeline surfaces planted
  * near-duplicates. */
class MinHashSpec extends SparkSpec {
  import spark.implicits._

  private def sigOf(text: String): Seq[Long] = {
    Seq(text).toDF("text")
      .select(minhashSig(
        array_distinct(h60All(shingles(tokens(col("text")), 3))), 32).as("sig"))
      .as[Seq[Long]].head()
  }

  test("identical docs → identical signatures → all bands collide") {
    val a = sigOf("the quick brown fox jumps over the lazy dog tonight")
    val b = sigOf("the quick brown fox jumps over the lazy dog tonight")
    assert(a == b && a.size == 32)
  }

  test("disjoint docs share (almost) no signature positions") {
    val a = sigOf("alpha beta gamma delta epsilon zeta eta theta iota kappa")
    val b = sigOf("one two three four five six seven eight nine ten eleven")
    val matches = a.zip(b).count { case (x, y) => x == y }
    assert(matches <= 3, s"expected ≤3 matching minhashes, got $matches")
  }

  test("near-duplicates (1-word edit) agree on most signature positions") {
    val base = "spark native analytics engine computes windowed slices of traffic data every hour with care"
    val edit = base.replace("every hour", "each hour")
    val a = sigOf(base); val b = sigOf(edit)
    val matches = a.zip(b).count { case (x, y) => x == y }
    assert(matches >= 16, s"expected ≥16/32 matching minhashes, got $matches")
  }

  test("dedup_minhash surfaces the planted near-dups at sf0.001 and none below threshold") {
    val out = SparkEntry.queries("dedup_minhash")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.forall(_.getDouble(2) >= DedupThr))
    assert(out.nonEmpty, "sf0.001 documents contain planted near-duplicates")
  }

  private val DedupThr = graft.queries.DedupQueries.JaccardThr
}
