package graft

import graft.queries.{DedupQueries, QuerySpec}

/** Lifecycle contract for QuerySpec.staged: every localCheckpoint block a
  * query stages is tracked and freed by releaseStaged — no reliance on the
  * driver JVM's GC to reclaim block-manager memory between the harness's
  * many invocations in one long-lived session. */
class StagedLifecycleSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("staged blocks are tracked and releaseStaged unpersists them all") {
    QuerySpec.releaseStaged() // drain anything earlier suites left behind
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val q = DedupQueries.all.find(_.name == "dedup_minhash").get
    assert(q.fn(spark, sf).count() >= 0)
    val during = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(during.nonEmpty, "dedup_minhash should have staged intermediates")
    QuerySpec.releaseStaged()
    val after = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(after.isEmpty,
      s"staged blocks must be gone after releaseStaged, still live: $after")
  }

  test("releaseStaged is idempotent and safe with nothing staged") {
    QuerySpec.releaseStaged()
    QuerySpec.releaseStaged()
  }

  test("a release on one thread never frees blocks another thread staged") {
    // ADVICE round 4: the old process-global registry let any caller
    // unpersist a concurrent runner's localCheckpoint blocks — lineage is
    // truncated, so those rows are unrecoverable. The registry is now
    // thread-scoped: thread B's release must leave thread A's blocks live.
    QuerySpec.releaseStaged()
    val before = spark.sparkContext.getPersistentRDDs.keySet
    import spark.implicits._
    val staged = QuerySpec.staged(Seq(1, 2, 3).toDF("x"))
    val mine = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(mine.nonEmpty)
    val t = new Thread(() => QuerySpec.releaseStaged())
    t.start(); t.join()
    val after = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(after == mine, "another thread's release must not free my blocks")
    assert(staged.count() == 3) // still usable
    QuerySpec.releaseStaged()   // my own release frees them
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).isEmpty)
  }
}
