package graft

import org.apache.spark.sql.functions._

/** Round-7 hygiene pins for the ML query plumbing.
  *
  * 1. `spreadWindows` must follow the SESSION's parallelism (a literal
  *    width silently under-parallelizes a bigger cluster — round-6
  *    verdict #3) while keeping a fully deterministic row→partition
  *    mapping: hash partitioning on (slice, t) VALUES, not
  *    RangePartitioner's rdd-id-seeded sampling (round-6 ADVICE), so the
  *    partition-ordered gradient folds see identical layouts run to run.
  *
  * 2. `dumpWithInvariants` must execute its input plan exactly ONCE —
  *    the collected rows back both the parquet dump and the returned
  *    LocalRelation (round-6 verdict #4: a float plan re-executed for the
  *    dump could land ulps away under a different partial-sum order, and
  *    it would double the query's cost).
  */
class MlHygieneSpec extends SparkSpec {
  import queries.MlQueries

  private def windows(n: Int) = {
    import spark.implicits._
    (0 until n).map(i => (s"slice${i % 5}", i.toLong, i.toDouble))
      .toDF("slice", "t", "v")
  }

  test("spreadWindows width follows the session's default parallelism") {
    val spread = MlQueries.spreadWindows(windows(200))
    assert(spread.rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
  }

  test("spreadWindows layout is deterministic across invocations") {
    def layout() = MlQueries.spreadWindows(windows(200)).rdd
      .mapPartitionsWithIndex { case (pid, it) =>
        it.map(r => (pid, r.getString(0), r.getLong(1)))
      }.collect().toSeq
    assert(layout() == layout()) // same partition AND same order, per row
  }

  test("dumpWithInvariants executes the input plan exactly once") {
    val acc = spark.sparkContext.longAccumulator("probe_evals")
    val touch = udf { (x: Long) => acc.add(1); x }.asNondeterministic()
    val df = windows(50).select(col("slice"), touch(col("t")).as("t"))
    val out = MlQueries.dumpWithInvariants(spark, "spec_probe_dump", df) {
      rows => Seq("n_is_50" -> (rows.length == 50))
    }
    val collected = out.collect()
    assert(acc.value == 50L) // one evaluation per row, not 2x
    assert(collected.length == 50)
    assert(collected.forall(_.getAs[Boolean]("n_is_50")))
  }
}
