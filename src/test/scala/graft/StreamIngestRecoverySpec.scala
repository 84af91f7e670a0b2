package graft

import org.apache.spark.sql.functions.col

import graft.queries.{QuerySpec, TmpDirs}

/** Crash-recovery contract of the streaming chunk ingest
  * (`stream_chunk_ingest`, TextQueries): foreachBatch parquet appends are
  * NOT idempotent under batch retry, so the query guards the store with a
  * `_READY` marker and rebuilds from scratch whenever the marker is
  * absent — a died-mid-ingest store (partial or double appends, dangling
  * checkpoint) must never be served or resumed. This spec simulates the
  * crash the comment describes: poison the store with a duplicated
  * append, remove the marker, and require the rerun to rebuild — the
  * retrieval answer byte-stable and the store back at its exact
  * pre-poison row count. */
class StreamIngestRecoverySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def run(): Seq[String] =
    try {
      val q = SparkEntry.allQueries.find(_.name == "stream_chunk_ingest")
        .getOrElse(fail("no query named stream_chunk_ingest"))
      q.fn(spark, sf).collect().map(_.toString).sorted.toSeq
    } finally QuerySpec.releaseStaged()

  test("died-mid-ingest store (no _READY) is rebuilt, not resumed: " +
      "poisoned double-append vanishes and the answer is byte-stable") {
    val first = run()
    assert(first.nonEmpty, "the retrieval over the drained store is empty")

    val dir = TmpDirs.scoped(s"graft_ragstream_${QuerySpec.jvmScopedKey(sf)}")
    val ready = new java.io.File(dir, "_READY")
    assert(ready.exists(), "first run must leave the _READY marker")
    val store = new java.io.File(dir, "index").getAbsolutePath
    val cleanRows = spark.read.parquet(store).count()
    assert(cleanRows > 0L)

    // The crash: a batch retry re-appended its rows, then the driver died
    // before _READY. Double every row and drop the marker.
    val poison = spark.read.parquet(store)
      .withColumn("c_id", col("c_id").cast("long"))
    poison.write.mode("append").partitionBy("c_id").parquet(store)
    assert(spark.read.parquet(store).count() == 2 * cleanRows,
      "poisoning must visibly double the store")
    assert(ready.delete(), "failed to remove the marker")

    val second = run()
    assert(ready.exists(), "rerun must re-create the _READY marker")
    assert(spark.read.parquet(store).count() == cleanRows,
      "rerun must rebuild the store from scratch — a resumed or appended " +
        "store keeps the doubled rows")
    assert(second == first,
      "the rebuilt store must answer retrieval byte-for-byte like the " +
        "original ingest")
  }
}
