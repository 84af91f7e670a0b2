package graft

import org.apache.spark.sql.functions.col

import graft.queries.{QuerySpec, TmpDirs}

/** Crash-recovery contract of the five persisted-store lifecycle queries
  * (TextQueries / SimilarityQueries / StreamingQueries): parquet appends
  * — foreachBatch
  * micro-batch appends and the incremental "new shard" append alike —
  * are NOT idempotent under retry, so each query guards its store with a
  * `_READY` marker and rebuilds whenever the marker is absent (the
  * streaming pair by clearing the dir, the incremental pair through the
  * base write's overwrite mode). A died-mid-ingest store (partial or
  * double appends, dangling checkpoint) must never be served or resumed.
  * This spec simulates exactly the crash the query comments describe:
  * poison the store with a duplicated append, remove the marker, and
  * require the rerun to rebuild — the answer byte-stable and the store
  * back at its exact pre-poison row count. */
class StreamIngestRecoverySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String): Seq[String] =
    try {
      val q = SparkEntry.allQueries.find(_.name == name)
        .getOrElse(fail(s"no query named $name"))
      q.fn(spark, sf).collect().map(_.toString).sorted.toSeq
    } finally QuerySpec.releaseStaged()

  for ((name, prefix, sub, partCol) <- Seq(
      ("stream_chunk_ingest", "graft_ragstream_", "index", Some("c_id")),
      ("stream_ivf_ingest", "graft_ivfstream_", "index", Some("c_id")),
      ("rag_chunk_incremental", "graft_ragstore_", "index", Some("c_id")),
      ("ann_ivf_incremental", "graft_ivfstore_", "index", Some("c_id")),
      ("stream_asof_enrich", "graft_asofenrich_", "store", None))) {
    test(s"$name: died-mid-ingest store (no _READY) is rebuilt, not " +
        "resumed — poisoned double-append vanishes, answer byte-stable") {
      val first = run(name)
      assert(first.nonEmpty, s"$name over the drained store is empty")

      val dir = TmpDirs.scoped(s"$prefix${QuerySpec.jvmScopedKey(sf)}")
      val ready = new java.io.File(dir, "_READY")
      assert(ready.exists(), "first run must leave the _READY marker")
      val store = new java.io.File(dir, sub).getAbsolutePath
      val cleanRows = spark.read.parquet(store).count()
      assert(cleanRows > 0L)

      // The crash: a retried batch re-appended its rows, then the driver
      // died before _READY. Double every row and drop the marker.
      val clean = spark.read.parquet(store)
      partCol match {
        case Some(c) => clean.withColumn(c, col(c).cast("long"))
          .write.mode("append").partitionBy(c).parquet(store)
        case None => clean.write.mode("append").parquet(store)
      }
      assert(spark.read.parquet(store).count() == 2 * cleanRows,
        "poisoning must visibly double the store")
      assert(ready.delete(), "failed to remove the marker")

      val second = run(name)
      assert(ready.exists(), "rerun must re-create the _READY marker")
      assert(spark.read.parquet(store).count() == cleanRows,
        "rerun must rebuild the store from scratch — a resumed or " +
          "appended store keeps the doubled rows")
      assert(second == first,
        "the rebuilt store must answer byte-for-byte like the original")
    }
  }
}
