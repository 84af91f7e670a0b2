package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: the Spark program plus (when SQL-expressible)
  * its DuckDB oracle twin over the same parquet tables. Non-SQL-expressible
  * operators (streaming, LSH, model inference) omit the oracle and get the
  * driver's weaker rows-only check. */
final case class QuerySpec(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QuerySpec {
  def checked(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): QuerySpec =
    QuerySpec(name, fn, Some(oracle))

  def rowsOnly(name: String)(
      fn: (SparkSession, String) => DataFrame): QuerySpec =
    QuerySpec(name, fn, None)

  /** Materialize a small shared intermediate ONCE (executor-local blocks,
    * lineage truncated) so every self-join/multi-consumer branch reads the
    * computed rows instead of re-running the producing subtree — Catalyst
    * plans each branch of a self-join with fresh expression ids, so
    * ReuseExchange never fires on them (measured: the minhash signature
    * chain recomputed ~6× through its candidate/verify joins). This is the
    * cluster-scale pattern too: a dedup pass persists its inverted index
    * before the pair joins. `localCheckpoint` (not `.cache()`) keeps the
    * driver's long-lived shared session clean; on a real multi-executor
    * deployment with dynamic allocation, use `persist(MEMORY_AND_DISK)` or
    * a reliable checkpoint instead (local checkpoints are lost with their
    * executor).
    *
    * Every block a `staged` call creates is recorded so the runner can
    * free it deterministically with [[releaseStaged]] after the consuming
    * action, instead of leaving the blocks to the driver JVM's GC (across
    * the harness's many invocations per long-lived session they would
    * otherwise linger until the next full collection). */
  def staged(df: DataFrame): DataFrame = {
    val sc = df.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val out = df.localCheckpoint() // eager: the blocks exist on return
    sc.getPersistentRDDs.foreach { case (id, rdd) =>
      if (!before.contains(id)) liveBlocks.get().add(rdd)
    }
    out
  }

  /** Key for JVM-scoped reusable layouts under java.io.tmpdir (bucketed
    * tables, keeper stores, partitioned fact copies): md5 of the CANONICAL
    * sf path — a 31-bit String.hashCode collision between two sf dirs
    * would silently pass reuse checks and read the wrong data — plus the
    * JVM pid, so concurrent Bench/Verify JVMs sharing one tmpdir can never
    * race each other's mode(overwrite) writes. */
  def jvmScopedKey(sfDir: String): String = {
    val canonical = new java.io.File(sfDir).getCanonicalPath
    java.security.MessageDigest.getInstance("MD5")
      .digest(canonical.getBytes("UTF-8"))
      .take(6).map("%02x".format(_)).mkString +
      s"_${ProcessHandle.current().pid()}"
  }

  // THREAD-scoped registry (ADVICE round 4): a global queue let any caller
  // unpersist blocks another thread's staged DataFrame still needed —
  // unrecoverable, because localCheckpoint truncates lineage. Scoping per
  // thread makes the failure mode of cross-thread misuse a leak (blocks
  // linger until JVM exit — recoverable, visible) instead of
  // checkpoint-block-not-found at a distance.
  private val liveBlocks = ThreadLocal.withInitial[
    java.util.ArrayDeque[org.apache.spark.rdd.RDD[_]]](
    () => new java.util.ArrayDeque)

  /** Unpersist every block created by [[staged]] ON THIS THREAD since its
    * last release. Call after the consuming action has materialized the
    * query result — the checkpointed rows are never needed across query
    * invocations.
    *
    * Contract: the releasing thread must be the thread that ran the query
    * (true for Verify, Bench, and the specs, which are all sequential
    * single-thread runners). A release never touches blocks staged by
    * other threads, so concurrent runners are safe by construction; a
    * stage-on-thread-A / release-on-thread-B mismatch leaks A's blocks
    * until the JVM exits rather than corrupting anything. */
  def releaseStaged(): Unit = {
    val q = liveBlocks.get()
    var r = q.poll()
    while (r != null) { r.unpersist(blocking = false); r = q.poll() }
  }
}
