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
    * driver's long-lived shared session clean — the blocks die with the
    * RDD reference instead of piling up in the cache manager; on a real
    * multi-executor deployment with dynamic allocation, use
    * `persist(MEMORY_AND_DISK)` or a reliable checkpoint instead (local
    * checkpoints are lost with their executor). */
  def staged(df: DataFrame): DataFrame = df.localCheckpoint()
}
