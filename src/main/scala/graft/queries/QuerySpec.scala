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
}
