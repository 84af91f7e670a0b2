package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator family lives in its own `graft.queries.*Queries` module as
  * a list of [[QuerySpec]]s (Spark program + DuckDB oracle twin); this
  * object just flattens them into the driver's two maps.
  */
object SparkEntry {

  val allQueries: Seq[QuerySpec] =
    KpiQueries.all ++
      RelationalQueries.all ++
      DedupQueries.all ++
      GraphQueries.all ++
      SimilarityQueries.all ++
      TextQueries.all ++
      ScalarQueries.all ++
      StreamingQueries.all ++
      MlQueries.all ++
      SourceQueries.all ++
      FormatQueries.all ++
      WarehouseQueries.all ++
      AnalyticsQueries.all ++
      StatsQueries.all ++
      SqlSurfaceQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("kpi_volume")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
