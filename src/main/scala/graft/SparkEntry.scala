package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.CoreQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  private def registry: Seq[graft.queries.QueryDef] =
    CoreQueries.all ++ graft.queries.PipelineQueries.all ++
      graft.queries.ExtendedQueries.all ++ graft.queries.TemporalQueries.all ++
      graft.queries.OlapQueries.all ++ graft.queries.SelectionQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * DQ2: exact top-5 KNN by squared L2 — the reference's entire query path
    * (scan → score → top-k merge) as one Spark job.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q02_knn_exact")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
