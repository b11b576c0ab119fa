package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.engine.Graft

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every operator pack; each entry has a matching
  * DuckDB oracle in `oracleSql` (same column names, same rounding, same
  * ORDER BY) unless the op is not SQL-expressible.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(Graft.tune(spark), "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.TimeSeries.queries ++
      graft.queries.Pipeline.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracle ++
      graft.queries.TimeSeries.oracle ++
      graft.queries.Pipeline.oracle
}
