package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{CoreQueries, DedupQueries, ExtendedQueries, SeriesQueries, TextQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator catalog (SURVEY.md §2 inventory); each entry
  * with a matching `oracleSql` key is hash-compared against DuckDB on
  * sf0.01 by the driver. Entries without oracle SQL (xxhash64-based LSH
  * ops) get a rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H-Q1-style pricing summary — exercises scan, filter pushdown,
    * partial+final hash aggregation, and total-order sort in one plan.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    (CoreQueries.defs ++ TextQueries.defs ++ DedupQueries.defs ++
      ExtendedQueries.defs ++ SeriesQueries.defs).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    (CoreQueries.oracle ++ TextQueries.oracle ++ DedupQueries.oracle ++
      ExtendedQueries.oracle ++ SeriesQueries.oracle).toMap
}
