package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{Canary, GasStoreQueries, MultimodalQueries, Relational, TextOps, TimeSeries, VectorOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is registered here as a
  * named query `(SparkSession, sfDir) => DataFrame`; where the semantics are
  * SQL-expressible, [[oracleSql]] carries the equivalent ANSI SQL that the
  * driver runs in DuckDB over the same parquet tables. Column names and
  * types are aligned pairwise (the driver hash-compares after sorting
  * columns by name).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * This is the reference's headline shape — Grafana's `aggregateWindow`
    * downsampling over the long point model (SURVEY.md §2.11 Q4). */
  def entry(spark: SparkSession): DataFrame =
    queries("ts03_downsample_1h")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ TimeSeries.queries ++ TextOps.queries ++
      VectorOps.queries ++ MultimodalQueries.queries ++
      GasStoreQueries.queries ++ Canary.queries

  def oracleSql: Map[String, String] =
    Relational.oracle ++ TimeSeries.oracle ++ TextOps.oracle ++
      VectorOps.oracle ++ MultimodalQueries.oracle ++
      GasStoreQueries.oracle ++ Canary.oracle
}
