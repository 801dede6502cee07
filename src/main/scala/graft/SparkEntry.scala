package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Runs the engine's summary-rollup path (tile encode → prefix rollup →
    * cell-center decode) over synthesized geo — SURVEY §2 E1/G2. */
  def entry(spark: SparkSession): DataFrame =
    QueryCatalog.queries("e1_tile_rollup")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueryCatalog.queries

  /** For each key in queries, equivalent SQL runnable by DuckDB on the same
    * parquet tables. Omitted for ops whose semantics live in UDFs (collator
    * matching, OLC decode, polygon math) → driver records rows-only check. */
  def oracleSql: Map[String, String] = QueryCatalog.oracleSql
}
