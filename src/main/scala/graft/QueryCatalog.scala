package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named engine query: Spark implementation + (when SQL-expressible) an
  * equivalent DuckDB oracle statement over the same parquet tables.
  *
  * Conventions that keep the driver's hash-compare stable:
  *   - every query ORDER BYs a unique key set (identical row order in both
  *     engines, independent of partitioning);
  *   - every float-producing computation is `round()`ed the same way on both
  *     sides (sum-order and libm ulp differences vanish at the rounded
  *     precision);
  *   - integer sums are CAST(.. AS BIGINT) in DuckDB (whose SUM(int) is
  *     HUGEINT) to match Spark's LongType.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryCatalog {
  def all: Seq[Q] =
    CatalogCore.entries ++ CatalogGeo.entries ++ CatalogText.entries ++
      CatalogPlaces.entries ++ CatalogPipeline.entries ++ CatalogExtra.entries ++
      CatalogOps.entries ++ CatalogSources.entries

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
