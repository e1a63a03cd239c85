package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Catalog, RelationalQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` / `oracleSql` are assembled in [[graft.queries.Catalog]]: one
  * entry per operator class of SURVEY.md §2 plus the LLM-data-pipeline
  * operators (dedup, similarity search, text analysis).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The 4-way broadcast-join enrichment pipeline (SURVEY §2.4 J5-J8). */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.jMultiwayRevenue(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Catalog.queries

  /** For each key in queries, equivalent SQL runnable by DuckDB on the same
    * parquet tables. */
  def oracleSql: Map[String, String] = Catalog.oracleSql
}
