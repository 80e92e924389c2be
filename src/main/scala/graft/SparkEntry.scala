package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.Registry

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * All queries live in `graft.queries.Registry`, each paired with its
  * DuckDB oracle so the two can't drift apart.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Composes the reference's main-pipeline shape end-to-end
    * (SURVEY.md §3 EP1): decode star → recodes → repair ladder →
    * surrogate key → nested document. */
  def entry(spark: SparkSession): DataFrame =
    Flagship.prospectPipeline(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Every registered query has one: nested
    * and streaming outputs are materialized and flattened/reduced to a
    * hashable projection inside the query itself. */
  def oracleSql: Map[String, String] =
    Registry.all.flatMap(q => q.oracle.map(o => q.name -> o.trim)).toMap
}
