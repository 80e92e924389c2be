package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed co-located joins: both sides pre-hashed into the same bucket
  * layout on the join key, so the join runs with NO shuffle of either
  * side — at 100 TB this is the difference between a join that moves
  * the fact table over the network every run and one that never does.
  * Locally the bucket layout lives in Spark's session catalog as
  * external parquet tables.
  */
object Bucketing {

  /** Write `df` as a bucketed external table (idempotent overwrite). */
  def writeBucketed(spark: SparkSession, df: DataFrame, table: String,
      path: String, buckets: Int, key: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
  }

  /** orders ⋈ lineitem on the order key via matching bucket layouts; the
    * sort-merge join consumes bucket-local sorted data directly (no
    * Exchange on either side — asserted in BucketingSpec). */
  def coLocatedOrderJoin(spark: SparkSession, dir: String): DataFrame = {
    val base = "/root/repo/target/stage/bucketed"
    writeBucketed(spark,
      Tables.load(spark, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice"),
      "b_orders", s"$base/b_orders", 8, "o_orderkey")
    writeBucketed(spark,
      Tables.load(spark, dir, "lineitem")
        .select("l_orderkey", "l_quantity", "l_extendedprice"),
      "b_lineitem", s"$base/b_lineitem", 8, "l_orderkey")
    spark.table("b_orders")
      .hint("merge") // force SMJ so the bucket layout (not a broadcast) carries the join
      .join(spark.table("b_lineitem"),
        col("o_orderkey") === col("l_orderkey"), "inner")
      .groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity")).as("sum_qty"),
        max(col("o_totalprice")).as("total_price"))
  }
}
