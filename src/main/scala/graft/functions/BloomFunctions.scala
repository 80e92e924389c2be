package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** SQL-callable handles on Spark's own Bloom-filter expressions (the
  * pair that powers runtime row-level semi-join filtering):
  * `graft_bloom_agg(longCol, estimatedItems, numBits)` builds the
  * filter's bytes as one aggregate value, and
  * `graft_bloom_might_contain(filterBytes, longCol)` probes it — a
  * no-false-NEGATIVE membership test. At 100 TB this is the
  * decontamination shape: the benchmark's n-gram set compacts to a
  * megabyte of filter that BROADCASTS to every executor, and the
  * training corpus probes locally — no shuffle of the corpus against
  * the benchmark relation at all. */
object BloomFunctions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_agg",
      exprs => new BloomFilterAggregate(exprs(0), exprs(1), exprs(2))
        .toAggregateExpression(),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_might_contain",
      exprs => BloomFilterMightContain(exprs(0), exprs(1)),
      "built-in")
  }
}
