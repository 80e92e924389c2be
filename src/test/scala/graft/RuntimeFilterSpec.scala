package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Runtime semi-join reduction: with the optimizer's bloom-filter
  * injection enabled, a shuffle join against a selectively-filtered
  * build side must probe-filter the big side BEFORE the shuffle — at
  * 100 TB this is the difference between shuffling the whole fact and
  * shuffling the matching sliver. The manual forms of the same idea are
  * `DataSkipping` (file level) and the broadcast dims (map-side); this
  * pins that the runtime level engages too.
  */
class RuntimeFilterSpec extends SparkSuite {

  test("selective shuffle join injects a bloom runtime filter") {
    val conf = spark.conf
    val saved = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtimeFilter.number.threshold")
      .map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "0")
      val li = Tables.load(spark, sf, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_quantity")
      val supp = Tables.load(spark, sf, "supplier")
        .where(col("s_acctbal") > 9000.0) // selective build side
        .select("s_suppkey", "s_name")
      val joined = li.join(supp, li("l_suppkey") === supp("s_suppkey"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"), plan.take(1500))
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("join strategy hints override the planner's default choice") {
    val li = Tables.load(spark, sf, "lineitem").select("l_suppkey", "l_quantity")
    val supp = Tables.load(spark, sf, "supplier").select("s_suppkey", "s_name")
    def planWith(hint: String): String = {
      val j = li.join(supp.hint(hint), li("l_suppkey") === supp("s_suppkey"))
      j.collect()
      j.queryExecution.executedPlan.toString
    }
    // tiny dim would broadcast by default; each hint must force its shape
    assert(planWith("shuffle_hash").contains("ShuffledHashJoin"))
    assert(planWith("merge").contains("SortMergeJoin"))
    assert(planWith("broadcast").contains("BroadcastHashJoin"))
  }
}
