package graft

import graft.sources.Bucketing

class BucketingSpec extends SparkSuite {

  test("bucketed join plans without shuffling either join side") {
    val df = Bucketing.coLocatedOrderJoin(spark, sf)
    df.count() // materialize through AQE so the final plan is real
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
    // the only exchange allowed is the post-join aggregation's (none for
    // the join inputs): the join keys are bucket-distributed already —
    // and since the aggregation is on the join key, even that collapses
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 0, s"found $exchanges shuffles in:\n$plan")
  }
}
