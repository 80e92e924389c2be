package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product-analytics funnels over an event log — the two standard
  * questions a warehouse answers about the `events` stream: "who
  * completed step A then step B within the window" (conversion) and
  * "of the users first seen on day D, how many were active k days
  * later" (cohort retention).
  *
  * Both are two-phase keyed aggregations: an anchor aggregate per user
  * (first step-A / first-seen day), a key-hash join back to the log,
  * and a final aggregate — every shuffle is on user_id or on the
  * (cohort, offset) output grain, nothing is ever quadratic, and the
  * anchor side is exactly one row per user.
  */
object Funnel {

  /** Two-step conversion: each key's FIRST `isA` event, then the
    * earliest `isB` event in (a.ts, a.ts + windowSeconds]. Keys with no
    * step-A event are absent; unconverted keys carry nulls. */
  def twoStep(events: DataFrame, key: Column, ts: Column,
      isA: Column, isB: Column, windowSeconds: Long): DataFrame = {
    val a = events.where(isA)
      .groupBy(key.as("k")).agg(min(ts).as("a_ts"))
    val b = events.where(isB)
      .select(key.as("k"), ts.as("b_ts"))
      .join(a, "k")
      .where(col("b_ts") >= col("a_ts") &&
        col("b_ts") <= col("a_ts") + expr(s"INTERVAL $windowSeconds SECONDS"))
      .groupBy(col("k")).agg(min(col("b_ts")).as("b_first"))
    a.join(b, Seq("k"), "left")
      .select(col("k"), col("a_ts"), col("b_first"),
        col("b_first").isNotNull.as("converted"),
        (col("b_first").cast("long") - col("a_ts").cast("long"))
          .as("secs_to_convert"))
  }

  /** Cohort retention: bucket each key by its first-seen day, then count
    * distinct active keys per (cohort day, day offset). Day arithmetic
    * stays on epoch seconds of day-truncated timestamps (exact 86400
    * multiples under the UTC session). */
  def cohortRetention(events: DataFrame, key: Column, ts: Column): DataFrame = {
    val act = events.select(key.as("k"), date_trunc("day", ts).as("day"))
    val first = act.groupBy(col("k")).agg(min(col("day")).as("cohort_day"))
    act.join(first, "k")
      .select(col("k"), col("cohort_day"),
        expr("(CAST(day AS LONG) - CAST(cohort_day AS LONG)) DIV 86400")
          .as("day_offset"))
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(countDistinct(col("k")).as("n_active"))
  }
}
