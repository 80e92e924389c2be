package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.CacheScope

/** Time-series resampling: bucket an event log onto a regular grid and
  * fill the gaps by carrying the last observation forward.
  *
  * Beyond-parity (SURVEY.md §2i family): the reference aggregates event
  * time only where observations exist; telemetry consumers at scale need
  * the dense grid — every (key, bucket) cell present, empty cells filled
  * with the last observed value — so downstream windowed math never sees
  * missing rows.
  *
  * Dataflow: aggregate per (key, bucket) — map-side partial combine makes
  * this the only pass over the raw log — then derive each key's
  * [min, max] bucket span, explode a `sequence` spine over it, left-join
  * the observed cells back, and run one `last(ignoreNulls)` window per
  * key for the carry-forward. Spine size is keys × span-buckets, NOT the
  * raw row count: at 100 TB of events the exploded spine stays small as
  * long as the bucket width matches the span (hours over months, minutes
  * over days); the generator is distributed (explode after a groupBy),
  * never a driver loop.
  */
object Resample {

  /** Hourly grid with last-observation-carried-forward.
    *
    * @param events  observation log
    * @param key     series key column
    * @param ts      event-time column (TimestampType)
    * @param value   observed measure; summed per bucket through
    *                DECIMAL(14,4) so partial-agg order can't perturb the
    *                double result
    * @return (key, hour, n_events, is_gap, filled_value) — `filled_value`
    *         is null only for gaps before a key's first observation
    */
  def gapFillHourly(events: DataFrame, key: Column, ts: Column,
      value: Column): DataFrame = {
    val hourly = CacheScope.persist(
      events
        .groupBy(key.as("k"), date_trunc("hour", ts).as("hour"))
        .agg(sum(value.cast(DecimalType(14, 4))).cast("double").as("v"),
          count(lit(1)).as("n")))
    val spine = hourly
      .groupBy(col("k"))
      .agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
      .select(col("k"),
        explode(sequence(col("h0"), col("h1"), expr("interval 1 hour")))
          .as("hour"))
    val carry = Window.partitionBy(col("k")).orderBy(col("hour"))
      .rowsBetween(Window.unboundedPreceding, 0)
    spine
      .join(hourly, Seq("k", "hour"), "left")
      .select(col("k"), col("hour"),
        coalesce(col("n"), lit(0L)).as("n_events"),
        col("v").isNull.as("is_gap"),
        last(col("v"), ignoreNulls = true).over(carry).as("filled_value"))
  }
}
