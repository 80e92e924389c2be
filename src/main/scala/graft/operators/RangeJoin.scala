package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join: match rows to the interval containing their
  * timestamp.
  *
  * Keyed form (here): when intervals carry the same key as the probe
  * side, the join is an equi-join on the key with the range predicate as
  * a residual filter — a plain hash join, no nested loop, because the
  * per-key interval count is small. This is the 100 TB shape for
  * "events into sessions" style enrichment.
  *
  * Unkeyed intervals (no shared key) need the bucketing trick instead:
  * quantize time into fixed buckets, join on bucket (intervals exploded
  * over the buckets they overlap), filter exactly — turning the range
  * predicate into an equi-join the same way the LSH buckets do for
  * similarity. Not needed for the current surface; documented for when
  * an unkeyed interval table shows up.
  */
object RangeJoin {

  /** Attach the interval (key, start, end] containing `ts`. Inner by
    * default: rows outside every interval drop. */
  def keyedInterval(probe: DataFrame, intervals: DataFrame, key: String,
      ts: String, startCol: String, endCol: String,
      joinType: String = "inner"): DataFrame =
    probe.join(intervals,
      probe(key) === intervals(key) &&
        probe(ts) >= intervals(startCol) && probe(ts) <= intervals(endCol),
      joinType)
      .drop(intervals(key))
}
