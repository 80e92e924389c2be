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
  * Unkeyed intervals (no shared key) use the bucketing trick instead:
  * quantize time into fixed buckets, join on bucket (intervals exploded
  * over the buckets they overlap), filter exactly — turning the range
  * predicate into an equi-join the same way the LSH buckets do for
  * similarity (`unkeyedInterval`).
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

  /** Unkeyed interval join: match probe rows into every interval
    * containing their timestamp when the two tables share NO key (IP
    * ranges, global time windows). A naive theta join is a nested loop —
    * O(|probe|·|intervals|). Bucketing makes it an equi-join: quantize
    * time into `bucketSeconds`-wide buckets, explode each interval over
    * the buckets it overlaps, give each probe row its single bucket, hash
    * join on the bucket, then apply the exact range predicate as a
    * residual filter.
    *
    * No dedup is needed: the probe side is never exploded, so each
    * (probe, interval) pair meets in exactly one bucket — the probe's.
    * Left-outer is also safe for the same reason (unmatched probe rows
    * surface once).
    *
    * Bucket math uses integer `div` on epoch seconds (monotone in ts), so
    * start <= ts <= end always implies bucket(start) <= bucket(ts) <=
    * bucket(end): no candidate is missed at bucket edges.
    *
    * Scale: fan-out per interval is span/bucketSeconds + 1; pick the
    * bucket width near the typical interval length so explosion stays
    * O(1) per interval while each bucket holds few intervals. */
  def unkeyedInterval(probe: DataFrame, intervals: DataFrame, ts: String,
      startCol: String, endCol: String, bucketSeconds: Long = 3600L,
      joinType: String = "inner"): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val p = probe.withColumn("__bucket",
      expr(s"unix_timestamp(`$ts`) div $bucketSeconds"))
    val iv = intervals.withColumn("__bucket",
      explode(sequence(
        expr(s"unix_timestamp(`$startCol`) div $bucketSeconds"),
        expr(s"unix_timestamp(`$endCol`) div $bucketSeconds"))))
    p.join(iv, p("__bucket") === iv("__bucket") &&
        p(ts) >= iv(startCol) && p(ts) <= iv(endCol), joinType)
      .drop("__bucket")
  }
}
