package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window/dedup layer (SURVEY.md §2e-2f).
  *
  * W2 — top-1-per-key after fan-out joins — is the reference's canonical
  * dedup (`FULL:744-757` ×8). W1 — a global `row_number()` surrogate key
  * (`FULL:413`) — is kept for parity but fenced: a global window is a
  * single-partition sort, which is a non-starter at 100 TB, so the scale
  * path is `surrogateKeyScalable` (partition-local ids + offset, the
  * classic zipWithIndex construction — one count job, no global sort).
  */
object TopK {

  /** W2: keep the best row per key. `orderBy` must be a total order per
    * key (include a unique tiebreak column) or results are
    * nondeterministic — the reference orders by `sallivedate desc` only;
    * we require callers to pass tiebreaks. Shuffles once on `keys`. */
  def top1PerKey(df: DataFrame, keys: Seq[Column], orderBy: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(orderBy: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Top-k generalization (k=1 reproduces the reference pattern). */
  def topKPerKey(df: DataFrame, keys: Seq[Column], orderBy: Seq[Column], k: Int): DataFrame = {
    require(k > 0, s"top-k needs k > 0, got $k")
    val w = Window.partitionBy(keys: _*).orderBy(orderBy: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** W1 (parity form): `concat('PM', lpad(row_number() over (order by key), 9, '0'))`
    * — `FULL:413`. Correct but serializes through one partition; only for
    * modest outputs (the reference's snapshot is ~140k rows, `CONN:80`). */
  def surrogateKeyGlobal(df: DataFrame, orderCol: Column, prefix: String = "PM",
      width: Int = 9, outCol: String = "surrogate_id"): DataFrame =
    df.withColumn(outCol,
      concat(lit(prefix),
        lpad(row_number().over(Window.orderBy(orderCol)).cast("string"), width, "0")))

  /** W1 (scale form): dense sequential ids without a global sort.
    * Sorts within partitions only, counts rows per partition (one light
    * job), then offsets — the standard distributed zipWithIndex. Ids are
    * assigned in (partition, local order) order; pre-`repartitionByRange`
    * on the order column if global order must follow `orderCol`. */
  def surrogateKeyScalable(df: DataFrame, orderCol: Column, prefix: String = "PM",
      width: Int = 9, outCol: String = "surrogate_id"): DataFrame = {
    val ranged = df.repartitionByRange(orderCol)
      .sortWithinPartitions(orderCol)
    // persist is load-bearing, not an optimization: offsets and the main
    // join both consume this frame, and two independent evaluations may
    // pick different sampled range boundaries / AQE-coalesced partition
    // counts — inconsistent __pid spaces silently drop or duplicate rows
    val withLocal = graft.CacheScope.persist(ranged
      .withColumn("__pid", spark_partition_id())
      .withColumn("__local",
        row_number().over(Window.partitionBy(col("__pid")).orderBy(orderCol))))
    val offsets = withLocal.groupBy(col("__pid")).count()
      .withColumn("__offset",
        coalesce(sum(col("count")).over(
          Window.orderBy(col("__pid")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("__pid"), col("__offset"))
    withLocal.join(broadcast(offsets), Seq("__pid"))
      .withColumn(outCol,
        concat(lit(prefix),
          lpad((col("__offset") + col("__local")).cast("string"), width, "0")))
      .drop("__pid", "__local", "__offset")
  }
}
