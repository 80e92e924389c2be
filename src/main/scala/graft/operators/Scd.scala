package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history build from a change log.
  *
  * The reference materializes point-in-time snapshots and reconciles them
  * downstream (SURVEY.md §2a S2/S3: `dataset_date=` partition dirs,
  * `FULL:72,1450`); a warehouse consuming those snapshots at 100 TB needs
  * the complementary operator — collapse an observation log into
  * versioned validity intervals so "state as of T" becomes a range lookup
  * instead of a full-snapshot scan. Beyond-parity, same family as the
  * as-of join (`AsOfJoin`), which is the read-side of this write-side op.
  *
  * Dataflow: one window pass marks rows where any tracked attribute
  * differs from the previous observation (null-safe), a running sum turns
  * the marks into per-key version numbers, a groupBy collapses each run,
  * and a second window derives `valid_to` from the next run's
  * `valid_from`. All three stages hash/partition on the entity key (the
  * groupBy keys are key-prefixed), so at scale this is shuffle-bounded by
  * the log itself and never widens: state per key is one row per CHANGE,
  * not per observation.
  */
object Scd {

  /** Collapse `log` (one row per observation) into SCD2 intervals.
    *
    * @param key      entity key column
    * @param orderCols total order of observations within a key — include
    *                  a unique tiebreak column last (window determinism)
    * @param tracked  attribute columns whose changes open a new version
    * @return one row per (key, version): tracked attrs + `version`
    *         (1-based, monotone in observation order), `valid_from`
    *         (first observation of the run), `valid_to` (next run's
    *         `valid_from`, null for the open version), `is_current`,
    *         `n_rows` (observations collapsed into the run)
    */
  def history(log: DataFrame, key: Column, orderCols: Seq[Column],
      tracked: Seq[Column]): DataFrame = {
    require(orderCols.nonEmpty && tracked.nonEmpty,
      "Scd.history needs at least one order column and one tracked column")
    val w = Window.partitionBy(key).orderBy(orderCols: _*)
    // a version opens at the first observation or whenever any tracked
    // attribute is not null-safe-equal to its previous value
    val changed = tracked
      .map(c => !(c <=> lag(c, 1).over(w)))
      .reduce(_ || _)
    val marked = log.withColumn("__chg",
      when(row_number().over(w) === 1 || changed, 1).otherwise(0))
    val versioned = marked.withColumn("version",
      sum(col("__chg")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    // tracked attrs are constant within a run by construction, so they
    // can be grouping keys — no first()/any_value() nondeterminism
    val runs = versioned
      .groupBy(key +: col("version") +: tracked: _*)
      .agg(min(orderCols.head).as("valid_from"),
        count(lit(1)).as("n_rows"))
    // version is unique and monotone per key: a deterministic lead order
    val byVersion = Window.partitionBy(key).orderBy(col("version"))
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byVersion))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
