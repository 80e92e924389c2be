package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the latest right row with
  * `right.ts <= left.ts` within the same key — the temporal-enrichment
  * join Spark lacks natively (preference order (a): composed from
  * built-ins, per the custom-operator ladder — no custom SparkPlan
  * needed because union + carry-forward window expresses it exactly).
  *
  * Mechanics: tag and union both sides, sort per key by (ts, side-tag,
  * unique id) — right rows at equal ts sort BEFORE left rows so `<=`
  * semantics hold — then carry the last-seen right payload forward with
  * `last(_, ignoreNulls)` over an unbounded-preceding frame, and keep
  * only left rows. One shuffle on the key; no nested loop, no range
  * explosion; at 100 TB both sides hash-partition by key once.
  */
object AsOfJoin {

  /**
    * @param left      probe side: (key, ts, leftId, …)
    * @param right     reference side: (key, ts, rightId, …)
    * @param key       join key column name (same on both sides)
    * @param ts        event-time column name (same on both sides)
    * @param leftId    unique left row id (kept, also sort tiebreak)
    * @param rightCols right columns to attach (renamed as-is onto output)
    */
  def latestPrior(left: DataFrame, right: DataFrame, key: String, ts: String,
      leftId: String, rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val taggedLeft = rightCols.foldLeft(left.withColumn("__side", lit(1))) {
      (d, c) => d.withColumn(s"__r_$c", lit(null).cast(right.schema(c).dataType))
    }
    val taggedRight = right.select(
      (Seq(col(key), col(ts), lit(0).as("__side")) ++
        leftCols.filterNot(Set(key, ts)).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightCols.map(c => col(c).as(s"__r_$c"))): _*)
    val unioned = taggedLeft.unionByName(taggedRight)
      // carry the right row as ONE struct (always non-null for right
      // rows): carrying columns independently would stitch together
      // values from different right rows when some fields are null
      .withColumn("__r", when(col("__side") === 0,
        struct(rightCols.map(c => col(s"__r_$c").as(c)): _*)))
    // right (side 0) sorts before left (side 1) at equal ts → `<=`
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("__side"), col(leftId))
      .rowsBetween(Window.unboundedPreceding, 0)
    unioned
      .withColumn("__c", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        rightCols.map(c => col(s"__c.$c").as(s"asof_$c")): _*)
  }
}
