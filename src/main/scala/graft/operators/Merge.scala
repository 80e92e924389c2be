package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE / upsert: apply a change set onto a keyed target — updates
  * replace matching rows, inserts land, everything else survives.
  *
  * The reference's outbound stage computes the insert-only half of this
  * (EP2's only-new anti-join, `PUSH:207-224`, see `Delta.newKeysOnly`);
  * a general warehouse needs the full last-writer-wins apply, and a CDC
  * feed additionally carries deletes. Both are expressed as ONE
  * union + top-1-per-key pass (`TopK.topKPerKey`, the bounded-heap
  * window Spark plans as WindowGroupLimit): no join, one shuffle on the
  * key, O(1) state per key — the form that survives a 100-TB target,
  * unlike the textbook full-outer-join MERGE whose wide join the oracle
  * twin uses as an independent cross-check.
  */
object Merge {

  /** Last-writer-wins upsert. Both sides must share the schema and be
    * unique per `keys` (standard MERGE precondition — Spark's own MERGE
    * INTO raises on multiple matches too). */
  def upsert(target: DataFrame, updates: DataFrame,
      keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "Merge.upsert needs at least one key column")
    val tagged = target.withColumn("__src", lit(0))
      .unionByName(updates.withColumn("__src", lit(1)))
    TopK.topKPerKey(tagged, keys.map(col), Seq(col("__src").desc), 1)
      .drop("__src")
  }

  /** Order-independent upsert: the winner per key is the row greatest
    * under `order` across target ∪ changes, NOT simply the newest
    * arrival. This is the form a streaming materialization needs —
    * batches may replay or arrive out of order, and latest-by-event-time
    * converges to the same state regardless (same single-shuffle plan as
    * [[upsert]]). `order` must totally order rows within a key. */
  def latestBy(target: DataFrame, changes: DataFrame, keys: Seq[String],
      order: Seq[org.apache.spark.sql.Column]): DataFrame =
    TopK.top1PerKey(target.unionByName(changes), keys.map(col), order)

  /** CDC apply: like [[upsert]], but change rows flagged by
    * `deleteFlag` (a boolean column on `changes`) REMOVE the key from
    * the result. The flag rides through the same single shuffle; the
    * filter happens after the winner per key is chosen, so a delete
    * beats the target row it tombstones. */
  def applyChanges(target: DataFrame, changes: DataFrame,
      keys: Seq[String], deleteFlag: String): DataFrame = {
    val tagged = target
      .withColumn(deleteFlag, lit(false)).withColumn("__src", lit(0))
      .unionByName(changes.withColumn("__src", lit(1)))
    TopK.topKPerKey(tagged, keys.map(col), Seq(col("__src").desc), 1)
      .where(!col(deleteFlag))
      .drop("__src", deleteFlag)
  }
}
