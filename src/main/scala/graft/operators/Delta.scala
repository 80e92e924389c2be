package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental/delta + reconciliation layer (SURVEY.md §2b P9, §2g U2, §5).
  */
object Delta {

  /** P9/J7: "only new keys" delta — the reference writes
    * `leadid not in (select coalesce(leadid,'') from tgt)` (`PUSH:214`),
    * pre-coalescing the TARGET side to dodge NOT IN's null poisoning
    * (one NULL in the subquery makes NOT IN never-true). The source side
    * is NOT coalesced, so three-valued logic still applies to it: a NULL
    * src key yields `NULL NOT IN (…)` = NULL and the row is dropped. The
    * faithful-and-scalable form is therefore a not-null filter on the src
    * key plus a left anti join against the coalesced target key set:
    * shuffles both sides on the key once (or broadcasts a small target
    * key set), no correlated subquery.
    *
    * Known divergence, by choice: when the TARGET is EMPTY, SQL
    * `x NOT IN (empty)` is TRUE for every row including NULL x, so the
    * reference would keep NULL-key rows on a first run against an empty
    * collection; this form drops them unconditionally. A delta keyed on
    * NULL is never re-identifiable on the next run (NULL keys can't match
    * the target either), so dropping is the stable semantics — callers
    * that must ingest keyless rows on bootstrap should union them in
    * explicitly rather than depend on the empty-target edge. */
  def newKeysOnly(src: DataFrame, tgt: DataFrame, srcKey: String,
      tgtKey: String, nullSentinel: Column = lit("")): DataFrame = {
    require(src.schema(srcKey).dataType == tgt.schema(tgtKey).dataType,
      s"key type mismatch: $srcKey is ${src.schema(srcKey).dataType}, " +
        s"$tgtKey is ${tgt.schema(tgtKey).dataType} — the coalesce-guarded " +
        "anti join needs matching types or the sentinel comparison casts")
    val tgtKeys = tgt.select(coalesce(col(tgtKey), nullSentinel).as("__k")).distinct()
    src.filter(src(srcKey).isNotNull)
      .join(tgtKeys, src(srcKey) === col("__k"), "left_anti")
  }

  /** U2 + §5: the reference's reconciliation block (`PUSH:369-457`) as a
    * utility — count equality, column-set equality, and full-data
    * symmetric MINUS both directions. */
  final case class ReconcileReport(
      srcCount: Long, tgtCount: Long,
      missingCols: Seq[String], extraCols: Seq[String],
      srcMinusTgt: Long, tgtMinusSrc: Long) {
    def ok: Boolean =
      srcCount == tgtCount && missingCols.isEmpty && extraCols.isEmpty &&
        srcMinusTgt == 0L && tgtMinusSrc == 0L
  }

  def reconcile(src: DataFrame, tgt: DataFrame): ReconcileReport = {
    val common = src.columns.intersect(tgt.columns).toSeq
    val s = src.select(common.map(col): _*)
    val t = tgt.select(common.map(col): _*)
    ReconcileReport(
      srcCount = src.count(), tgtCount = tgt.count(),
      missingCols = src.columns.diff(tgt.columns).toSeq,
      extraCols = tgt.columns.diff(src.columns).toSeq,
      srcMinusTgt = s.except(t).count(),
      tgtMinusSrc = t.except(s).count())
  }

  /** U2 as a DataFrame (for oracle-checked fixtures): one row per
    * direction with the MINUS cardinality (`PUSH:422-440`). */
  def symmetricMinusCounts(src: DataFrame, tgt: DataFrame): DataFrame = {
    val spark = src.sparkSession
    import spark.implicits._
    val a = src.except(tgt).count()
    val b = tgt.except(src).count()
    Seq(("src_minus_tgt", a), ("tgt_minus_src", b))
      .toDF("direction", "n").orderBy("direction")
  }

  /** Snapshot diff: derive the INSERT/UPDATE/DELETE changeset between
    * two snapshots of a keyed table — the inverse of `Merge.applyCdc`
    * (which consumes such a changeset). This is how an incremental
    * pipeline turns "yesterday's table, today's table" into the delta
    * it actually ships: one full-outer join on the key, row classified
    * by side-presence and column inequality (null-safe, so NULL→value
    * and value→NULL both count as updates). Unchanged rows drop out.
    * One shuffle per side on the key; at 100 TB both snapshots are
    * usually bucketed on the key and the join co-locates for free. */
  def snapshotDiff(old: DataFrame, current: DataFrame,
      key: String): DataFrame = {
    require(old.columns.sameElements(current.columns),
      "snapshotDiff expects identical schemas")
    val valueCols = old.columns.filterNot(_ == key).toSeq
    val o = old.select(old.columns.map(c => col(c).as(s"o_$c")).toSeq: _*)
    val n = current.select(
      current.columns.map(c => col(c).as(s"n_$c")).toSeq: _*)
    val joined = o.join(n, col(s"o_$key") === col(s"n_$key"), "full_outer")
    val changed = valueCols
      .map(c => !(col(s"o_$c") <=> col(s"n_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    joined
      .withColumn("op",
        when(col(s"o_$key").isNull, "I")
          .when(col(s"n_$key").isNull, "D")
          .when(changed, "U"))
      .filter(col("op").isNotNull)
      .select(Seq(coalesce(col(s"n_$key"), col(s"o_$key")).as(key),
        col("op")) ++
        valueCols.map(c => col(s"n_$c").as(c)): _*)
  }
}
