package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass table profiling: per-column row count, null count, exact
  * distinct count, and min/max — the "what did I just ingest" operator
  * every pipeline runs before trusting a new snapshot.
  *
  * Shape at 100 TB: ONE aggregation job over the scan — the per-column
  * metrics are parallel aggregate expressions in a single `agg`, so the
  * table is read once (multi-distinct plans via Expand, still one
  * shuffle stage). The wide single-row result is then exploded to the
  * long (col_name, metrics) form driver-side-free.
  *
  * Caller casts float columns to an exact decimal beforehand: min/max
  * surface as strings, and double→string shortest-round-trip formatting
  * is not portable across engines, while decimal→string is.
  */
object Profile {

  def table(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = Seq(count(lit(1)).as("n_rows")) ++ cols.flatMap { c =>
      Seq(
        sum(when(df(c).isNull, 1L).otherwise(0L)).as(s"${c}__n_nulls"),
        countDistinct(df(c)).as(s"${c}__n_distinct"),
        min(df(c)).cast("string").as(s"${c}__min"),
        max(df(c)).cast("string").as(s"${c}__max"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.map { c =>
      struct(lit(c).as("col_name"), col("n_rows"),
        col(s"${c}__n_nulls").as("n_nulls"),
        col(s"${c}__n_distinct").as("n_distinct"),
        col(s"${c}__min").as("min_val"),
        col(s"${c}__max").as("max_val"))
    }
    row.select(explode(array(entries: _*)).as("p")).select(col("p.*"))
  }
}
