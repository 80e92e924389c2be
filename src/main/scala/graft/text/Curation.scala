package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Scalars

/** Corpus-curation operators for training-data pipelines: deterministic
  * train/val/test splits, quantile-band quality filtering, fixed-window
  * sequence chunking, and stratified per-group sampling.
  *
  * Everything here is hash-deterministic (md5-derived, never `rand()`):
  * re-running the pipeline — or running it on a different cluster
  * layout — assigns every document to the same split/sample, which is
  * what makes dataset versioning and incremental re-builds possible at
  * 100 TB. All ops are narrow projections or single key-partitioned
  * shuffles; the only global sort is the exact quantile band, which
  * documents its approximate scale path.
  */
object Curation {

  /** Deterministic hash bucket in [0, 100): first 60 md5 bits of the
    * key's string form, mod 100. Stable across runs, clusters, and
    * engines (the DuckDB oracle reproduces it bit-exactly). */
  def hashBucket(key: Column): Column =
    Scalars.md5Long60(key.cast("string")) % 100

  /** Train/val/test assignment by cumulative hash-bucket ranges:
    * `splits` = (name, percent) with percents summing to ≤100. A
    * document's split never changes when other documents are added or
    * removed — the property random sampling lacks. Pure narrow
    * projection: no shuffle at any scale. */
  def hashSplit(df: DataFrame, key: Column,
      splits: Seq[(String, Int)]): DataFrame = {
    require(splits.map(_._2).sum <= 100, "split percents must sum to <= 100")
    val cum = splits.scanLeft(0)(_ + _._2).tail
    val assigned = splits.zip(0 +: cum.init).zip(cum).map {
      case (((name, _), lo), hi) =>
        when(col("bucket") >= lo && col("bucket") < hi, lit(name))
    }.reduce(coalesce(_, _))
    df.withColumn("bucket", hashBucket(key)).withColumn("split", assigned)
  }

  /** Keep rows whose `score` sits inside the exact [lo, hi] quantile
    * band (rank-based: percent_rank with a unique tiebreak, so both
    * engines compute the identical (rank-1)/(n-1) double). The window
    * is a single global sort — the exact form, same cost as sorting the
    * output. The 100 TB path is the same filter against thresholds from
    * `approxQuantile` (one pass, no sort); the exact form stays the
    * oracle-checkable fixture. */
  def quantileBand(df: DataFrame, score: Column, tiebreak: Column,
      lo: Double, hi: Double): DataFrame = {
    val w = Window.orderBy(score, tiebreak)
    df.withColumn("q_rank", percent_rank().over(w))
      .filter(col("q_rank") >= lo && col("q_rank") <= hi)
  }

  /** The 100 TB path for [[quantileBand]]: band thresholds from
    * `approxQuantile` (Greenwald-Khanna sketch — one pass, no global
    * sort; the two threshold doubles are the only driver-side fetch),
    * then a narrow filter. Trades the exact rank endpoints for ±relErr
    * rank error — the right trade when the corpus doesn't fit a sort.
    * CurationSpec pins it against the exact form: every row strictly
    * inside the band survives in both. */
  def quantileBandApprox(df: DataFrame, scoreCol: String,
      lo: Double, hi: Double, relErr: Double = 0.001): DataFrame = {
    val Array(l, h) = df.stat.approxQuantile(scoreCol, Array(lo, hi), relErr)
    df.filter(col(scoreCol) >= l && col(scoreCol) <= h)
  }

  /** Fixed-size character windows with stride — sequence prep for
    * training (chunk 0 starts at 0, chunk i at i·stride; last chunk may
    * be short). One explode, no shuffle; output scales by ~len/stride. */
  def chunkText(docs: DataFrame, chunkChars: Int, stride: Int): DataFrame = {
    require(chunkChars > 0 && stride > 0, "chunk and stride must be positive")
    docs
      .select(col("doc_id"), col("text"),
        explode(when(col("n_chars") > 0,
          sequence(lit(0L), col("n_chars") - 1, lit(stride.toLong)))
          .otherwise(array().cast("array<long>"))).as("chunk_start"))
      .select(col("doc_id"),
        expr(s"chunk_start DIV $stride").as("chunk_idx"),
        col("chunk_start"),
        expr(s"substring(text, chunk_start + 1, $chunkChars)").as("chunk_text"))
      .withColumn("chunk_chars", length(col("chunk_text")).cast("long"))
  }

  /** Deterministic mixture rebalancing: downsample each stratum to its
    * target fraction by hash threshold (keep iff hash-bucket/10000 <
    * fraction) — the "data mixture" control a training pipeline applies
    * per source/domain. Same stability property as [[hashSplit]]: a
    * document's fate depends only on its own key, so re-runs and corpus
    * growth never resample survivors. Narrow projection, no shuffle;
    * strata absent from `fractions` are kept whole. */
  def rebalance(df: DataFrame, stratum: Column, key: Column,
      fractions: Map[String, Double]): DataFrame = {
    require(fractions.values.forall(f => f >= 0 && f <= 1),
      "fractions must be in [0, 1]")
    val fine = Scalars.md5Long60(key.cast("string")) % 10000
    val threshold = fractions.foldLeft(lit(10000L)) {
      case (acc, (name, f)) =>
        when(stratum === name, lit((f * 10000).toLong)).otherwise(acc)
    }
    df.filter(fine < threshold)
  }

  /** Stratified deterministic sample: up to `perGroup` documents per
    * stratum, chosen by md5-hash order (stable, engine-reproducible —
    * not `rand()`). One shuffle on the stratum key; per-group state is
    * the bounded top-k heap Spark plans for rank-limit windows. */
  def stratifiedSample(df: DataFrame, stratum: Column, key: Column,
      perGroup: Int): DataFrame = {
    val ordered = df.withColumn("__h", Scalars.md5Long60(key.cast("string")))
    graft.operators.TopK.topKPerKey(ordered,
        Seq(stratum), Seq(col("__h").asc, key.asc), perGroup)
      .drop("__h")
  }
}
