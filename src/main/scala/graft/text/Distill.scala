package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Gate distillation: train a linear (logistic-regression) scorer to
  * mimic an expensive boolean quality gate, then score every document
  * with one dot product — the fastText-style quality-classifier
  * pattern (CCNet, LLaMA data pipeline): the teacher gate runs complex
  * per-doc analysis; the student is a hashed-bag-of-words linear model
  * cheap enough to score 100 TB.
  *
  * Fully deterministic dataflow so the oracle can walk the IDENTICAL
  * trajectory (the [[graft.similarity.Kmeans]] / PageRank discipline):
  * fixed iteration count, md5-derived feature buckets, per-term 8 dp
  * rounding with DECIMAL(20,8) sums (partial-aggregation-order-exact),
  * sigmoid rounded to 6 dp before it feeds anything downstream (also
  * absorbs last-ulp exp() differences between engines), weights
  * rounded to 8 dp per step.
  *
  * Scale shape: features are (doc, bucket) rows — one explode + one
  * groupBy, the same volume as hashingTf — cached hash-partitioned by
  * doc_id with the label folded in; each GD iteration is then one
  * map-only literal-map weight lookup (weights are ≤ dim+5 entries
  * riding the plan as one literal, no per-round broadcast build), a
  * shuffle-free per-doc sum + residual off the cached partitioning,
  * and ONE ≤ dim+5-key gradient reduce — corpus-linear, no all-pairs,
  * no driver-side data loops (the loop is over the FIXED iteration
  * count; the gradient collect is ≤ dim+5 aggregate rows).
  *
  * Train and score are SEPARATE entry points ([[trainGate]] /
  * [[scoreGate]]) because that is the production shape: the teacher
  * gate runs on a bounded labeled sample, the learned ≤ dim+5-double
  * weight vector ships to the driver, and scoring the remaining
  * 100 TB is one broadcast join + one per-doc sum per document —
  * no iteration touches the full corpus. [[distillGate]] composes
  * the two over one input for the oracle-gated registered query.
  */
object Distill {

  /** Features (the fastText-quality shape — a hashed token bag PLUS a
    * handful of cheap one-pass scalar metrics; tf-weighted bags alone
    * measured inseparable on the gate, all-majority at any lr):
    * buckets 0..dim-1 hold unigram PRESENCE (1.0 if any token of the
    * doc hashes there — presence beats tf here because a stopword's
    * signal is its existence, not its share), and reserved negative
    * buckets hold: -1 bias, -2 log-length ln(1+wc)/10, -3 distinct
    * ratio, -4 top-token fraction, -5 stopword fraction. All are
    * single-pass per-doc scalars — the student stays one cheap dot
    * product per document at scoring time. Output: (doc_id, b, x). */
  private def rawFeatures(docs: DataFrame, dim: Int): DataFrame = {
    val tk = docs.select(col("doc_id"),
      explode(TextAnalysis.tokens).as("tok"))
    val unigram = tk
      .select(col("doc_id"),
        pmod(graft.functions.Scalars.md5Long60(col("tok")), lit(dim.toLong))
          .cast("int").as("b"))
      .distinct()
      .withColumn("x", lit(1.0))
    val t = TextAnalysis.tokens
    val wc = size(t).cast("long")
    val metrics = docs.select(col("doc_id"), array(
        struct(lit(-1).as("b"), lit(1.0).as("x")),
        struct(lit(-2).as("b"),
          round(log(lit(1.0) + wc.cast("double")) / 10, 6).as("x")),
        struct(lit(-3).as("b"), round(size(array_distinct(t)).cast("double")
          / wc.cast("double"), 6).as("x")),
        struct(lit(-4).as("b"),
          round(TextAnalysis.topTokenFrac(t).cast("double"), 6).as("x")),
        struct(lit(-5).as("b"),
          round(TextAnalysis.stopHits(t, TextAnalysis.enStops).cast("double")
            / wc.cast("double"), 6).as("x"))).as("m"))
      .select(col("doc_id"), explode(col("m")).as("f"))
      .select(col("doc_id"), col("f.b").as("b"), col("f.x").as("x"))
    unigram.unionByName(metrics)
  }

  /** The label rides every feature row (ONE corpus join at build time
    * instead of one per GD round), and the frame is hash-partitioned
    * by doc_id ONCE before caching: the per-round score aggregation
    * and the gradient join both key on doc_id, so each round's whole
    * dataflow reuses the cached partitioning — the only per-round
    * shuffle left is the ≤ dim+5-key gradient reduce. (The round-12
    * shape re-shuffled feats by doc_id twice per round plus re-counted
    * the corpus inside every gradient job: 18.0 s at sf0.1, 7.1% of
    * the whole bench, all job floor.)
    *
    * Partition count is SIZE-ADAPTIVE (r18, guide §2.2/§2.4): the GD
    * loop launches 2 passes over this cache per round × `iters`
    * rounds, so its partition count is a per-round task-floor
    * multiplier — at bench scale the session default (one partition
    * per core) put 64 near-empty tasks in every round's critical path
    * (measured 0.48 → 0.22 s/round at sf0.1 after sizing, r18 plans/).
    * ~50k docs per partition ≈ 1.5M feature rows ≈ 50 MB, inside the
    * guide's 100 MB–1 GB band for a cached working set this hot; the
    * session shuffle-partition knob stays the ceiling so a cluster
    * deployment (which overrides it to 2-3× its core total) keeps its
    * parallelism. Partitioning cannot perturb results: every per-row
    * term is rounded to 8 dp and summed as DECIMAL(20,8), so the
    * reduction is order-exact (object scaladoc). */
  private def labeledFeatures(docs: DataFrame, label: Column,
      dim: Int, ndocs: Long): DataFrame = {
    val ceilParts =
      docs.sparkSession.sessionState.conf.numShufflePartitions
    val parts = math.max(1L, math.min(ceilParts.toLong,
      (ndocs + 49999L) / 50000L)).toInt
    graft.CacheScope.persist(
      rawFeatures(docs, dim)
        .join(docs.select(col("doc_id"), label.cast("long").as("y")),
          "doc_id")
        .repartition(parts, col("doc_id")))
  }

  private val sigmoid = round(lit(1.0) / (lit(1.0) + exp(-col("s"))), 6)

  /** The weight vector as a MAP LITERAL column, `w(b) = element_at(m, b)`
    * — replacing the per-round broadcast-joined local frame (r18). The
    * join form paid a broadcast build plus a BroadcastHashJoin stage in
    * EVERY GD round's plan; the ≤ dim+5-entry map rides the plan as one
    * literal reference, so a round is now a map-only projection over the
    * cached feature partitioning (0.48 → 0.39 s/round at sf0.1 from this
    * change alone, r18 plans/). Value-identical: every feature bucket
    * trained on is a key of `m` (trainGate seeds the weight map from the
    * frame's own distinct buckets), and at scoring time an unigram
    * bucket the sample never produced hits no key → element_at yields
    * NULL → the per-term product is NULL → sum() skips it, exactly as
    * the old inner join dropped that row; every doc still appears
    * because the bias bucket (-1) is always trained. */
  private def wCol(m: Map[Int, Double]): Column = {
    require(m.nonEmpty, "weight map must be non-empty")
    element_at(typedLit(m), col("b"))
  }

  /** scores AND residual input in one aggregation pass over a LABELED
    * feature frame: y is constant per doc, so max() re-emits it
    * without a second join against the label frame. */
  private def scored(feats: DataFrame, w: Map[Int, Double]): DataFrame =
    feats
      .select(col("doc_id"), col("y"),
        round(col("x") * wCol(w), 8).cast("decimal(20,8)").as("t"))
      .groupBy(col("doc_id"))
      .agg(sum(col("t")).cast("double").as("s"), max(col("y")).as("y"))

  /** `iters` batch-GD rounds over a persisted labeled feature frame;
    * model state lives on the DRIVER — the MLlib topology: the data
    * stays distributed, the ≤ dim+5-double weight vector rides a
    * broadcast local relation each round, and each round's gradient
    * comes back as a fenced bounded collect (≤ dim+5 (b, g) rows of
    * aggregates, never row data). */
  private def gdTrain(feats: DataFrame, ndocs: Double, iters: Int,
      lr: Double): Map[Int, Double] = {
    def round8(v: Double): Double =
      BigDecimal(v).setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
    var wMap: Map[Int, Double] =
      feats.select(col("b")).distinct().collect()
        .map(r => r.getInt(0) -> 0.0).toMap
    for (_ <- 1 to iters) {
      val resid = scored(feats, wMap)
        .select(col("doc_id"), (sigmoid - col("y")).as("r"))
      // shuffle-hash, not sort-merge: both sides are already
      // hash(doc_id)-partitioned (feats from the cache, resid from its
      // aggregation), so the hint swaps the per-round re-SORT of the
      // corpus-sized feature frame for a partition-local hash build on
      // the one-row-per-doc residual side — no broadcast, no exchange
      val grads = feats.join(resid.hint("shuffle_hash"), "doc_id")
        .select(col("b"),
          round(col("x") * col("r"), 8).cast("decimal(20,8)").as("g"))
        .groupBy(col("b"))
        .agg(sum(col("g")).cast("double").as("gsum"))
        .select(col("b"),
          round(col("gsum") / lit(ndocs), 8).as("g"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      wMap = wMap.map { case (b, v) =>
        b -> round8(v - lr * grads.getOrElse(b, 0.0)) }
    }
    wMap
  }

  /** Train the student on `docs` (the bounded teacher-labeled sample)
    * and return the learned weight vector — a fenced ≤ dim+5-entry
    * driver map, the only thing that ships to the scoring pass. */
  def trainGate(docs: DataFrame, label: Column, dim: Int = 64,
      iters: Int = 3, lr: Double = 1.0): Map[Int, Double] = {
    require(dim > 0 && iters > 0 && lr > 0, "trainGate needs dim, iters, lr > 0")
    val ndocs = docs.count()
    gdTrain(labeledFeatures(docs, label, dim, ndocs), ndocs.toDouble,
      iters, lr)
  }

  /** Score `docs` with a trained weight vector: one broadcast join +
    * one per-doc sum — the 100 TB pass. Output (doc_id, score,
    * predicted); the identical rounding discipline as training, so a
    * doc scored here equals the same doc scored inside
    * [[distillGate]]. */
  def scoreGate(docs: DataFrame, w: Map[Int, Double],
      dim: Int = 64): DataFrame =
    rawFeatures(docs, dim)
      .select(col("doc_id"),
        round(col("x") * wCol(w), 8).cast("decimal(20,8)").as("t"))
      .groupBy(col("doc_id"))
      .agg(sum(col("t")).cast("double").as("s"))
      .select(col("doc_id"), sigmoid.as("score"),
        when(sigmoid >= 0.5, 1L).otherwise(0L).as("predicted"))

  /** Train `iters` batch-GD rounds against `label` over `docs`, then
    * emit per doc: (doc_id, label, score, predicted, correct). `lr` is
    * the learning rate on the MEAN gradient. Train + score over the
    * same input — the oracle-gated registered form. */
  def distillGate(docs: DataFrame, label: Column, dim: Int = 64,
      iters: Int = 3, lr: Double = 1.0): DataFrame = {
    require(dim > 0 && iters > 0 && lr > 0, "distillGate needs dim, iters, lr > 0")
    // corpus size as a fenced driver scalar, computed ONCE — the
    // crossJoin(broadcast(one-row-agg)) form re-counted the corpus
    // inside every round's gradient job
    val ndocs = docs.count()
    val feats = labeledFeatures(docs, label, dim, ndocs)
    val wMap = gdTrain(feats, ndocs.toDouble, iters, lr)
    scored(feats, wMap)
      .select(col("doc_id"), col("y").as("label"), sigmoid.as("score"),
        when(sigmoid >= 0.5, 1L).otherwise(0L).as("predicted"))
      .withColumn("correct",
        when(col("predicted") === col("label"), 1L).otherwise(0L))
  }
}
