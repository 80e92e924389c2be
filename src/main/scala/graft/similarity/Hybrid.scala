package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval fusion — Reciprocal Rank Fusion (Cormack, Clarke &
  * Büttcher, SIGIR 2009): fuse per-query ranked lists from
  * heterogeneous retrievers (lexical BM25, vector ANN, …) by summing
  * `1 / (k0 + rank)` over the legs that returned each candidate. RRF is
  * the standard lexical+dense fusion in retrieval-augmented pipelines
  * precisely because it needs no score calibration across legs — only
  * ranks.
  *
  * Scale story: every leg is already top-k-bounded PER QUERY, so the
  * fusion input is |Q|·k·legs rows — workload-sized, independent of
  * corpus size; the whole fusion is one (qid, id) groupBy plus a
  * WindowGroupLimit. The corpus-sized work lives inside the legs, each
  * audited on its own (`TextAnalysis.bm25TopK`, `Knn.bruteForceTopK` /
  * `lshTopK` / `ivfTopK`).
  *
  * Float discipline (the lmScore rule): each leg's reciprocal term is
  * rounded to 6 dp and summed as DECIMAL(18,6), so fusion scores — and
  * therefore the final ranking — are order-exact and oracle-stable.
  */
object Hybrid {

  /** Cross-modality dedup agreement: full-outer-join the lexical
    * near-dup pairs (exact Jaccard ≥ `jaccardThreshold` over
    * 3-shingles) with the embedding near-dup pairs (bucketed cosine ≥
    * `cosThreshold`) over the id universe that has BOTH signals, and
    * classify each pair `both` / `text_only` / `emb_only`. BOTH legs
    * are semi-joined to the doc∩emb id set — a pair is only
    * classifiable where both signals exist, so an embedding pair whose
    * id lacks text (or a text pair whose id lacks a vector) is dropped
    * rather than misfiled as `*_only`. Both sides are near-dup-sized,
    * so the audit costs what the generators cost. */
  def modalityAgreement(docs: DataFrame, emb: DataFrame,
      jaccardThreshold: Double = 0.5, cosThreshold: Double = 0.30,
      nBits: Int = 8): DataFrame = {
    val ids = graft.CacheScope.persist(
      docs.select(col("doc_id").as("id"))
        .join(emb.select(col("vec_id").as("id")), Seq("id"), "left_semi"))
    val text = graft.text.Dedup.prefixJaccardPairs(
        graft.text.Dedup.shingles(docs), threshold = jaccardThreshold)
      .select(col("da"), col("db"), col("jaccard"))
      .join(ids.select(col("id").as("da")), Seq("da"), "left_semi")
      .join(ids.select(col("id").as("db")), Seq("db"), "left_semi")
    val vec = Knn.similarPairs(emb, nBits = nBits, threshold = cosThreshold)
      .select(col("va").as("da"), col("vb").as("db"), col("cos_r"))
      .join(ids.select(col("id").as("da")), Seq("da"), "left_semi")
      .join(ids.select(col("id").as("db")), Seq("db"), "left_semi")
    text.join(vec, Seq("da", "db"), "full_outer")
      .select(col("da"), col("db"),
        col("jaccard").isNotNull.as("in_text"),
        col("cos_r").isNotNull.as("in_emb"),
        col("jaccard"), col("cos_r"),
        when(col("jaccard").isNotNull && col("cos_r").isNotNull, "both")
          .when(col("jaccard").isNotNull, "text_only")
          .otherwise("emb_only").as("signal"))
  }

  /** Fuse ranked lists `(qid, id, rank)` → top `topK` per query as
    * `(qid, id, n_legs, rrf)`; ties break on id. */
  def rrfFuse(legs: Seq[DataFrame], k0: Int = 60, topK: Int = 10): DataFrame = {
    require(legs.nonEmpty, "rrfFuse needs at least one ranked leg")
    val u = legs.map(_.select(col("qid"), col("id"), col("rank")))
      .reduce(_ unionByName _)
    val terms = u.select(col("qid"), col("id"),
      round(lit(1.0) / (lit(k0.toDouble) + col("rank").cast("double")), 6)
        .cast("decimal(18,6)").as("t"))
    val fused = terms.groupBy(col("qid"), col("id"))
      .agg(count(lit(1)).as("n_legs"), sum(col("t")).as("rrf"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("rrf").desc, col("id").asc)
    fused.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= topK)
      .select(col("qid"), col("id"), col("n_legs"),
        col("rrf").cast("double").as("rrf"))
  }
}
