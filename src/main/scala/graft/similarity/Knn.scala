package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`) for training-data pipelines.
  *
  * Two paths:
  *  - `bruteForceTopK`: exact cosine top-k by broadcasting the query set
  *    over the corpus — the correctness baseline. O(|Q|·|C|), fine when
  *    |Q| is small; the corpus side stays partitioned and is scanned
  *    once, so this scales to any corpus size for a bounded query set.
  *  - `lshTopK` / `similarPairs`: sign-random-projection buckets (the bit
  *    pattern of the first `nBits` components — deterministic, so the SQL
  *    oracle reproduces it). Bucketing turns the all-pairs problem into a
  *    per-bucket join: at 100 TB the corpus is hash-partitioned by bucket
  *    and each bucket joins locally; recall is traded via nBits.
  *
  * Dot products run through the codegen-native `dot_f64` expression
  * (`graft.functions.DotProductF64`) — a tight fused loop with the same
  * sequential summation order DuckDB's `list_inner_product` uses, so
  * scores stay bit-comparable to the oracle.
  */
object Knn {

  /** Embedding prep: cast float[] → double[] once, precompute the norm. */
  def prepared(emb: DataFrame, idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    graft.functions.VectorExpressions.register(emb.sparkSession)
    graft.CacheScope.persist( // query + corpus sides share this lineage
      emb.select(col(idCol), col(embCol).cast("array<double>").as("e"))
        .withColumn("nrm", sqrt(expr("dot_f64(e, e)"))))
  }

  /** Codegen-native dot product (same left-to-right summation order as
    * the composable aggregate(zip_with(...)) form it replaced). */
  private def dotQC: Column = expr("dot_f64(qe, ce)")

  /** Exact cosine top-k for a (small, broadcast) query subset. */
  def bruteForceTopK(emb: DataFrame, queryPred: Column, k: Int): DataFrame = {
    val p = prepared(emb)
    val q = p.filter(queryPred)
      .select(col("vec_id").as("qid"), col("e").as("qe"), col("nrm").as("qn"))
    val c = p.select(col("vec_id").as("cid"), col("e").as("ce"), col("nrm").as("cn"))
    c.join(broadcast(q), col("qid") =!= col("cid"))
      .withColumn("cos", dotQC / (col("qn") * col("cn")))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))))
      .filter(col("rank") <= k)
      .select(col("qid"), col("cid"), col("rank").cast("long").as("rank"),
        round(col("cos"), 6).as("cos_r"))
  }

  /** Sign-projection bucket id: bit i set iff component i > 0. */
  def signBucket(e: Column, nBits: Int): Column =
    (0 until nBits).map(i =>
      when(element_at(e, i + 1) > 0, lit(1 << i)).otherwise(lit(0)))
      .reduce(_ + _)

  /** LSH-bucketed ANN: candidates limited to the query's bucket. */
  def lshTopK(emb: DataFrame, queryPred: Column, k: Int, nBits: Int): DataFrame = {
    val p = prepared(emb).withColumn("bucket", signBucket(col("e"), nBits))
    val q = p.filter(queryPred)
      .select(col("vec_id").as("qid"), col("e").as("qe"),
        col("nrm").as("qn"), col("bucket"))
    val c = p.select(col("vec_id").as("cid"), col("e").as("ce"),
      col("nrm").as("cn"), col("bucket"))
    c.join(broadcast(q), Seq("bucket"))
      .filter(col("qid") =!= col("cid"))
      .withColumn("cos", dotQC / (col("qn") * col("cn")))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))))
      .filter(col("rank") <= k)
      .select(col("qid"), col("cid"), col("rank").cast("long").as("rank"),
        round(col("cos"), 6).as("cos_r"))
  }

  /** IVF-style ANN: a deterministic inverted-file index. The first
    * `nCentroids` vectors act as coarse centroids (a k-means-free stand-in
    * that keeps the oracle reproducible); every vector is assigned to its
    * nearest centroid's list; a query probes the `nProbe` nearest
    * centroid lists and brute-forces only those candidates. At 100 TB the
    * corpus is partitioned by list id, so a query touches nProbe
    * partitions instead of the whole corpus.
    */
  def ivfTopK(emb: DataFrame, queryPred: Column, k: Int,
      nCentroids: Int, nProbe: Int): DataFrame = {
    val p = prepared(emb)
    val cents = p.filter(col("vec_id") < nCentroids)
      .select(col("vec_id").as("centroid_id"), col("e").as("ce"),
        col("nrm").as("cn"))
    // coarse assignment: nearest centroid per vector (cosine, id tiebreak)
    def nearest(side: DataFrame, idCol: String, keep: Int): DataFrame =
      side.select(col("vec_id").as(idCol), col("e").as("qe"), col("nrm").as("qn"))
        .join(broadcast(cents), lit(true))
        .withColumn("ccos", dotQC / (col("qn") * col("cn")))
        .withColumn("crank", row_number().over(
          Window.partitionBy(col(idCol))
            .orderBy(col("ccos").desc, col("centroid_id"))))
        .filter(col("crank") <= keep)
        .select(col(idCol), col("centroid_id"))
    val assignment = nearest(p, "cid", 1)          // corpus → 1 list each
    val probes = nearest(p.filter(queryPred), "qid", nProbe) // query → nProbe lists
    // candidate id pairs via the inverted lists, dedup'd before vectors
    // are re-attached (a candidate can surface from several probes)
    val cand = assignment.join(broadcast(probes), Seq("centroid_id"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid")).distinct()
    val qVec = p.filter(queryPred)
      .select(col("vec_id").as("qid"), col("e").as("qe"), col("nrm").as("qn"))
    val cVec = p.select(col("vec_id").as("cid"), col("e").as("ce"), col("nrm").as("cn"))
    cand.join(broadcast(qVec), Seq("qid"))
      .join(cVec, Seq("cid"))
      .withColumn("cos", dotQC / (col("qn") * col("cn")))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))))
      .filter(col("rank") <= k)
      .select(col("qid"), col("cid"), col("rank").cast("long").as("rank"),
        round(col("cos"), 6).as("cos_r"))
  }

  /** Embedding-cosine near-dup pairs within buckets (the scale path: the
    * bucket equi-join shards the quadratic work).
    *
    * Scale note: work is quadratic WITHIN a bucket — expected cost is
    * O(n²/2^nBits) for n vectors under uniform signs, so `nBits` must
    * grow with the corpus: 8 bits (256 buckets) is a test-scale setting;
    * at 10⁹+ vectors use 16-20 bits, or band like `Dedup.simhashPairs`
    * (several independent small projections OR'd together) to recover the
    * recall a single wide projection loses. The fixtures pass nBits
    * explicitly; the default here is sized for large corpora. */
  def similarPairs(emb: DataFrame, threshold: Double, nBits: Int = 16): DataFrame = {
    val p = prepared(emb).withColumn("bucket", signBucket(col("e"), nBits))
    val a = p.select(col("vec_id").as("va"), col("e").as("qe"),
      col("nrm").as("qn"), col("bucket"))
    val b = p.select(col("vec_id").as("vb"), col("e").as("ce"),
      col("nrm").as("cn"), col("bucket"))
    a.join(b, Seq("bucket"))
      .filter(col("va") < col("vb"))
      .withColumn("cos", dotQC / (col("qn") * col("cn")))
      .filter(col("cos") >= threshold)
      .select(col("va"), col("vb"), round(col("cos"), 6).as("cos_r"))
  }
}
