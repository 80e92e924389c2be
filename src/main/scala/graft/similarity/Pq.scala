package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.CacheScope

/** Product quantization (PQ) + asymmetric-distance (ADC) scan — the
  * compression layer of IVF-PQ-style ANN indexes (Jégou et al., "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011): split each
  * vector into `nSub` subspaces, snap every sub-vector to its nearest
  * codebook centroid, and store only the 4-bit code per subspace — a
  * 64-dim float vector becomes one 32-bit integer. Queries never
  * decompress: a per-query lookup table of query-to-centroid distances
  * turns the corpus scan into `nSub` table lookups + adds per candidate.
  *
  * Codebook: the sub-vectors of the first `nCentroids` corpus vectors —
  * a deterministic seeding (same spirit as `Knn.ivfTopK`'s centroid
  * choice) standing in for k-means; Lloyd rounds are expressible as
  * repeated assign(groupBy)/recenter(avg) passes but add nothing to the
  * dataflow shape being exercised, and determinism is what the oracle
  * gate needs.
  *
  * Scale posture: the codebook and every per-query LUT are KBs —
  * broadcast; encode is corpus × broadcast(codebook) with a top-1-per-
  * (vector, subspace) window (one shuffle on vec_id); the ADC scan is
  * codes ⨝ broadcast(LUT) then a decimal-carried sum per (query,
  * candidate) — linear in the corpus, no all-pairs stage anywhere.
  * Distances accumulate through DECIMAL(24,12) so partial-agg order
  * cannot perturb the ranking (the oracle reproduces bit-equal sums).
  */
object Pq {

  /** Sub-vector slices of every corpus vector: (vec_id, s, v) with `s`
    * the 0-based subspace and `v` the `subDim`-wide double slice. */
  private def subVectors(emb: DataFrame, nSub: Int, subDim: Int): DataFrame =
    emb.select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .select(col("vec_id"), explode(sequence(lit(0), lit(nSub - 1))).as("s"),
        col("e"))
      .select(col("vec_id"), col("s"),
        slice(col("e"), col("s") * subDim + 1, lit(subDim)).as("v"))

  /** Squared L2 between slice columns `a` and `b`, written as
    * ip(a,a) - 2·ip(a,b) + ip(b,b) with the codegen dot so the oracle
    * can reproduce the exact expression tree (same associativity). */
  private def l2sq(a: String, b: String): org.apache.spark.sql.Column =
    expr(s"dot_f64($a, $a) - 2 * dot_f64($a, $b) + dot_f64($b, $b)")

  /** PQ-encode the corpus: one row per vector with the packed code
    * (4 bits per subspace, subspace s at bit 4s). */
  def encode(emb: DataFrame, nCentroids: Int = 16, nSub: Int = 8,
      subDim: Int = 8): DataFrame = {
    require(nCentroids <= 16, "4-bit codes: at most 16 centroids")
    graft.functions.VectorExpressions.register(emb.sparkSession)
    val sub = CacheScope.persist(subVectors(emb, nSub, subDim))
    val cb = sub.where(col("vec_id") < nCentroids)
      .select(col("vec_id").as("cid"), col("s"), col("v").as("cv"))
    val byDist = Window.partitionBy(col("vec_id"), col("s"))
      .orderBy(l2sq("v", "cv").asc, col("cid").asc)
    sub.join(broadcast(cb), "s")
      .withColumn("__rn", row_number().over(byDist))
      .where(col("__rn") === 1)
      .groupBy(col("vec_id"))
      // cid is BIGINT (from vec_id), so the shifted codes can't overflow
      .agg(expr("sum(shiftleft(cid, s * 4))").as("pq_code"))
  }

  /** ADC top-k: approximate squared-L2 neighbors of each query row
    * (`queryPred` over vec_id), ranked per query. Returns
    * (qid, cid, rank, adc_r) with the distance rounded to 6 dp. */
  def adcTopK(emb: DataFrame, spark: SparkSession,
      queryPred: org.apache.spark.sql.Column, k: Int,
      nCentroids: Int = 16, nSub: Int = 8, subDim: Int = 8): DataFrame = {
    graft.functions.VectorExpressions.register(spark)
    val sub = CacheScope.persist(subVectors(emb, nSub, subDim))
    val cb = sub.where(col("vec_id") < nCentroids)
      .select(col("vec_id").as("cid"), col("s"), col("v").as("cv"))
    // corpus codes, unpacked form: (vec_id, s, code)
    val byDist = Window.partitionBy(col("vec_id"), col("s"))
      .orderBy(l2sq("v", "cv").asc, col("cid").asc)
    val codes = sub.join(broadcast(cb), "s")
      .withColumn("__rn", row_number().over(byDist))
      .where(col("__rn") === 1)
      .select(col("vec_id"), col("s"), col("cid").as("code"))
    // per-query LUT: distance from each query sub-vector to each centroid
    val lut = sub.where(queryPred)
      .select(col("vec_id").as("qid"), col("s"), col("v").as("qv"))
      .join(broadcast(cb), "s")
      .select(col("qid"), col("s"), col("cid").as("code"),
        l2sq("qv", "cv").cast(DecimalType(24, 12)).as("d"))
    val byAdc = Window.partitionBy(col("qid"))
      .orderBy(col("adc").asc, col("cid").asc)
    codes.join(broadcast(lut), Seq("s", "code"))
      .where(col("qid") =!= col("vec_id"))
      .groupBy(col("qid"), col("vec_id").as("cid"))
      .agg(sum(col("d")).cast("double").as("adc"))
      .withColumn("rank", row_number().over(byAdc).cast("long"))
      .where(col("rank") <= k)
      .select(col("qid"), col("cid"), col("rank"),
        round(col("adc"), 6).as("adc_r"))
  }
}
