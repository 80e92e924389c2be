package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
  * deduplication by k-means sharding. Exact cosine near-dup search is
  * quadratic; SemDeDup's observation is that semantic duplicates land
  * in the same k-means cluster, so the pair search runs WITHIN clusters
  * only — expected cost O(n²/k) for balanced clusters, with k grown
  * with the corpus (the paper uses k = 11k on LAION-440M; the cluster
  * equi-join here shards the same way [[Knn.similarPairs]]'s sign
  * buckets do, but with data-adaptive regions instead of fixed
  * hyperplanes).
  *
  * Keep rule, derandomized: within each cluster a vector is DROPPED iff
  * some lower-id vector sits within the cosine threshold (the paper
  * keeps one random member per ε-neighborhood; min-id is the
  * deterministic equivalent, matching [[graft.text.Dedup.exactDedup]]'s
  * keeper convention so downstream stages compose).
  *
  * Dataflow at 100 TB: [[Kmeans.fit]] is iterative
  * broadcast-assign/recenter (centroid frames are k rows, always
  * broadcast); the final assignment runs [[Kmeans.assignTwoLevel]] —
  * exact triangle-inequality group pruning over ⌈√k⌉ super-clusters,
  * so the n·k term the constant-cluster-size regime (k ∝ n) would
  * make superlinear drops to ~n·√k, with output provably identical to
  * the flat pass (below 64 centroids the flat pass itself is
  * dispatched, which keeps the k = 8 oracle fixture byte-identical);
  * the pair stage is a self-equi-join on cid — quadratic only within a
  * cluster, never across; the keep verdict is one groupBy on the
  * dominated id. Nothing is all-pairs.
  */
object SemDedup {

  /** Per-vector dedup verdict: (vec_id, cid, kept_for, n_dominators,
    * keep) — `kept_for` is the smallest same-cluster id within `tau`
    * cosine (NULL for keepers), `n_dominators` counts them. */
  def semDedup(emb: DataFrame, k: Int, iters: Int, tau: Double,
      flatBelow: Long = 64L, workBudget: Double = 4e8): DataFrame = {
    require(tau > 0 && tau <= 1, "tau in (0, 1]")
    val cents = Kmeans.fit(emb, k, iters).select(col("cid"), col("cv"))
    // persisted: the two-level path reads the prepared frame three times
    // (super distances, survivors, final arg-min) plus the asg join here
    val p = graft.CacheScope.persist(Knn.prepared(emb))
    val asg = graft.CacheScope.persist(
      Kmeans.assignTwoLevel(p, cents, flatBelow, workBudget)
        .join(p, "vec_id"))
    val a = asg.select(col("cid"), col("vec_id").as("va"),
      col("e").as("qe"), col("nrm").as("qn"))
    val b = asg.select(col("cid"), col("vec_id").as("vb"),
      col("e").as("ce"), col("nrm").as("cn"))
    val dominated = a.join(b, Seq("cid"))
      .filter(col("va") < col("vb"))
      .filter(expr("dot_f64(qe, ce)") / (col("qn") * col("cn")) >= tau)
      .groupBy(col("vb").as("vec_id"))
      .agg(min(col("va")).as("kept_for"),
        count(lit(1)).as("n_dominators"))
    asg.select(col("vec_id"), col("cid"))
      .join(dominated, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cid"), col("kept_for"),
        coalesce(col("n_dominators"), lit(0L)).as("n_dominators"),
        col("kept_for").isNull.as("keep"))
  }
}
