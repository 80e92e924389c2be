package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.CacheScope

/** Lloyd's k-means as pure dataflow — the codebook trainer the IVF/PQ
  * docs point at (`Knn.ivfTopK`, `Pq`), kept fully deterministic so the
  * oracle gate can check it: centroids seed from the first k vectors,
  * the iteration count is fixed, assignment ties break on centroid id,
  * and recentering sums run through DECIMAL(24,12) so the means are
  * partial-agg-order-exact. Given identical inputs both engines walk
  * identical centroid trajectories — k-means is chaotic only across
  * SEEDS, not within one deterministic run.
  *
  * Scale posture per iteration: assign is corpus × broadcast(k
  * centroids) + a top-1 window on vec_id (one shuffle); recenter is a
  * posexplode to (cluster, dim) — corpus × dims rows, the same width a
  * feature matrix already has — aggregated in one shuffle on
  * (cluster, dim). Centroid frames are k rows: persisted, broadcast,
  * never a bottleneck. Empty clusters drop out (standard Lloyd); k can
  * only shrink.
  */
object Kmeans {

  private def l2sq(a: String, b: String) =
    expr(s"dot_f64($a, $a) - 2 * dot_f64($a, $b) + dot_f64($b, $b)")

  /** Nearest-centroid assignment: (vec_id, cid) — one row per vector.
    *
    * Shape matters here more than anywhere else in the trainer: the
    * n×k candidate frame is reduced by `min(struct(dist, cid))` — the
    * same (dist asc, cid asc) order a row_number window would use, but
    * as an AGGREGATE, so map-side partial aggregation collapses the
    * shuffle to ~one 24-byte row per vector per partition. The window
    * form it replaces shuffled the full candidate rows — including the
    * embedding AND centroid vectors (~2 KB each) — through the
    * exchange: at 500k vectors × 800 centroids that is ~800 GB of
    * shuffle vs ~12 MB after this reduction. Verified output-identical
    * (the DuckDB oracle's `kmAssign` computes the same arg-min). */
  def assign(prepared: DataFrame, centroids: DataFrame): DataFrame =
    prepared.crossJoin(broadcast(centroids))
      .select(col("vec_id"), col("cid"), l2sq("e", "cv").as("__d"))
      .groupBy(col("vec_id"))
      .agg(min(struct(col("__d"), col("cid"))).as("__m"))
      .select(col("vec_id"), col("__m.cid").as("cid"))

  /** Run `iters` Lloyd rounds over the embedding column; returns the
    * final centroids as (cid, cv, n_members) where `n_members` counts
    * the assignment that produced each centroid. */
  def fit(emb: DataFrame, k: Int, iters: Int): DataFrame = {
    require(k > 0 && iters > 0, "k-means needs k > 0 and iters > 0")
    graft.functions.VectorExpressions.register(emb.sparkSession)
    val p = CacheScope.persist(
      emb.select(col("vec_id"), col("embedding").cast("array<double>").as("e")))
    var cents = p.where(col("vec_id") < k)
      .select(col("vec_id").as("cid"), col("e").as("cv"),
        lit(1L).as("n_members"))
    for (_ <- 1 to iters) {
      val asg = assign(p, cents.select(col("cid"), col("cv")))
      cents = CacheScope.persist(
        asg.join(p, "vec_id")
          .select(col("cid"), posexplode(col("e")).as(Seq("pos", "x")))
          .groupBy(col("cid"), col("pos"))
          .agg((sum(col("x").cast("decimal(24,12)")).cast("double") /
            count(lit(1))).as("m"),
            count(lit(1)).as("n"))
          .groupBy(col("cid"))
          .agg(expr(
            "transform(sort_array(collect_list(struct(pos, m))), s -> s.m)")
            .as("cv"),
            max(col("n")).as("n_members"))) // n identical across dims
      cents.count() // materialize inside the loop: bounded lineage per round
    }
    cents
  }

  /** Per-group Lloyd: an independent k-means per value of `g`, trained
    * in ONE shared dataflow — each round is a single assignment shuffle
    * plus a single recenter shuffle for ALL groups together. This is
    * the PQ-subspace codebook trainer: running `nSub` separate [[fit]]s
    * would scan the sub-vector corpus `nSub` times; keying every stage
    * by the group column makes the pass count independent of `nSub`,
    * which is what survives 100 TB. Input `(g, vec_id, v)`; each
    * group's seeds are its `vec_id < k` rows; returns `(g, cid, cv)`.
    * Same determinism contract as [[fit]] (decimal-exact means, fixed
    * iterations, centroid-id tiebreaks), so the oracle gate can walk
    * the identical trajectory. */
  def fitGrouped(sub: DataFrame, k: Int, iters: Int): DataFrame = {
    require(k > 0 && iters > 0, "k-means needs k > 0 and iters > 0")
    graft.functions.VectorExpressions.register(sub.sparkSession)
    val p = CacheScope.persist(sub.select(col("g"), col("vec_id"),
      col("v").cast("array<double>").as("v")))
    var cents = p.where(col("vec_id") < k)
      .select(col("g"), col("vec_id").as("cid"), col("v").as("cv"))
    for (_ <- 1 to iters) {
      // same min(struct) reduction as [[assign]] (map-side combine vs
      // shuffling full candidate rows through a window exchange); v
      // rides the buffer but never orders — (dist, cid) is unique per
      // (g, vec_id) candidate set, so comparison stops at cid
      val asg = p.join(broadcast(cents), "g")
        .select(col("g"), col("vec_id"),
          l2sq("v", "cv").as("__d"), col("cid"), col("v"))
        .groupBy(col("g"), col("vec_id"))
        .agg(min(struct(col("__d"), col("cid"), col("v"))).as("__m"))
        .select(col("g"), col("__m.cid").as("cid"), col("__m.v").as("v"))
      cents = CacheScope.persist(
        asg.select(col("g"), col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
          .groupBy(col("g"), col("cid"), col("pos"))
          .agg((sum(col("x").cast("decimal(24,12)")).cast("double") /
            count(lit(1))).as("m"))
          .groupBy(col("g"), col("cid"))
          .agg(expr(
            "transform(sort_array(collect_list(struct(pos, m))), t -> t.m)")
            .as("cv")))
      cents.count() // materialize inside the loop: bounded lineage per round
    }
    cents
  }
}
