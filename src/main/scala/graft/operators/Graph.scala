package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over an edge list — the family
  * `Dedup.connectedComponents` opened (pointer-doubling min-label), here
  * with mass propagation: PageRank as the canonical fixed-iteration
  * member. On a dedup/similarity graph the rank identifies HUB
  * documents — near-duplicate cluster centers that many documents
  * resemble — a useful canonical-pick signal alongside quality scores.
  *
  * Dataflow per iteration: contributions = ranks ⨝ out-degrees (both
  * keyed on the node, one shuffle), then a sum per destination (second
  * shuffle) — linear in edges, the textbook distributed PageRank.
  * Contributions pass through DECIMAL(24,12) so the per-destination sum
  * is partial-agg-order-exact and an oracle can unroll the same
  * iterations bit-for-bit. Dangling nodes (no out-edges) contribute no
  * mass — the documented variant; their own rank still receives the
  * teleport term. A fixed iteration count keeps the computation
  * oracle-checkable; production convergence loops just extend the same
  * round.
  */
object Graph {

  /** `iters` PageRank rounds over the directed edge list (src, dst).
    * `nodes` fixes the node universe (isolated nodes keep the teleport
    * rank). Returns (node, rank). */
  def pageRank(nodes: DataFrame, edges: DataFrame, damping: Double,
      iters: Int): DataFrame = {
    require(iters > 0, "pageRank needs iters > 0")
    val n = nodes.select(col("node")).distinct()
    val e = graft.CacheScope.persist(edges.select(col("src"), col("dst")))
    val deg = graft.CacheScope.persist(
      e.groupBy(col("src")).agg(count(lit(1)).as("deg")))
    val nCount = n.count().toDouble
    var ranks = n.withColumn("rank", lit(1.0 / nCount))
    for (_ <- 1 to iters) {
      val contrib = ranks
        .join(deg, ranks("node") === deg("src"))
        .join(e, "src")
        .select(col("dst").as("node"),
          (col("rank") / col("deg") * damping)
            .cast("decimal(24,12)").as("c"))
      ranks = graft.CacheScope.persist(
        n.join(contrib.groupBy(col("node"))
            .agg(sum(col("c")).cast("double").as("inflow")),
          Seq("node"), "left")
          .select(col("node"),
            (lit((1.0 - damping) / nCount) +
              coalesce(col("inflow"), lit(0.0))).as("rank")))
      ranks.count() // materialize: bounded lineage per round
    }
    ranks
  }
}
