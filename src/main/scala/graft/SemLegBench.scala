package graft

import org.apache.spark.sql.functions._

/** Measurement main for SemDeDup's scale mode (constant target cluster
  * SIZE, so k grows with the corpus — the paper runs k = 11k on 440M
  * embeddings for the same reason). Reports the two cost components
  * separately per leg, because they scale differently and conflating
  * them hides the design question that matters at 100 TB:
  *
  *  - `fit_assign`: codebook training on a BOUNDED sample (fit cost is
  *    independent of corpus size) + one full nearest-centroid pass.
  *    The pass is n·k distance evaluations — with k ∝ n this term is
  *    the superlinear one, and the mitigation at 10⁹+ vectors is
  *    approximate assignment (two-level coarse/fine codebooks as in
  *    [[graft.similarity.Pq.ivfAdcTopK]], or a sign-LSH prefilter as in
  *    [[graft.similarity.Knn.lshTopK]]) — not a bigger exact pass.
  *  - `pairs`: the within-cluster cosine self-join. At constant
  *    cluster size this is the LINEAR term (n/625 clusters × ~625²/2
  *    pairs each) — the part SemDeDup's sharding actually buys.
  *
  * Protocol: dirs interleaved within each rep (CcLegBench), 5 reps,
  * k = max(8, n/625), fit on the first 4096 vectors, 2 Lloyd rounds,
  * tau = 0.35 (the registered fixture's threshold).
  */
object SemLegBench {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
               else Seq("/root/testdata/sf0.1", "target/sf1x", "target/sf10x_de")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt
    val tau = 0.35
    val spark = GraftSession.local(GraftSession.envCpus)

    val times = scala.collection.mutable.Map.empty[(String, String), Vector[Double]]
      .withDefaultValue(Vector.empty)
    for (rep <- 1 to reps; dir <- dirs) {
      CacheScope.scoped {
        val emb = sources.Tables.load(spark, dir, "embeddings")
        val n = emb.count()
        val k = math.max(8L, n / 625).toInt
        val t0 = System.nanoTime()
        // the fit sample must hold at least k vectors: Kmeans.fit seeds
        // from vec_id < k, so a hard 4096 cap would silently train fewer
        // centroids than the leg reports once n > 2.56M
        val fitSample = math.max(4096, k)
        val cents = similarity.Kmeans
          .fit(emb.filter(col("vec_id") < fitSample), k, iters = 2)
          .select(col("cid"), col("cv"))
        val p = similarity.Knn.prepared(emb)
        val asg = CacheScope.persist(
          similarity.Kmeans.assignTwoLevel(p, cents).join(p, "vec_id"))
        asg.count()
        val tAssign = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val a = asg.select(col("cid"), col("vec_id").as("va"),
          col("e").as("qe"), col("nrm").as("qn"))
        val b = asg.select(col("cid"), col("vec_id").as("vb"),
          col("e").as("ce"), col("nrm").as("cn"))
        val nPairs = a.join(b, Seq("cid"))
          .filter(col("va") < col("vb"))
          .filter(expr("dot_f64(qe, ce)") / (col("qn") * col("cn")) >= tau)
          .count()
        val tPairs = (System.nanoTime() - t1) / 1e9
        times((dir, "fit_assign")) = times((dir, "fit_assign")) :+ tAssign
        times((dir, "pairs")) = times((dir, "pairs")) :+ tPairs
        println(f"""{"sem_leg_rep":$rep,"dir":"$dir","n":$n,"k":$k,"dup_pairs":$nPairs,"fit_assign_secs":$tAssign%.3f,"pairs_secs":$tPairs%.3f}""")
      }
      spark.catalog.clearCache()
    }

    val keys = dirs.flatMap(d => Seq((d, "fit_assign"), (d, "pairs")))
    def label(k: (String, String)) = s"${k._1}#${k._2}"
    def med(xs: Vector[Double]) = { val s = xs.sorted; s(s.length / 2) }
    println("{\"metric\":\"sem_leg_medians\",\"reps\":" + reps + "," +
      "\"medians\":{" + keys.map(k => f""""${label(k)}":${med(times(k))}%.3f""").mkString(",") + "}," +
      "\"medians_min\":{" + keys.map(k => f""""${label(k)}":${times(k).min}%.3f""").mkString(",") + "}," +
      "\"per_rep\":{" + keys.map(k => s""""${label(k)}":[${times(k).map(t => f"$t%.3f").mkString(",")}]""").mkString(",") + "}}")
    spark.stop()
  }
}
