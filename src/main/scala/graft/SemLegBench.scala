package graft

import org.apache.spark.sql.functions._

/** Measurement main for SemDeDup's scale mode (constant target cluster
  * SIZE, so k grows with the corpus — the paper runs k = 11k on 440M
  * embeddings for the same reason). Reports the cost components
  * separately per leg, because they scale differently and conflating
  * them hides the design question that matters at 100 TB:
  *
  *  - `fit`: codebook training on a BOUNDED max(4096, k)-vector sample
  *    (fit cost is independent of corpus size).
  *  - `assign_flat` vs `assign_twolevel`: the full nearest-centroid
  *    pass, measured BOTH ways on the SAME trained centroids (outputs
  *    are provably identical — [[graft.similarity.Kmeans.assignTwoLevel]]).
  *    Flat is n·k distance evaluations — with k ∝ n the superlinear
  *    term; two-level is ~n·√k plus a fixed multi-job overhead, so it
  *    only wins once n·k clears the measured ~4e8 crossover the
  *    adaptive dispatch encodes. The A/B at each dir is the honest
  *    form of that claim: below the crossover flat is faster and the
  *    dispatch picks it; above, two-level is the only sub-minute path.
  *  - `fit_assign`: fit + whichever assign the SHIPPED adaptive
  *    dispatch takes at that (n, k) — comparable to the round-11 rows.
  *  - `pairs`: the within-cluster cosine self-join. At constant
  *    cluster size this is the LINEAR term (n/625 clusters × ~625²/2
  *    pairs each) — the part SemDeDup's sharding actually buys.
  *
  * `k_trained` is reported alongside the requested k: the fixture
  * chain's vec_ids are copy-offset (sparse above the copy-0 block), so
  * at large k the vec_id < k seeding can find fewer rows than k — the
  * printed number is what the codebook actually holds.
  *
  * Protocol: dirs interleaved within each rep (CcLegBench), 5 reps,
  * k = max(8, n/625), 2 Lloyd rounds, tau = 0.35 (the registered
  * fixture's threshold).
  */
object SemLegBench {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
               else Seq("/root/testdata/sf0.1", "target/sf1x", "target/sf10x_de")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt
    val tau = 0.35
    val workBudget = 4e8 // mirror assignTwoLevel's default
    val spark = GraftSession.local(GraftSession.envCpus)

    val times = scala.collection.mutable.Map.empty[(String, String), Vector[Double]]
      .withDefaultValue(Vector.empty)
    val comps = Seq("fit", "assign_flat", "assign_twolevel", "fit_assign", "pairs")
    for (rep <- 1 to reps; dir <- dirs) {
      CacheScope.scoped {
        val emb = sources.Tables.load(spark, dir, "embeddings")
        val n = emb.count()
        val k = math.max(8L, n / 625).toInt
        // the fit sample must hold at least k vectors: Kmeans.fit seeds
        // from vec_id < k, so a hard 4096 cap would silently train fewer
        // centroids than the leg reports once n > 2.56M
        val fitSample = math.max(4096, k)
        val t0 = System.nanoTime()
        val cents = similarity.Kmeans
          .fit(emb.filter(col("vec_id") < fitSample), k, iters = 2)
          .select(col("cid"), col("cv")).localCheckpoint()
        val kTrained = cents.count()
        val tFit = (System.nanoTime() - t0) / 1e9
        val p = CacheScope.persist(similarity.Knn.prepared(emb))
        p.count()
        val t1 = System.nanoTime()
        val flatAsg = CacheScope.persist(
          similarity.Kmeans.assign(p, cents))
        flatAsg.count()
        val tFlat = (System.nanoTime() - t1) / 1e9
        // forced two-level (workBudget = 0) wherever k clears the tiny-k
        // floor — the A/B leg; identical output by construction
        val tTwo = if (kTrained > 64) {
          val t2 = System.nanoTime()
          similarity.Kmeans.assignTwoLevel(p, cents, workBudget = 0.0).count()
          Some((System.nanoTime() - t2) / 1e9)
        } else None
        // shipped-path composite: what the adaptive dispatch actually runs
        val tFitAssign = tFit + (
          if (kTrained <= 64 || n.toDouble * kTrained <= workBudget) tFlat
          else tTwo.getOrElse(tFlat))
        val t3 = System.nanoTime()
        val asg = flatAsg.join(p, "vec_id")
        val a = asg.select(col("cid"), col("vec_id").as("va"),
          col("e").as("qe"), col("nrm").as("qn"))
        val b = asg.select(col("cid"), col("vec_id").as("vb"),
          col("e").as("ce"), col("nrm").as("cn"))
        val nPairs = a.join(b, Seq("cid"))
          .filter(col("va") < col("vb"))
          .filter(expr("dot_f64(qe, ce)") / (col("qn") * col("cn")) >= tau)
          .count()
        val tPairs = (System.nanoTime() - t3) / 1e9
        times((dir, "fit")) = times((dir, "fit")) :+ tFit
        times((dir, "assign_flat")) = times((dir, "assign_flat")) :+ tFlat
        tTwo.foreach { t =>
          times((dir, "assign_twolevel")) = times((dir, "assign_twolevel")) :+ t }
        times((dir, "fit_assign")) = times((dir, "fit_assign")) :+ tFitAssign
        times((dir, "pairs")) = times((dir, "pairs")) :+ tPairs
        println(f"""{"sem_leg_rep":$rep,"dir":"$dir","n":$n,"k":$k,"k_trained":$kTrained,"dup_pairs":$nPairs,"fit_secs":$tFit%.3f,"assign_flat_secs":$tFlat%.3f,"assign_twolevel_secs":${tTwo.map(t => f"$t%.3f").getOrElse("null")},"fit_assign_secs":$tFitAssign%.3f,"pairs_secs":$tPairs%.3f}""")
      }
      spark.catalog.clearCache()
      System.gc() // see PairLegBench scaladoc: frees shuffle files via ContextCleaner
    }

    val keys = for (d <- dirs; c <- comps; if times.contains((d, c)))
      yield (d, c)
    def label(k: (String, String)) = s"${k._1}#${k._2}"
    def med(xs: Vector[Double]) = BenchStats.median(xs)
    println("{\"metric\":\"sem_leg_medians\",\"reps\":" + reps + "," +
      "\"medians\":{" + keys.map(k => f""""${label(k)}":${med(times(k))}%.3f""").mkString(",") + "}," +
      "\"medians_min\":{" + keys.map(k => f""""${label(k)}":${times(k).min}%.3f""").mkString(",") + "}," +
      "\"per_rep\":{" + keys.map(k => s""""${label(k)}":[${times(k).map(t => f"$t%.3f").mkString(",")}]""").mkString(",") + "}}")
    spark.stop()
  }
}
