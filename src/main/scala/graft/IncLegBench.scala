package graft

import org.apache.spark.sql.functions._

/** Measurement main for incremental LSH dedup's two cost components
  * (the production split the registered query can't show): for each
  * argument directory it
  *   (1) builds the corpus band index (doc_id % 4 ≠ 0) and stages it
  *       to parquet ONCE — the cost a production corpus pays at
  *       ingest, amortized over every later increment; then
  *   (2) times `Dedup.incrementalLshDedup(newBatch, storedIndex)`
  *       per rep against the STORED index — the marginal cost of a
  *       daily increment, which is what actually recurs at 100 TB.
  * Dirs interleave within each rep (the CcLegBench protocol). The
  * registered gate query (`q_dedup_incremental_lsh`) builds the index
  * in-query so the oracle can pin both halves in one hash; this main
  * measures the halves separately.
  */
object IncLegBench {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
               else Seq("target/sf1x", "target/sf10x_de")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt
    val spark = GraftSession.local(GraftSession.envCpus)

    // stage each dir's corpus index once, timing the build
    val idxPath = scala.collection.mutable.Map.empty[String, String]
    val buildSecs = scala.collection.mutable.Map.empty[String, Double]
    for (dir <- dirs) {
      val out = "/root/repo/target/stage/inc_index/" +
        dir.replaceAll("[^A-Za-z0-9._-]", "_")
      val t0 = System.nanoTime()
      CacheScope.scoped {
        val corpus = sources.Tables.load(spark, dir, "documents")
          .where(col("doc_id") % 4 =!= 0)
        text.Dedup.bandIndex(text.Dedup.minhashSignatures(
            text.Dedup.shingles(corpus)))
          .write.mode("overwrite").parquet(out)
      }
      buildSecs(dir) = (System.nanoTime() - t0) / 1e9
      idxPath(dir) = out
      println(f"""{"inc_index_build":"$dir","secs":${buildSecs(dir)}%.3f}""")
    }

    val times = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    for (rep <- 1 to reps; dir <- dirs) {
      val t0 = System.nanoTime()
      val n = CacheScope.scoped {
        text.Dedup.incrementalLshDedup(
          sources.Tables.load(spark, dir, "documents")
            .where(col("doc_id") % 4 === 0),
          spark.read.parquet(idxPath(dir))).count()
      }
      val secs = (System.nanoTime() - t0) / 1e9
      times(dir) = times(dir) :+ secs
      println(f"""{"inc_leg_rep":$rep,"dir":"$dir","rows":$n,"secs":$secs%.3f}""")
      spark.catalog.clearCache()
    }

    def med(xs: Vector[Double]) = { val s = xs.sorted; s(s.length / 2) }
    println("{\"metric\":\"inc_leg_medians\",\"reps\":" + reps + "," +
      "\"index_build\":{" + dirs.map(d => f""""$d":${buildSecs(d)}%.3f""").mkString(",") + "}," +
      "\"medians\":{" + dirs.map(d => f""""$d":${med(times(d))}%.3f""").mkString(",") + "}," +
      "\"medians_min\":{" + dirs.map(d => f""""$d":${times(d).min}%.3f""").mkString(",") + "}," +
      "\"per_rep\":{" + dirs.map(d => s""""$d":[${times(d).map(t => f"$t%.3f").mkString(",")}]""").mkString(",") + "}}")
    spark.stop()
  }
}
