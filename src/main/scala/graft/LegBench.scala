package graft

/** Interleaved A/B measurement main for REGISTERED queries: times each
  * `SPARK_GRAFT_ONLY` query over every argument directory, with the
  * directories alternating WITHIN each rep (rep-major, dir inner), so a
  * lo-vs-hi decade comparison shares box conditions rep by rep —
  * back-to-back single-dir sessions on this box drift 3-5× on the pair
  * family (PERF.md round-9/10), which is larger than the slopes being
  * measured. Same protocol as `CcLegBench`, generalized to any query.
  *
  * Output: one JSON line per (rep, dir, query) plus a final line with
  * medians, minima, and every rep — the consumption pattern of `Bench`,
  * plus `medians_min` because the pair family's sf10x adjudication
  * protocol reads per-rep MINIMA (PERF.md).
  */
object LegBench {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
               else Seq("target/sf1x", "target/sf10x_docs")
    val queries = sys.env.getOrElse("SPARK_GRAFT_ONLY",
      sys.error("set SPARK_GRAFT_ONLY to a comma list of query names"))
      .split(",").toSeq
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt
    val spark = GraftSession.local(GraftSession.envCpus)
    val times = scala.collection.mutable.Map.empty[(String, String), Vector[Double]]
      .withDefaultValue(Vector.empty)
    for (rep <- 1 to reps; dir <- dirs; q <- queries) {
      val t0 = System.nanoTime()
      val n = CacheScope.scoped { SparkEntry.queries(q)(spark, dir).count() }
      val secs = (System.nanoTime() - t0) / 1e9
      times((dir, q)) = times((dir, q)) :+ secs
      println(f"""{"leg_rep":$rep,"dir":"$dir","query":"$q","rows":$n,"secs":$secs%.3f}""")
      spark.catalog.clearCache()
      System.gc() // see PairLegBench scaladoc: frees shuffle files via ContextCleaner
    }
    val keys = dirs.flatMap(d => queries.map(q => (d, q)))
    def label(k: (String, String)) = s"${k._1}#${k._2}"
    def med(xs: Vector[Double]) = BenchStats.median(xs)
    println("{\"metric\":\"leg_medians\",\"reps\":" + reps + "," +
      "\"medians\":{" + keys.map(k => f""""${label(k)}":${med(times(k))}%.3f""").mkString(",") + "}," +
      "\"medians_min\":{" + keys.map(k => f""""${label(k)}":${times(k).min}%.3f""").mkString(",") + "}," +
      "\"per_rep\":{" + keys.map(k => s""""${label(k)}":[${times(k).map(t => f"$t%.3f").mkString(",")}]""").mkString(",") + "}}")
    spark.stop()
  }
}
