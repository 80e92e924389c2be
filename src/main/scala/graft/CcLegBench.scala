package graft

import org.apache.spark.sql.functions._

/** Measurement main for the connected-components stage in isolation:
  * times shingle → MinHash → LSH-banding → CC end-to-end over the
  * `documents` table of each argument directory, with the CC dispatch
  * leg pinned via `SPARK_GRAFT_CC_SMALL_MAX` (0 forces the distributed
  * min-label loop; unset keeps the shipped 2^22 adaptive bound).
  *
  * Purpose: a scaling decade whose lo and hi sides fall on OPPOSITE
  * sides of the adaptive bound conflates the one-time leg switch with
  * the per-leg scaling slope (the third-decade CC artifact measures
  * exactly that crossing). Pinning the leg on both sides isolates the
  * slope a deployment past the boundary would actually ride. Also
  * prints the directed edge count per side, which is the dispatch
  * input and the denominator of any per-edge cost argument.
  *
  * Output: one JSON line per (dir, rep) plus a final medians line —
  * same consumption pattern as `Bench`.
  */
object CcLegBench {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("target/sf10x", "target/sf100x")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    // Each mode is a smallGraphMaxEdges value: "adaptive" = the shipped
    // 2^22 default, an integer pins the bound ("0" forces the
    // distributed leg). Several comma-separated modes interleave WITHIN
    // each rep, so a mode-vs-mode comparison shares box conditions —
    // back-to-back single-mode sessions on this box drift ±25%, which
    // is larger than the effect being measured (the probe premium).
    val modes = sys.env.get("SPARK_GRAFT_CC_MODES")
      .orElse(sys.env.get("SPARK_GRAFT_CC_SMALL_MAX"))
      .getOrElse("adaptive").split(",").toSeq
    def bound(mode: String): Long =
      if (mode == "adaptive") 1L << 22 else mode.toLong
    val spark = GraftSession.local(GraftSession.envCpus)
    val times = scala.collection.mutable.Map.empty[(String, String), Vector[Double]]
      .withDefaultValue(Vector.empty)
    val edges = scala.collection.mutable.Map.empty[String, Long]
    for (rep <- 1 to reps; dir <- dirs; mode <- modes) {
      val t0 = System.nanoTime()
      val nRows = CacheScope.scoped {
        val docs = sources.Tables.load(spark, dir, "documents")
        val pairs = text.Dedup.lshCandidates(
          text.Dedup.minhashSignatures(text.Dedup.shingles(docs)))
          .select(col("da"), col("db"))
        if (!edges.contains(dir))
          edges(dir) = 2L * pairs.count() // directed form, the dispatch input
        text.Dedup.connectedComponents(pairs,
          smallGraphMaxEdges = bound(mode)).count()
      }
      val secs = (System.nanoTime() - t0) / 1e9
      times((dir, mode)) = times((dir, mode)) :+ secs
      println(f"""{"cc_leg_rep":$rep,"dir":"$dir","mode":"$mode","rows":$nRows,"secs":$secs%.3f}""")
      spark.catalog.clearCache()
      System.gc() // see PairLegBench scaladoc: frees shuffle files via ContextCleaner
    }
    val keys = dirs.flatMap(d => modes.map(m => (d, m)))
    def label(k: (String, String)) =
      if (modes.length == 1) k._1 else s"${k._1}#${k._2}"
    val med = times.map { case (k, xs) =>
      val s = xs.sorted; k -> s(s.length / 2)
    }
    println("{\"metric\":\"cc_leg_medians\"," +
      s""""modes":[${modes.map(m => s""""$m"""").mkString(",")}],""" +
      s""""reps":$reps,""" +
      "\"directed_edges\":{" + dirs.map(d => s""""$d":${edges.getOrElse(d, -1L)}""").mkString(",") + "}," +
      "\"medians\":{" + keys.map(k => f""""${label(k)}":${med(k)}%.3f""").mkString(",") + "}," +
      "\"per_rep\":{" + keys.map(k => s""""${label(k)}":[${times(k).map(t => f"$t%.3f").mkString(",")}]""").mkString(",") + "}}")
    spark.stop()
  }
}
