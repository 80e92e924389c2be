package graft

import org.apache.spark.sql.functions._

/** Measurement main for PMI's vocabulary-BOUNDED operating mode
  * (verdict round-11 #6): times `TextAnalysis.pmi(topV = V)` over the
  * `documents` table of each argument directory, dirs interleaved
  * WITHIN each rep (the CcLegBench protocol). The registered gate
  * query (`q_text_pmi_capped`) pins the cap semantics at V = 16 where
  * the fixture vocabulary makes it bite; this main measures the
  * SCALING of the same operator at a production vocabulary budget
  * (`SPARK_GRAFT_PMI_TOPV`, default 4096) on the realistic
  * Heaps/Zipf corpora, where uncapped PMI's distinct-pair space grows
  * ~V² with the corpus (measured 1.02 min-protocol, round 11).
  */
object PmiLegBench {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
               else Seq("target/zipf50k", "target/zipf500k")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt
    val topV = sys.env.getOrElse("SPARK_GRAFT_PMI_TOPV", "4096").toLong
    // the df-band leg: default 0.5; empty/"none"/"off" runs the
    // UNBANDED leg (r13 could not express None at all); anything else
    // must parse to a fraction in (0, 1]
    val maxDf: Option[Double] =
      sys.env.get("SPARK_GRAFT_PMI_MAXDF").map(_.trim.toLowerCase) match {
        case None => Some(0.5)
        case Some("") | Some("none") | Some("off") => None
        case Some(v) =>
          val d = try v.toDouble catch {
            case _: NumberFormatException => sys.error(
              s"SPARK_GRAFT_PMI_MAXDF must be a fraction in (0,1], " +
              s"'none'/'off'/empty for unbanded — got '$v'")
          }
          require(d > 0 && d <= 1,
            s"SPARK_GRAFT_PMI_MAXDF must be in (0,1], got $d")
          Some(d)
      }
    val spark = GraftSession.local(GraftSession.envCpus)

    val times = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    for (rep <- 1 to reps; dir <- dirs) {
      val t0 = System.nanoTime()
      val n = CacheScope.scoped {
        text.TextAnalysis.pmi(
          sources.Tables.load(spark, dir, "documents"),
          topV = Some(topV),
          maxDfFrac = maxDf).count()
      }
      val secs = (System.nanoTime() - t0) / 1e9
      times(dir) = times(dir) :+ secs
      println(f"""{"pmi_leg_rep":$rep,"dir":"$dir","top_v":$topV,"rows":$n,"secs":$secs%.3f}""")
      spark.catalog.clearCache()
      System.gc() // see PairLegBench scaladoc: frees shuffle files via ContextCleaner
    }

    def med(xs: Vector[Double]) = BenchStats.median(xs)
    println("{\"metric\":\"pmi_leg_medians\",\"reps\":" + reps +
      ",\"top_v\":" + topV + "," +
      "\"medians\":{" + dirs.map(d => f""""$d":${med(times(d))}%.3f""").mkString(",") + "}," +
      "\"medians_min\":{" + dirs.map(d => f""""$d":${times(d).min}%.3f""").mkString(",") + "}," +
      "\"per_rep\":{" + dirs.map(d => s""""$d":[${times(d).map(t => f"$t%.3f").mkString(",")}]""").mkString(",") + "}}")
    spark.stop()
  }
}
