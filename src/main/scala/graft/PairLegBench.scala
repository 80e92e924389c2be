package graft

import org.apache.spark.sql.functions._

/** Measurement main for the pair family's CAPPED operating mode
  * (verdict round-10 #2): times `containmentPairsCapped` and the
  * budget-capped `prefixJaccardPairs` over the `documents` table of
  * each argument directory, with the directories interleaved WITHIN
  * each rep (the CcLegBench protocol — back-to-back single-dir
  * sessions drift more than the slopes being measured).
  *
  * The budget (`SPARK_GRAFT_PAIR_BUDGET`, default 16 pairs/doc) is
  * applied on BOTH sides of the decade, so the exponent measures the
  * capped mode a 100 TB deployment would actually run — uncapped, the
  * sf100x leg exceeds single-box spill disk (measured, round 10).
  *
  * `SPARK_GRAFT_PAIR_RECALL=dir` additionally runs the EXACT prefix
  * twin once at that (affordable) dir and reports the capped mode's
  * pair recall there — the cap's cost is a measured number, not a
  * silent loss.
  */
object PairLegBench {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
               else Seq("target/sf10x_docs", "target/sf100x_docs")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt
    val budget = sys.env.getOrElse("SPARK_GRAFT_PAIR_BUDGET", "16").toLong
    val recallDir = sys.env.get("SPARK_GRAFT_PAIR_RECALL")
    val spark = GraftSession.local(GraftSession.envCpus)

    def docs(dir: String) = sources.Tables.load(spark, dir, "documents")
    val allLegs: Seq[(String, String => Long)] = Seq(
      "containment_capped" -> { dir: String =>
        CacheScope.scoped {
          text.Dedup.containmentPairsCapped(text.Dedup.shingles(docs(dir)),
            threshold = 0.5, pairBudgetPerDoc = budget).count()
        }
      },
      "prefix_capped" -> { dir: String =>
        CacheScope.scoped {
          text.Dedup.prefixJaccardPairs(text.Dedup.shingles(docs(dir)),
            threshold = 0.5, pairBudgetPerDoc = Some(budget)).count()
        }
      },
      // the ngram leg PINNED to the rare-postings path on both sides
      // (directPairBudget = 0): the registered query's adaptive dispatch
      // takes the direct path below ~32M pair mass, so an unpinned
      // lo-vs-hi decade conflates the one-time path switch with the
      // per-leg slope — the same unbundling CcLegBench does for CC
      "ngram_pinned" -> { dir: String =>
        CacheScope.scoped {
          text.Dedup.jaccardPairs(text.Dedup.shingles(docs(dir)),
            dfCap = 10, threshold = 0.5, directPairBudget = 0L).count()
        }
      })
    val legs = sys.env.get("SPARK_GRAFT_LEGS") match {
      case Some(list) =>
        val want = list.split(",").toSet
        allLegs.filter { case (n, _) => want(n) }
      case None => allLegs.filterNot(_._1 == "ngram_pinned")
    }

    val times = scala.collection.mutable.Map.empty[(String, String), Vector[Double]]
      .withDefaultValue(Vector.empty)
    for (rep <- 1 to reps; dir <- dirs; (leg, fn) <- legs) {
      // wall-clock epoch bounds let tools/attr_reps.py slice the Spark
      // event log per (rep, dir, leg) for dataflow-vs-environment
      // variance attribution (round 16)
      val e0 = System.currentTimeMillis()
      val t0 = System.nanoTime()
      val n = fn(dir)
      val secs = (System.nanoTime() - t0) / 1e9
      val e1 = System.currentTimeMillis()
      times((dir, leg)) = times((dir, leg)) :+ secs
      println(f"""{"pair_leg_rep":$rep,"dir":"$dir","leg":"$leg","budget":$budget,"rows":$n,"secs":$secs%.3f,"t0_ms":$e0,"t1_ms":$e1}""")
      spark.catalog.clearCache()
      // System.gc AFTER the timed window: shuffle FILES are reclaimed
      // by the ContextCleaner only once the owning exchange RDDs are
      // garbage-collected, and a barely-pressured 64g bench heap can go
      // a whole run without a collection — files then accumulate across
      // a rep's legs until DISK, not any single query, is the limit
      // (r15: the sf50x bucketed-verify rep died ENOSPC under ~60 GB of
      // prior legs' shuffle files; one leg's own peak fits with margin).
      // All LegBench-family mains carry the same hygiene line.
      System.gc()
    }

    val recall = recallDir.map { dir =>
      CacheScope.scoped {
        val sh = CacheScope.persist(text.Dedup.shingles(docs(dir)))
        val exact = CacheScope.persist(
          text.Dedup.prefixJaccardPairs(sh, threshold = 0.5)
            .select(col("da"), col("db")))
        val capped = text.Dedup.prefixJaccardPairs(sh, threshold = 0.5,
          pairBudgetPerDoc = Some(budget)).select(col("da"), col("db"))
        val nExact = exact.count()
        val nHit = capped.join(exact, Seq("da", "db"), "left_semi").count()
        (dir, nExact, nHit)
      }
    }

    val keys = dirs.flatMap(d => legs.map { case (l, _) => (d, l) })
    def label(k: (String, String)) = s"${k._1}#${k._2}"
    def med(xs: Vector[Double]) = BenchStats.median(xs)
    println("{\"metric\":\"pair_leg_medians\",\"reps\":" + reps +
      ",\"budget_per_doc\":" + budget + "," +
      recall.map { case (d, ne, nh) =>
        f""""prefix_recall":{"dir":"$d","exact_pairs":$ne,"hit":$nh,"recall":${if (ne == 0) 1.0 else nh.toDouble / ne}%.4f},"""
      }.getOrElse("") +
      "\"medians\":{" + keys.map(k => f""""${label(k)}":${med(times(k))}%.3f""").mkString(",") + "}," +
      "\"medians_min\":{" + keys.map(k => f""""${label(k)}":${times(k).min}%.3f""").mkString(",") + "}," +
      "\"per_rep\":{" + keys.map(k => s""""${label(k)}":[${times(k).map(t => f"$t%.3f").mkString(",")}]""").mkString(",") + "}}")
    spark.stop()
  }
}
