package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

import graft.text.Dedup

/** Round-17 seam: the two-phase BROADCAST verify (the middle octave
  * where the 64-bit hash-set frame exceeds the broadcast fence but its
  * 32-bit truncation fits — r16 verdict #2). The dispatch is now
  * three-way; these tests pin the middle leg's output equality against
  * both neighbours and its plan shape (no bucketed stage, no
  * sort-merge join, broadcast screen + confirm).
  */
class Round17Spec extends SparkSuite {

  private def docs = sources.Tables.load(spark, sf, "documents")

  /** The dispatch's own size estimates for the given shingle frame —
    * same arithmetic as Dedup.verifiedCommon, recomputed here so the
    * test can place the fence strictly INSIDE the middle octave. */
  private def estimates(sh: DataFrame): (Long, Long) = {
    val hs = Dedup.docHashSets(Dedup.hashedPostings(sh))
    val r = hs.agg(count(lit(1)), coalesce(sum(col("n")), lit(0L))).head()
    val (rows, postings) = (r.getLong(0), r.getLong(1))
    (rows * 48L + postings * 4L, rows * 48L + postings * 8L)
  }

  private def allPlanNodes(p: SparkPlan): Seq[SparkPlan] = {
    val self = p match {
      case a: AdaptiveSparkPlanExec => allPlanNodes(a.executedPlan)
      case _ => p.children.flatMap(allPlanNodes)
    }
    p +: self
  }

  test("middle-octave fence: two-phase broadcast verify output identical to single-phase broadcast and bucketed") {
    CacheScope.scoped {
      val sh = Dedup.shingles(docs)
      val (est32, est64) = estimates(sh)
      assert(est32 < est64, "fixture must have non-empty postings")
      val mid = ((est32 + est64) / 2).toString
      def run(): Set[org.apache.spark.sql.Row] =
        Dedup.containmentPairsCapped(sh, threshold = 0.5).collect().toSet
      val viaBroadcast = run() // default fence 1.5e9 >> est64 at sf0.001
      try {
        spark.conf.set(Dedup.VerifyBroadcastBytesKey, mid)
        assert(run() == viaBroadcast,
          "two-phase broadcast output diverged from single-phase")
        spark.conf.set(Dedup.VerifyBroadcastBytesKey, "0")
        assert(run() == viaBroadcast,
          "bucketed output diverged from single-phase")
      } finally spark.conf.unset(Dedup.VerifyBroadcastBytesKey)
      assert(viaBroadcast.nonEmpty, "fixture produced no containment pairs — vacuous")
    }
  }

  test("middle-octave fence: prefix jaccard + ngram rare-postings identical across all three dispatches") {
    CacheScope.scoped {
      val sh = Dedup.shingles(docs)
      val (est32, est64) = estimates(sh)
      val mid = ((est32 + est64) / 2).toString
      val jB = Dedup.prefixJaccardPairs(sh, 0.5).collect().toSet
      val nB = Dedup.jaccardPairs(sh, dfCap = 10, threshold = 0.5,
        directPairBudget = 0L).collect().toSet
      try {
        spark.conf.set(Dedup.VerifyBroadcastBytesKey, mid)
        assert(Dedup.prefixJaccardPairs(sh, 0.5).collect().toSet == jB)
        assert(Dedup.jaccardPairs(sh, dfCap = 10, threshold = 0.5,
          directPairBudget = 0L).collect().toSet == nB)
      } finally spark.conf.unset(Dedup.VerifyBroadcastBytesKey)
      assert(jB.nonEmpty && nB.nonEmpty)
    }
  }

  test("middle-octave plan: no bucketed stage, no sort-merge join, broadcast screen+confirm") {
    CacheScope.scoped {
      val sh = Dedup.shingles(docs)
      val (est32, est64) = estimates(sh)
      try {
        spark.conf.set(Dedup.VerifyBroadcastBytesKey,
          ((est32 + est64) / 2).toString)
        // autoBroadcast off: every BHJ in the plan is one the dispatch
        // asked for by hint, not one AQE volunteered
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val df = Dedup.containmentPairsCapped(sh, threshold = 0.5)
        df.count()
        val nodes = allPlanNodes(df.queryExecution.executedPlan)
        // NOT the bucketed path: zero bucketed file scans anywhere
        assert(!nodes.exists {
          case f: FileSourceScanExec => f.bucketedScan
          case _ => false
        }, "middle-octave dispatch took the bucketed path")
        // NOT a sort-merge fallback (est64 > fence rules out the
        // single-phase leg; no bucketed scan rules out the staged leg —
        // by elimination this IS the two-phase broadcast)
        assert(!nodes.exists(_.isInstanceOf[SortMergeJoinExec]),
          "verify must never sort-merge")
        // confirm joins are broadcast hash joins (survivor frame is a
        // small fraction of the corpus, re-estimated under the fence)
        assert(nodes.count(_.isInstanceOf[BroadcastHashJoinExec]) >= 2,
          "confirm joins must broadcast")
      } finally {
        spark.conf.unset(Dedup.VerifyBroadcastBytesKey)
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
    }
  }

  test("dispatch boundary arithmetic: est32 halves the posting term, not the row term") {
    // 1000 rows, 100k postings: est64 = 48k + 800k, est32 = 48k + 400k —
    // the octave the middle leg buys is exactly the posting-dominated
    // regime where the screen shrinks what matters
    val rows = 1000L; val postings = 100000L
    val est64 = rows * 48L + postings * 8L
    val est32 = rows * 48L + postings * 4L
    assert(est64 == 848000L && est32 == 448000L)
    assert(est32 > est64 / 2, "row overhead keeps est32 above half")
  }
}
