package graft

import org.apache.spark.sql.functions._

import graft.text.Dedup

/** Round-11 guards: the adaptive dispatches' PLAN shape on each side of
  * their size boundary (Round10Spec pins output equality; these pin the
  * physical path, so a reverted dispatch fails even while results stay
  * identical), the multimodal curation composition against an
  * independent plain-Scala reference, and the bm25 excludeSelf contract.
  */
class Round11Spec extends SparkSuite {

  private def docs = graft.sources.Tables.load(spark, sf, "documents")

  test("CC dispatch below the edge bound is the collect-fenced union-find (LocalTableScan)") {
    import spark.implicits._
    graft.CacheScope.scoped {
      val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("da", "db")
      val small = Dedup.connectedComponents(pairs) // default bound: 2^22
      small.count()
      val p = small.queryExecution.executedPlan.toString
      // driver union-find materializes a local relation — no iterative
      // checkpoint RDD may appear in the result plan
      assert(p.contains("LocalTableScan"), p.take(800))
      assert(!p.contains("ExistingRDD"), p.take(800))
    }
  }

  test("CC dispatch above the edge bound is the checkpointed distributed loop (ExistingRDD)") {
    import spark.implicits._
    graft.CacheScope.scoped {
      val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("da", "db")
      val dist = Dedup.connectedComponents(pairs, smallGraphMaxEdges = 0L)
      dist.count()
      val p = dist.queryExecution.executedPlan.toString
      // the distributed min-label loop ends in a localCheckpoint scan;
      // a LocalTableScan here would mean a driver-side collect ran on
      // what must be the at-scale path
      assert(p.contains("ExistingRDD"), p.take(800))
      assert(!p.contains("LocalTableScan"), p.take(800))
    }
  }

  test("jaccard dispatch boundary sits exactly at the pair-mass budget") {
    import spark.implicits._
    graft.CacheScope.scoped {
      // 3 docs sharing one shingle -> pair mass C(3,2) = 3
      val sh = Seq((1L, "x"), (2L, "x"), (3L, "x")).toDF("doc_id", "s")
      val at = Dedup.jaccardPairs(sh, dfCap = 10, threshold = 0.0,
        directPairBudget = 3L) // mass == budget -> direct path
      at.count()
      assert(!at.queryExecution.executedPlan.toString.contains("array_intersect"))
      val over = Dedup.jaccardPairs(sh, dfCap = 10, threshold = 0.0,
        directPairBudget = 2L) // mass > budget -> rare-postings path
      over.count()
      assert(over.queryExecution.executedPlan.toString.contains("array_intersect"))
      assert(at.exceptAll(over).isEmpty && over.exceptAll(at).isEmpty)
    }
  }

  test("multimodal curation pipeline matches an independent plain-Scala reference") {
    import spark.implicits._
    graft.CacheScope.scoped {
      val frame = "0123456789abcdef" * 4 // one full 64-byte frame
      val corpus = Seq(
        1L -> (frame + frame + "tail-one"),   // frames 0,1 dup of doc 2's
        2L -> (frame + "another-tail-padding-to-pass-the-gate-" + frame),
        3L -> ("unique-" * 12),               // no cross-media frame
        4L -> "short"                         // fails the 64-byte gate
      )
      val out = graft.multimodal.Multimodal.curationPipeline(
          corpus.toDF("doc_id", "text").withColumn("source", lit("fixture")),
          frameBytes = 64, minBytes = 64L, maxDupFrac = 0.5)
        .select("media_id", "n_bytes", "n_frames", "n_dup_frames", "keep")
        .as[(Long, Long, Long, Long, Boolean)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

      // independent reference: plain Scala over the same strings
      val gated = corpus.filter(_._2.length >= 64)
      val frames = gated.flatMap { case (id, t) =>
        t.getBytes("UTF-8").grouped(64).map(b => (id, new String(b, "UTF-8"))) }
      val dupSet = frames.groupBy(_._2).filter(_._2.map(_._1).distinct.size > 1)
        .keySet
      val want = gated.map { case (id, t) =>
        val mine = frames.filter(_._1 == id)
        val nd = mine.count(f => dupSet(f._2)).toLong
        id -> ((t.length.toLong, mine.size.toLong, nd,
          nd.toDouble / mine.size < 0.5))
      }.toMap

      assert(!out.contains(4L), "sub-gate media must be filtered out")
      assert(out === want)
      assert(out(1L)._3 >= 2L, "doc 1 shares two frames with doc 2")
      assert(out(3L)._3 === 0L)
    }
  }

  test("capped prefix pairs: subset of exact, equal under a slack budget, values exact") {
    graft.CacheScope.scoped {
      val sh = Dedup.shingles(docs)
      val exact = Dedup.prefixJaccardPairs(sh, threshold = 0.5)
      // a slack budget must not change the pair set at all
      val slack = Dedup.prefixJaccardPairs(sh, threshold = 0.5,
        pairBudgetPerDoc = Some(1000000000L))
      assert(exact.exceptAll(slack).isEmpty && slack.exceptAll(exact).isEmpty)
      // a tight budget bounds recall but must never invent a pair or
      // change a surviving pair's exact (n_common, jaccard) values
      val tight = Dedup.prefixJaccardPairs(sh, threshold = 0.5,
        pairBudgetPerDoc = Some(1L))
      assert(tight.exceptAll(exact).isEmpty,
        "capped candidates must be a subset of the exact pair set")
      assert(exact.count() > 0)
    }
  }

  test("bm25 excludeSelf=false keeps the qid/doc_id-colliding candidate") {
    import spark.implicits._
    graft.CacheScope.scoped {
      // doc 1 contains a term no other doc has: with excludeSelf off it
      // must surface for its own query (and at the top — it matches all
      // four terms and is shorter than doc 2)
      val tiny = Seq(
        (1L, "alpha beta gamma unique1"),
        (2L, "alpha beta gamma delta extra words here"),
        (3L, "zeta eta theta iota")
      ).toDF("doc_id", "text")
      val queries = tiny.filter(col("doc_id") === 1L)
        .select(col("doc_id").as("qid"),
          explode(graft.text.TextAnalysis.tokens).as("tok")).distinct()
      val loo = graft.text.TextAnalysis.bm25TopK(tiny, queries, k = 5)
      val all = graft.text.TextAnalysis.bm25TopK(tiny, queries, k = 5,
        excludeSelf = false)
      assert(loo.filter(col("qid") === col("doc_id")).count() === 0,
        "leave-one-out must drop self-hits")
      assert(all.filter(col("qid") === col("doc_id") && col("rank") === 1)
        .count() === 1, "self-hit must rank first with excludeSelf off")
      // the non-self candidate set is identical across the two modes
      assert(all.filter(col("qid") =!= col("doc_id")).select("qid", "doc_id")
        .exceptAll(loo.select("qid", "doc_id")).isEmpty)
    }
  }
}
