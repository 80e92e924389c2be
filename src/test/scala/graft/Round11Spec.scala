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
      assert(!at.queryExecution.executedPlan.toString.contains("intersect_count_i64"))
      val over = Dedup.jaccardPairs(sh, dfCap = 10, threshold = 0.0,
        directPairBudget = 2L) // mass > budget -> rare-postings path
      over.count()
      assert(over.queryExecution.executedPlan.toString.contains("intersect_count_i64"))
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

  test("semantic dedup: constructed near-dups drop to the min-id keeper") {
    import spark.implicits._
    graft.CacheScope.scoped {
      // two well-separated directions; ids 0/2/4 are near-identical
      // copies of one, 1/3 of the other (k-means seeds from ids 0, 1)
      val emb = Seq(
        (0L, Array(1.0f, 0.01f)), (2L, Array(0.99f, 0.012f)),
        (4L, Array(1.01f, 0.008f)),
        (1L, Array(0.01f, 1.0f)), (3L, Array(-0.01f, 0.99f))
      ).toDF("vec_id", "embedding")
      val out = graft.similarity.SemDedup
        .semDedup(emb, k = 2, iters = 2, tau = 0.999)
        .as[(Long, Long, Option[Long], Long, Boolean)].collect()
        .map(r => r._1 -> ((r._3, r._4, r._5))).toMap
      assert(out.keySet === Set(0L, 1L, 2L, 3L, 4L))
      assert(out(0L) === ((None, 0L, true)))
      assert(out(1L) === ((None, 0L, true)))
      assert(out(2L) === ((Some(0L), 1L, false)))
      assert(out(3L) === ((Some(1L), 1L, false)))
      // id 4 is dominated by BOTH 0 and 2; keeper is the min id
      assert(out(4L) === ((Some(0L), 2L, false)))
    }
  }

  test("dsir weights match an independent plain-Scala reference") {
    import spark.implicits._
    graft.CacheScope.scoped {
      val corpus = Seq(
        (1L, "tgt", "alpha beta alpha gamma"),
        (2L, "tgt", "alpha beta delta"),
        (3L, "raw", "epsilon zeta eta theta"),
        (4L, "raw", "alpha epsilon epsilon"),
        (5L, "raw", "beta beta gamma iota kappa")
      ).toDF("doc_id", "source", "text")
      val out = graft.text.Curation.dsirWeights(
          corpus, col("source") === "tgt", buckets = 64)
        .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3)))
        .toMap

      // independent reference: plain Scala over the same strings
      def b64(tok: String): Long = {
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
        java.lang.Long.parseLong(md.take(15), 16) % 64
      }
      val docs = Seq(
        1L -> ("tgt", "alpha beta alpha gamma"),
        2L -> ("tgt", "alpha beta delta"),
        3L -> ("raw", "epsilon zeta eta theta"),
        4L -> ("raw", "alpha epsilon epsilon"),
        5L -> ("raw", "beta beta gamma iota kappa"))
      val perDoc = docs.map { case (id, (_, t)) =>
        id -> t.trim.toLowerCase.split("\\s+").toSeq.map(b64)
          .groupBy(identity).map { case (b, xs) => b -> xs.size.toLong } }
        .toMap
      val ct = collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      val cr = collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      docs.foreach { case (id, (src, _)) =>
        perDoc(id).foreach { case (b, c) =>
          cr(b) += c; if (src == "tgt") ct(b) += c } }
      val (tt, tr) = (ct.values.sum, cr.values.sum)
      def rnd6(x: Double) = BigDecimal(x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      val llr = cr.keys.map(b => b -> rnd6(
        math.log((ct(b) + 1.0) / (tt + 64)) -
        math.log((cr(b) + 1.0) / (tr + 64))).toDouble).toMap
      val want = perDoc.map { case (id, cs) =>
        id -> ((cs.values.sum,
          cs.map { case (b, c) => rnd6(c * llr(b)) }.sum.toDouble)) }
      assert(out === want)
      // target docs must look more target-like than pure-raw-vocab docs
      assert(out(1L)._2 > out(3L)._2)
    }
  }

  test("temperature mix: alpha=1 is the raw mixture, alpha<1 flattens toward rare sources") {
    import spark.implicits._
    graft.CacheScope.scoped {
      val corpus = Seq(
        (1L, "big", 900L), (2L, "big", 600L), (3L, "small", 80L),
        (4L, "small", 20L), (5L, "mid", 400L)
      ).toDF("doc_id", "source", "n_toks")
      def mix(a: Double) = graft.text.Curation.temperatureMix(
          corpus, col("source"), col("n_toks"), alpha = a)
        .as[(String, Long, Double, Double, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
      val raw = mix(1.0)
      // alpha = 1: weight == p_raw (to the rounding grid), epochs == 1
      raw.values.foreach { case (_, p, w, ep) =>
        assert(math.abs(w - p) <= 2e-6 && math.abs(ep - 1.0) <= 1e-4) }
      val flat = mix(0.5)
      assert(flat("big")._3 < raw("big")._3,
        "tempering must down-weight the dominant source")
      assert(flat("small")._3 > raw("small")._3,
        "tempering must up-weight the rare source")
      assert(flat("small")._4 > 1.0 && flat("big")._4 < 1.0)
      // weights still normalize
      assert(math.abs(flat.values.map(_._3).sum - 1.0) < 1e-4)
      assert(raw("big")._1 === 1500L)
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
