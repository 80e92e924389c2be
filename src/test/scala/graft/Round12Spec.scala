package graft

import org.apache.spark.sql.functions._

import graft.similarity.{Kmeans, Knn}
import graft.text.{Curation, TextAnalysis}

/** Round-12 guards: the two-level assignment's exactness contract
  * (output ≡ flat assign at a k large enough to take the pruned path,
  * and flat dispatch below the boundary), the PMI vocabulary cap's
  * bite and bound, the temperature-mix zero-stratum guard, and the
  * Outbound shared-stage path injectivity.
  */
class Round12Spec extends SparkSuite {

  private def emb = graft.sources.Tables.load(spark, sf, "embeddings")

  test("assignTwoLevel at k=100 equals flat assign exactly (ties included)") {
    graft.CacheScope.scoped {
      val p = graft.CacheScope.persist(Knn.prepared(emb))
      val cents = graft.CacheScope.persist(
        Kmeans.fit(emb, k = 100, iters = 2).select(col("cid"), col("cv")))
      assert(cents.count() > 64, "fixture must exercise the pruned path")
      val flat = Kmeans.assign(p, cents)
      // workBudget = 0 forces the pruned path (the fixture's n*k is
      // below the measured adaptive crossover)
      val two = Kmeans.assignTwoLevel(p, cents, workBudget = 0.0)
      assert(two.exceptAll(flat).isEmpty && flat.exceptAll(two).isEmpty)
    }
  }

  test("assignTwoLevel prunes: per-vector exact-distance work < n*k") {
    graft.CacheScope.scoped {
      val p = graft.CacheScope.persist(Knn.prepared(emb))
      val n = p.count()
      val cents = graft.CacheScope.persist(
        Kmeans.fit(emb, k = 100, iters = 2).select(col("cid"), col("cv")))
      val k = cents.count()
      // reproduce the survivor set the operator computes and check the
      // candidate mass it feeds the exact stage is genuinely sub-n*k
      val g = math.ceil(math.sqrt(k.toDouble)).toInt
      val ranked = cents.withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("cid")))
        .cast("long") - 1)
      val sup = Kmeans.fit(ranked.select(col("rk").as("vec_id"),
          col("cv").as("embedding")), g, iters = 2)
        .select(col("cid").as("gid"), col("cv").as("sv"))
      val c2g = Kmeans.assign(
        ranked.select(col("rk").as("vec_id"), col("cv").as("e")),
        sup.select(col("gid").as("cid"), col("sv").as("cv")))
        .select(col("vec_id").as("rk"), col("cid").as("gid"))
      val cg = ranked.join(c2g, "rk").groupBy(col("gid"))
        .agg(count(lit(1)).as("gsz"))
      val l2 = (a: String, b: String) =>
        expr(s"dot_f64($a, $a) - 2 * dot_f64($a, $b) + dot_f64($b, $b)")
      val radii = ranked.join(c2g, "rk").join(broadcast(sup), "gid")
        .select(col("gid"), sqrt(greatest(l2("cv", "sv"), lit(0.0))).as("d"))
        .groupBy(col("gid")).agg(max(col("d")).as("rg"))
      val vg = p.crossJoin(broadcast(sup.join(radii, "gid")))
        .select(col("vec_id"), col("gid"),
          sqrt(greatest(l2("e", "sv"), lit(0.0))).as("dvs"), col("rg"))
      val m = vg.groupBy(col("vec_id")).agg(min(col("dvs") + col("rg")).as("m"))
      val candMass = vg.join(m, "vec_id")
        .filter(col("dvs") - col("rg") <= col("m") +
          lit(1e-9) * (col("dvs") + col("rg") + col("m") + lit(1.0)))
        .join(cg, "gid")
        .agg(sum(col("gsz"))).collect()(0).getLong(0)
      assert(candMass < n * k,
        s"pruned candidate mass $candMass must be < flat n*k = ${n * k}")
    }
  }

  test("assignTwoLevel below the boundary dispatches the flat broadcast pass") {
    graft.CacheScope.scoped {
      val p = graft.CacheScope.persist(Knn.prepared(emb))
      // k = 100 > flatBelow, but the fixture's n*k = 200k is far below
      // the 4e8 work budget: the ADAPTIVE path must also be flat
      val cents = Kmeans.fit(emb, k = 100, iters = 2).select(col("cid"), col("cv"))
      val out = Kmeans.assignTwoLevel(p, cents)
      out.count()
      // the pruned path derives the dvs/rg bound columns; the flat
      // path's plan never mentions them
      val plan = out.queryExecution.executedPlan.toString
      assert(!plan.contains("dvs") && !plan.contains("rg#"),
        "n*k below workBudget must dispatch the flat path " +
          "(no super-distance bound stage)")
    }
  }

  test("pmi topV cap bites on the fixture and bounds kept vocabulary") {
    graft.CacheScope.scoped {
      val docs = graft.sources.Tables.load(spark, sf, "documents")
      val full = TextAnalysis.pmi(docs)
      val capped = TextAnalysis.pmi(docs, topV = Some(16L))
      val fullVocab = full.select(col("ta")).union(full.select(col("tb")))
        .distinct().count()
      val cappedVocab = capped.select(col("ta")).union(capped.select(col("tb")))
        .distinct().count()
      assert(cappedVocab <= 16, s"capped vocab $cappedVocab must be <= 16")
      assert(cappedVocab < fullVocab, "the cap must genuinely bite")
      // capped rows are a subset of full rows (same pmi values where kept)
      assert(capped.exceptAll(full).isEmpty)
    }
  }

  test("temperatureMix zero-token stratum yields epochs 0, not NULL") {
    import spark.implicits._
    graft.CacheScope.scoped {
      val docs = Seq(("a", 10L), ("a", 30L), ("b", 0L))
        .toDF("src", "n_tok")
      val out = Curation.temperatureMix(docs, col("src"), col("n_tok"), 0.7)
        .where(col("stratum") === "b").collect()(0)
      assert(!out.isNullAt(out.fieldIndex("epochs")))
      assert(out.getDouble(out.fieldIndex("epochs")) == 0.0)
      assert(out.getDouble(out.fieldIndex("weight")) == 0.0)
    }
  }

  test("pretrain capped twin: identical output where the cap is slack, no cartesian") {
    graft.CacheScope.scoped {
      val full = queries.Registry.all.find(_.name == "q_pretrain_full").get
      val capped = queries.Registry.all.find(_.name == "q_pretrain_capped").get
      val a = full.fn(spark, sf)
      val b = capped.fn(spark, sf)
      // at sf0.001 the containment-recall gate measures 1.0 (cap 10 >
      // every biting df), so the two compositions must agree row-for-row
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
      b.count()
      val p = b.queryExecution.executedPlan.toString
      // the cap scalar rides a broadcast — a CartesianProduct here would
      // mean the one-row cap frame joined without the hint
      assert(!p.contains("CartesianProduct"), p.take(1200))
    }
  }

  test("pair verify joins are broadcast hash joins at fixture scale") {
    graft.CacheScope.scoped {
      val docs = graft.sources.Tables.load(spark, sf, "documents")
      val out = graft.text.Dedup.containmentPairsCapped(
        graft.text.Dedup.shingles(docs), threshold = 0.9)
      out.count()
      val p = out.queryExecution.executedPlan.toString
      // the hash-set side fits the fenced 1.5 GB estimate here, so both
      // verify joins must be map-only BHJs — a SortMergeJoin of the wide
      // candidate+set intermediate is exactly the spill the round-12
      // probe measured (PairStageProbe; BENCH_SCALING_CAPPED_3RD.json)
      assert(p.contains("BroadcastHashJoin"), p.take(1200))
      assert(!p.contains("SortMergeJoin"), p.take(1200))
    }
  }

  test("distilled gate scorer beats the majority-class base rate") {
    graft.CacheScope.scoped {
      val docs = graft.sources.Tables.load(spark, sf, "documents")
      val out = graft.text.Distill.distillGate(docs,
        TextAnalysis.gopherMetrics(10, 1000, 2.0, 10.0, 0.2, 0.2).last,
        dim = 64, iters = 20, lr = 16.0)
      val r = out.agg(avg(col("label")), avg(col("correct")),
        count(lit(1))).head()
      val base = math.max(r.getDouble(0), 1.0 - r.getDouble(0))
      assert(r.getLong(2) == docs.count(), "one scored row per document")
      // the student must actually LEARN: strictly above always-majority
      // (measured 0.940 vs 0.926 at sf0.001 — DistillProbe)
      assert(r.getDouble(1) > base,
        s"accuracy ${r.getDouble(1)} must beat base rate $base")
    }
  }

  test("Outbound.shared stage paths are injective across colliding dirs") {
    // lossy sanitization alone maps both of these to 'target_sfX'
    assert(Outbound.sharedStagePath("target/sfX") !=
      Outbound.sharedStagePath("target_sfX"))
    // and stays deterministic per dir (memo re-open reads the same path)
    assert(Outbound.sharedStagePath("target/sfX") ==
      Outbound.sharedStagePath("target/sfX"))
  }
}
