package graft

import org.apache.spark.sql.functions._

import graft.text.Dedup

/** Round-10 guards: the adaptive Jaccard dispatch must keep both paths
  * result-identical, and the streaming sessionizer's micros conversion
  * must be exact for pre-1970 instants.
  */
class Round10Spec extends SparkSuite {

  private def docs = graft.sources.Tables.load(spark, sf, "documents")

  test("jaccard adaptive dispatch: direct and rare-postings paths emit the identical pair set") {
    graft.CacheScope.scoped {
      val sh = Dedup.shingles(docs)
      // budget 0 forces the rare-postings path; MaxValue forces direct
      val direct = Dedup.jaccardPairs(sh, dfCap = 10, threshold = 0.5,
        directPairBudget = Long.MaxValue)
      val rare = Dedup.jaccardPairs(sh, dfCap = 10, threshold = 0.5,
        directPairBudget = 0L)
      assert(direct.count() > 0, "fixture must contain near-dup pairs")
      assert(direct.exceptAll(rare).isEmpty && rare.exceptAll(direct).isEmpty,
        "the two dispatch paths must agree row-for-row")
    }
  }

  test("jaccard dispatch picks the direct path on a small corpus, rare-postings when mass dominates") {
    graft.CacheScope.scoped {
      val sh = Dedup.shingles(docs)
      // sf0.001's total pair mass is far under the default budget
      val auto = Dedup.jaccardPairs(sh, dfCap = 10, threshold = 0.5)
      auto.count()
      val autoPlan = auto.queryExecution.executedPlan.toString
      assert(!autoPlan.contains("array_intersect"),
        "small corpus must use the single-pass direct join (no hashed-set verify)")
      val forced = Dedup.jaccardPairs(sh, dfCap = 10, threshold = 0.5,
        directPairBudget = 0L)
      forced.count()
      val forcedPlan = forced.queryExecution.executedPlan.toString
      assert(forcedPlan.contains("array_intersect"),
        "above-budget corpora must verify candidates against hashed shingle sets in-row")
    }
  }

  test("connected components: union-find and distributed min-label paths agree row-for-row") {
    graft.CacheScope.scoped {
      import spark.implicits._
      // two chains, one triangle, a self-loop node, an isolated pair —
      // covers transitive closure and the edge-list corner cases
      val pairs = Seq(
        (1L, 2L), (2L, 3L), (3L, 4L),   // chain -> component 1
        (10L, 11L), (11L, 12L), (10L, 12L), // triangle -> 10
        (20L, 20L),                      // self-loop -> singleton 20
        (30L, 31L)                       // pair -> 30
      ).toDF("da", "db")
      val small = Dedup.connectedComponents(pairs)
      val dist = Dedup.connectedComponents(pairs, smallGraphMaxEdges = 0L)
      assert(small.count() === 10)
      assert(small.exceptAll(dist).isEmpty && dist.exceptAll(small).isEmpty,
        "the two CC paths must emit the identical (doc_id, component) set")
      assert(small.where(col("component") === 1L).count() === 4)
    }
  }

  test("connected components dispatch: small graphs collect, big path still iterates") {
    graft.CacheScope.scoped {
      val cand = Dedup.lshCandidates(Dedup.minhashSignatures(
        Dedup.shingles(docs))).select(col("da"), col("db"))
      // the sf0.001 candidate graph is far below the 2^22 edge bound —
      // the real queries take the union-find leg at test scale
      val auto = Dedup.connectedComponents(cand)
      val forced = Dedup.connectedComponents(cand, smallGraphMaxEdges = 0L)
      assert(auto.exceptAll(forced).isEmpty && forced.exceptAll(auto).isEmpty,
        "dispatch must not change the cluster assignment on a real candidate graph")
    }
  }

  test("sessionizer micros conversion is exact on both sides of the epoch") {
    import graft.streaming.Sessionize.{fromMicros, micros}
    // -0.5 s: truncating division would yield +500000 µs
    val preEpoch = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(-1, 500000000))
    assert(micros(preEpoch) === -500000L)
    for (us <- Seq(-1500000L, -500000L, -1L, 0L, 1L, 999999L, 1500000L))
      assert(micros(fromMicros(us)) === us, s"round-trip of $us µs")
  }
}
