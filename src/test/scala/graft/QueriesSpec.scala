package graft

import graft.queries.Registry

/** Every registered query runs and returns rows at sf0.001; oracle SQL
  * exists for everything SQL-expressible. */
class QueriesSpec extends SparkSuite {

  // Queries where an empty result at the smallest SF is legitimate.
  private val mayBeEmpty = Set("q_dedup_ngram_jaccard", "q_emb_similar_pairs",
    "q_dedup_minhash_lsh", "q_dedup_simhash_pairs")

  Registry.all.foreach { q =>
    test(s"${q.name} runs at sf0.001") {
      val n = q.fn(spark, sf).count()
      if (mayBeEmpty(q.name)) assert(n >= 0) else assert(n > 0)
    }
  }

  test("oracle map covers every SQL-expressible query") {
    val names = Registry.all.map(_.name).toSet
    assert(SparkEntry.queries.keySet == names)
    val noOracle = names -- SparkEntry.oracleSql.keySet
    // only nested-output / flagship queries may omit the oracle
    assert(noOracle.subsetOf(Set("q_doc_assembly_nested", "q_flagship_pipeline",
      "q_outbound_push", "q_agg_approx_sketches")))
  }

  test("entry returns rows (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
