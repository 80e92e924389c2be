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

  test("oracle map covers EVERY query — zero no_oracle rows") {
    val names = Registry.all.map(_.name).toSet
    assert(SparkEntry.queries.keySet == names)
    // nested-output queries materialize the nested parquet and register
    // the flattened round-trip, so nothing is rows-only any more
    assert((names -- SparkEntry.oracleSql.keySet).isEmpty)
  }

  test("materialized nested doc round-trip equals the in-plan flat twin") {
    // q_doc_assembly_nested now writes the nested parquet and flattens
    // the round-tripped bytes; a drift anywhere (input frame, struct
    // layout, null gating, parquet round-trip) breaks row-for-row
    // equality with the never-written flat projection
    val roundTripped = SparkEntry.queries("q_doc_assembly_nested")(spark, sf)
    val flat = SparkEntry.queries("q_doc_assembly_flat")(spark, sf)
    assert(roundTripped.count() == flat.count())
    assert(roundTripped.exceptAll(flat).isEmpty, "round-trip ⊄ flat")
    assert(flat.exceptAll(roundTripped).isEmpty, "flat ⊄ round-trip")
  }

  test("entry returns rows (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
