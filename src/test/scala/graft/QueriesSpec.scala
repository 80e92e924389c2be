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
    // only nested-output queries may omit the oracle (each is pinned to an
    // oracle-checked flat twin: q_flagship_flat / q_outbound_flat / the
    // flatten-equality test below)
    assert(noOracle.subsetOf(Set("q_doc_assembly_nested", "q_flagship_pipeline",
      "q_outbound_push")))
  }

  test("nested doc assembly flattens to exactly the flat twin") {
    import org.apache.spark.sql.functions.col
    val nested = SparkEntry.queries("q_doc_assembly_nested")(spark, sf)
    // independent flattening of the registered nested output — a drift in
    // either registration (input frame, struct layout, null gating) breaks
    // the row-for-row equality with the oracle-checked flat query
    val reFlattened = nested.select(
      col("leadid"),
      col("administration.channel").as("admin_channel"),
      col("administration.createdDate").as("created_date"),
      col("customerDetails.segment").as("cust_segment"),
      col("purchaseDetails.totalPrice").as("total_price"),
      col("enrollmentDetails.interests").getItem(0).getField("questionId")
        .as("q0_id"),
      col("enrollmentDetails.interests").getItem(1).getField("response")
        .getItem(1).as("q1_resp2"),
      col("enrollmentDetails").isNull.as("enrollment_null"))
    val flat = SparkEntry.queries("q_doc_assembly_flat")(spark, sf)
    assert(reFlattened.count() == flat.count())
    assert(reFlattened.exceptAll(flat).isEmpty, "nested ⊄ flat")
    assert(flat.exceptAll(reFlattened).isEmpty, "flat ⊄ nested")
  }

  test("entry returns rows (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
