package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

class Round8Spec extends SparkSuite {

  test("paged-JSON validation + union is ONE distributed job: " +
      "single page scan, per-page window echo check, no driver loop") {
    val df = SparkEntry.queries("q_s7_json_paged")(spark, sf)
    df.count()
    val p = df.queryExecution.executedPlan.toString
    // one partition-discovered scan over ALL pages — the r7 form read
    // each page's directory separately and unioned N relations
    val scans = "FileScan json".r.findAllIn(p).length
    assert(scans == 1, s"expected 1 json scan, got $scans:\n${p.take(1500)}")
    assert(!p.contains("Union"), p.take(1500))
    // the echo check is a per-page window aggregate, not a collect()
    assert(p.contains("Window"), p.take(1500))
  }

  test("simhash top-m: emission bounded at m per document, pairs drawn " +
      "from the unbounded banded set") {
    import graft.text.Dedup
    val sim = graft.CacheScope.persist(
      Dedup.simhash(Tables.load(spark, sf, "documents")))
    val topm = graft.CacheScope.persist(Dedup.simhashTopM(sim, 6, 3))
    assert(topm.groupBy(col("doc_id")).count()
      .filter(col("count") > 3).count() == 0,
      "a document exceeded its neighbor budget")
    val unbounded = Dedup.simhashPairs(sim, 6)
    val sym = unbounded
      .select(col("da").as("doc_id"), col("db").as("nb"))
      .unionByName(unbounded
        .select(col("db").as("doc_id"), col("da").as("nb")))
    assert(topm.select(col("doc_id"), col("nb")).except(sym).count() == 0,
      "top-m emitted a pair outside the unbounded candidate set")
    assert(topm.count() > 0, "fixture produced no top-m pairs")
  }

  test("pretrain-full wiring is non-vacuous: the exact-join stages drop " +
      "documents the plain pipeline keeps") {
    val plain = SparkEntry.queries("q_pretrain_pipeline")(spark, sf).count()
    val full = SparkEntry.queries("q_pretrain_full")(spark, sf).count()
    // containment + repeated-span removal must bite on the fixture —
    // otherwise a disconnected stage would be hash-undetectable
    assert(full < plain,
      s"expected the exact-join stages to remove docs: full=$full plain=$plain")
    assert(full > 0, "composed pipeline emptied the corpus")
  }

  test("paged-JSON drop semantics survive the rewrite: lying page absent, " +
      "honest pages complete") {
    val rows = SparkEntry.queries("q_s7_json_paged")(spark, sf)
      .select(col("page_cursor")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(!rows.contains(3L), "page 3 echoes -1 and must be dropped")
    assert(!rows.contains(-1L), "the lying echo value must not survive")
    val expected = Tables.load(spark, sf, "customer")
      .select(col("c_nationkey").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSet - 3L
    assert(rows == expected, s"surviving pages $rows != expected $expected")
  }
}
