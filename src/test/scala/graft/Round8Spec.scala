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

  test("AQE splits the skewed hot-shingle partition in the containment " +
      "probe join") {
    import spark.implicits._
    // the containment probe joins prefix(smaller) against the FULL
    // posting index — the one pair join where a boilerplate shingle
    // cannot be pruned (the larger side can't be prefixed), i.e. the
    // real 100 TB skew risk. Fixture: one shingle shared by 500 docs
    // (the hot posting), 20 tiny docs whose only shingle IS the hot one
    // (so the skewed key also produces matches), 50 unique-shingle docs.
    val hot = (1 to 500).map(i => (i.toLong, s"hot1 hot2 hot3 u${i}a u${i}b"))
    val tiny = (501 to 520).map(i => (i.toLong, "hot1 hot2 hot3"))
    val uniq = (521 to 570).map(i => (i.toLong, s"q${i}a q${i}b q${i}c q${i}d"))
    val docs = (hot ++ tiny ++ uniq).toDF("doc_id", "text")
    val sh = graft.text.Dedup.shingles(docs)
    // thresholds scaled to the fixture (the defaults are sized for
    // hundreds of MB); broadcast disabled so the probe actually plans a
    // shuffled join, as it would at 100 TB where neither side broadcasts
    val confs = Map(
      "spark.sql.shuffle.partitions" -> "64",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "512b",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true")
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val df = graft.text.Dedup.prefixContainmentPairs(sh, 0.9)
      // collect() (not count()) so THIS df's query execution finalizes —
      // the AQE-rewritten plan only exists on the executed plan
      val n = df.collect().length
      assert(n >= 10000, s"skew fixture should emit the tiny-in-hot pairs, got $n")
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        "AQE did not split the skewed posting partition:\n" + p.take(3000))
    } finally prev.foreach { case (k, vOpt) =>
      vOpt.fold(spark.conf.unset(k))(v => spark.conf.set(k, v)) }
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
