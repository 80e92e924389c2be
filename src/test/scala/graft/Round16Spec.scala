package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}

import graft.text.Dedup

/** Round-16 seams: the two-phase bucketed verify (32-bit screen +
  * 64-bit confirm — the r15 verdict's #4, shrinking the wide
  * candidate×array intermediate) and the `intersect_count_i32`
  * screen expression's soundness properties.
  */
class Round16Spec extends SparkSuite {

  private def docs = sources.Tables.load(spark, sf, "documents")

  private def staticPlan(build: => DataFrame): SparkPlan = {
    val keys = Seq("spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
    val prev = keys.map(k => k -> spark.conf.get(k))
    try {
      spark.conf.set(keys(0), "false")
      spark.conf.set(keys(1), "-1")
      val df = build
      df.count()
      df.queryExecution.executedPlan
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("intersect_count_i32 equals size(array_intersect) on sorted distinct int arrays") {
    graft.functions.SetExpressions.register(spark)
    val gen = spark.range(0, 500)
      .selectExpr(
        """sort_array(array_distinct(transform(
             sequence(1, cast(pmod(xxhash64(id, 1), 40) as int) + 1),
             i -> cast(xxhash64(id, i) % 50 as int)))) as ha""",
        """sort_array(array_distinct(transform(
             sequence(1, cast(pmod(xxhash64(id, 2), 40) as int) + 1),
             i -> cast(xxhash64(id + 7, i) % 50 as int)))) as hb""")
      .unionByName(spark.sql(
        """SELECT * FROM VALUES
             (CAST(array() AS ARRAY<INT>), CAST(array() AS ARRAY<INT>)),
             (CAST(array() AS ARRAY<INT>), array(1, 2)),
             (array(1, 3), array(2, 4)),
             (array(1, 2, 3), array(1, 2, 3)),
             (CAST(NULL AS ARRAY<INT>), array(1)) AS t(ha, hb)"""))
    val bad = gen.selectExpr(
        "intersect_count_i32(ha, hb) as fast",
        "size(array_intersect(ha, hb)) as ref")
      .filter(!(col("fast") <=> col("ref").cast("long")))
      .count()
    assert(bad == 0)
  }

  test("intersect_count_i32 counts min-multiplicity on multiset (duplicated) inputs") {
    graft.functions.SetExpressions.register(spark)
    // duplicates arise when two 64-bit hashes share high bits; the
    // merge walk must count min(ma, mb) per value — array_intersect
    // (set semantics) would read 2 here, the screen needs 4
    val r = spark.sql(
      """SELECT intersect_count_i32(array(1, 1, 1, 5, 5, 9),
                                    array(1, 1, 5, 5, 5, 7)) AS c""")
      .head().getLong(0)
    assert(r == 4L)
  }

  test("intersect_count_i32 rejects non-int-array inputs at analysis") {
    graft.functions.SetExpressions.register(spark)
    import spark.implicits._
    val df = Seq((Seq(1L), Seq(2L))).toDF("a", "b")
    intercept[Exception] {
      df.selectExpr("intersect_count_i32(a, b)").collect()
    }
  }

  test("32-bit screen soundness: truncation preserves sort order and over-counts the 64-bit intersection") {
    graft.functions.SetExpressions.register(spark)
    // random sorted-distinct 64-bit arrays with FORCED high-bit
    // collisions (values drawn from few 2^32 blocks so truncation
    // duplicates actually occur), plus shared elements
    val gen = spark.range(0, 2000).selectExpr(
      """sort_array(array_distinct(transform(
           sequence(1, cast(pmod(xxhash64(id, 1), 30) as int) + 1),
           i -> (xxhash64(id, i) % 4) * 4294967296L + (xxhash64(id, i, 3) % 8)))) as ha""",
      """sort_array(array_distinct(transform(
           sequence(1, cast(pmod(xxhash64(id, 2), 30) as int) + 1),
           i -> (xxhash64(id + 7, i) % 4) * 4294967296L + (xxhash64(id + 7, i, 3) % 8)))) as hb""")
    val checked = gen.selectExpr(
        "transform(ha, x -> cast(shiftright(x, 32) as int)) as ha32",
        "transform(hb, x -> cast(shiftright(x, 32) as int)) as hb32",
        "intersect_count_i64(ha, hb) as c64")
      .selectExpr(
        // order preservation: arithmetic shiftright of a sorted long
        // array is sorted as-is — no re-sort anywhere in the screen
        "ha32 = sort_array(ha32) as ha_sorted",
        "hb32 = sort_array(hb32) as hb_sorted",
        "intersect_count_i32(ha32, hb32) >= c64 as over_counts")
    assert(checked.filter(!col("ha_sorted") || !col("hb_sorted") ||
      !col("over_counts")).count() == 0)
    // vacuity guard: the generator must actually produce truncation
    // duplicates and strict over-counts somewhere
    val strict = gen.selectExpr(
        """intersect_count_i32(transform(ha, x -> cast(shiftright(x, 32) as int)),
                               transform(hb, x -> cast(shiftright(x, 32) as int))) >
           intersect_count_i64(ha, hb) as s""")
      .filter(col("s")).count()
    assert(strict > 0, "generator produced no high-bit collisions — the test is vacuous")
  }

  test("bucketed verify reads are column-pruned: screen scans skip hs, confirm scans skip hs32") {
    CacheScope.scoped {
      try {
        spark.conf.set(Dedup.VerifyBroadcastBytesKey, "0")
        val plan = staticPlan(
          Dedup.containmentPairsCapped(Dedup.shingles(docs), threshold = 0.5))
        val stageScans = plan.collect {
          case f: FileSourceScanExec if f.bucketedScan => f.requiredSchema.fieldNames.toSet
        }
        // four scans of the one staged table: 2 screen (hs32 + n, no
        // hs — the 8 B/element column never enters the wide joins) and
        // 2 confirm (hs, no hs32)
        assert(stageScans.size == 4, s"expected 4 bucketed scans, got $stageScans")
        val screens = stageScans.filter(_.contains("hs32"))
        val confirms = stageScans.filter(_.contains("hs"))
        assert(screens.size == 2 && screens.forall(!_.contains("hs")),
          s"screen scans must not read the 64-bit column: $stageScans")
        assert(confirms.size == 2 && confirms.forall(!_.contains("hs32")),
          s"confirm scans must not read the 32-bit column: $stageScans")
      } finally spark.conf.unset(Dedup.VerifyBroadcastBytesKey)
    }
  }

  test("prefix-filtered jaccard + prefix containment: bucketed two-phase output identical to broadcast") {
    CacheScope.scoped {
      val shingles = Dedup.shingles(docs)
      val jB = Dedup.prefixJaccardPairs(shingles, 0.5).collect().toSet
      val cB = Dedup.prefixContainmentPairs(shingles, 0.5).collect().toSet
      try {
        spark.conf.set(Dedup.VerifyBroadcastBytesKey, "0")
        assert(Dedup.prefixJaccardPairs(shingles, 0.5).collect().toSet == jB)
        assert(Dedup.prefixContainmentPairs(shingles, 0.5).collect().toSet == cB)
      } finally spark.conf.unset(Dedup.VerifyBroadcastBytesKey)
      assert(jB.nonEmpty && cB.nonEmpty)
    }
  }

  test("ngram jaccard rare-postings path: bucketed two-phase output identical to broadcast") {
    CacheScope.scoped {
      // directPairBudget = 0 pins the rare-postings (verify-stage) path
      val shingles = Dedup.shingles(docs)
      val viaB = Dedup.jaccardPairs(shingles, dfCap = 10, threshold = 0.5,
        directPairBudget = 0L).collect().toSet
      try {
        spark.conf.set(Dedup.VerifyBroadcastBytesKey, "0")
        val viaS = Dedup.jaccardPairs(shingles, dfCap = 10, threshold = 0.5,
          directPairBudget = 0L).collect().toSet
        assert(viaS == viaB)
      } finally spark.conf.unset(Dedup.VerifyBroadcastBytesKey)
      assert(viaB.nonEmpty)
    }
  }
}
