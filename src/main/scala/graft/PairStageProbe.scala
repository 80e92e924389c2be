package graft

import org.apache.spark.sql.functions._

/** Stage-attribution probe for the capped containment pipeline — times
  * each stage of the `containmentPairsCapped` dataflow separately so a
  * superlinear WALL reading on a leg pair can be pinned to the stage
  * that produced it (round 12: sf10x -> sf20x wall grew 4.6x while
  * every work witness — output pairs, candidate count, generation
  * mass, a single-threaded DuckDB run of the same dataflow — grew
  * ~2x; heap +56% and 5x shuffle partitions moved it < 10%, so the
  * residual needed per-stage numbers, not more guesses).
  *
  * Round 15: mirrors the HASHED dataflow (postings ship as xxhash64
  * fingerprints, one repartition by h reused downstream) and times
  * BOTH verify dispatches — the broadcast form and the
  * bucketed-stage + shuffled-hash form the beyond-fence fallback
  * runs — so the dispatch gap itself is a measured number.
  *
  * Stages: (1) hashed postings + persist; (2) df + histogram cap;
  * (3) capped candidate self-join (distinct count); (4) hash-set
  * build; (5) verify via bucketed SHJ; (6) verify via broadcast.
  * Usage: `runMain graft.PairStageProbe <dir> [budget]`.
  */
object PairStageProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "target/sf10x_docs"
    val budget = if (args.length > 1) args(1).toLong else 16L
    val spark = GraftSession.local(GraftSession.envCpus)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"""{"probe_stage":"$name","dir":"$dir","secs":${(System.nanoTime() - t0) / 1e9}%.3f}""")
      r
    }
    CacheScope.scoped {
      val docs = sources.Tables.load(spark, dir, "documents")
      // mirrors Dedup.hashedPostings + the production repartition-once
      val hp = CacheScope.persist(
        text.Dedup.shingles(docs)
          .select(col("doc_id"), xxhash64(col("s")).as("h"))
          .repartition(col("h")))
      t("hashed_postings_persist") { hp.count() }
      val dfreq = CacheScope.persist(
        hp.groupBy(col("h")).agg(count(lit(1)).as("df")))
      t("dfreq") { dfreq.count() }
      val W = org.apache.spark.sql.expressions.Window
      val nd = hp.agg(countDistinct(col("doc_id")).as("ndocs"))
      val cap = dfreq.groupBy(col("df")).agg(count(lit(1)).as("c"))
        .withColumn("cc", sum(col("c")).over(W.orderBy(col("df"))
          .rowsBetween(W.unboundedPreceding, W.currentRow)))
        .withColumn("cm", sum(col("c") * col("df") * (col("df") - 1) / 2)
          .over(W.orderBy(col("df"))
            .rowsBetween(W.unboundedPreceding, W.currentRow)))
        .withColumn("nsh", sum(col("c")).over(W.orderBy(col("df"))
          .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)))
        .crossJoin(broadcast(nd))
        .agg(
          min(when(col("cc") >= ceil(lit(0.99) * col("nsh")), col("df")))
            .as("qcap"),
          max(when(col("cm") <= lit(budget) * col("ndocs"), col("df")))
            .as("mcap"))
        .select(greatest(lit(10L),
          least(col("qcap"), coalesce(col("mcap"), lit(10L)))).as("cap"))
      t("cap_scalar") { cap.count() }
      val a = hp.join(dfreq, "h").crossJoin(broadcast(cap))
        .filter(col("df") <= col("cap")).alias("a")
      val cands = CacheScope.persist(
        a.join(hp.alias("b"),
          col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
        .distinct())
      val nCands = t("candidates_distinct") { cands.count() }
      println(s"""{"probe_info":"n_candidates","dir":"$dir","value":$nCands}""")
      // mirrors Dedup.docHashSets over the hashed postings
      val hsets = CacheScope.persist(
        hp.groupBy(col("doc_id"))
          .agg(sort_array(collect_list(col("h"))).as("hs"),
            count(lit(1)).as("n")))
      t("hashsets_persist") { hsets.count() }
      graft.functions.SetExpressions.register(spark)
      def verifyWith(hs: org.apache.spark.sql.DataFrame): Long =
        cands
          .join(hs.select(col("doc_id").as("da"), col("hs").as("ha"),
            col("n").as("na")), Seq("da"))
          .join(hs.select(col("doc_id").as("db"), col("hs").as("hb"),
            col("n").as("nb")), Seq("db"))
          .withColumn("n_common", expr("intersect_count_i64(ha, hb)"))
          .filter(col("n_common").cast("double") /
            least(col("na"), col("nb")) >= 0.5)
          .count()
      // the beyond-fence dispatch, mirroring Dedup.verifiedCommon's
      // round-16 two-phase form: ONE staged table with the 64-bit
      // arrays, their 32-bit truncations and n; a 32-bit SCREEN over
      // the wide candidate joins; a 64-bit CONFIRM on survivors.
      // The stage write is INSIDE the timed window, as in production.
      val n = t("verify_bucketed_shj") {
        val staged = graft.sources.Bucketing.stageBucketed(
            hsets.withColumn("hs32",
              expr("transform(hs, x -> cast(shiftright(x, 32) as int))")),
            "probe_vhs",
            spark.sessionState.conf.numShufflePartitions, Seq("doc_id"))
          .hint("shuffle_hash")
        val screened = cands
          .join(staged.select(col("doc_id").as("da"), col("hs32").as("ha32"),
            col("n").as("na")), Seq("da"))
          .join(staged.select(col("doc_id").as("db"), col("hs32").as("hb32"),
            col("n").as("nb")), Seq("db"))
          .withColumn("c32", expr("intersect_count_i32(ha32, hb32)"))
          .filter(col("c32").cast("double") /
            least(col("na"), col("nb")) >= 0.5)
          .select(col("da"), col("db"), col("na"), col("nb"))
        screened
          .join(staged.select(col("doc_id").as("da"), col("hs").as("ha")),
            Seq("da"))
          .join(staged.select(col("doc_id").as("db"), col("hs").as("hb")),
            Seq("db"))
          .withColumn("n_common", expr("intersect_count_i64(ha, hb)"))
          .filter(col("n_common").cast("double") /
            least(col("na"), col("nb")) >= 0.5)
          .count()
      }
      println(s"""{"probe_info":"n_pairs","dir":"$dir","value":$n}""")
      // the below-fence dispatch: both verify joins map-only BHJs
      val n2 = t("verify_broadcast") { verifyWith(broadcast(hsets)) }
      println(s"""{"probe_info":"n_pairs_broadcast","dir":"$dir","value":$n2}""")
    }
    spark.stop()
  }
}
