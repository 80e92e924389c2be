package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Profile
import graft.sources.Tables
import graft.text.Curation

/** Edge-case tests for the round-6 operators — the properties the
  * sf0.01 oracle gate can't see.
  */
class Round6Spec extends SparkSuite {

  private def docs(rows: (Long, String)*) = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("source", StringType), StructField("n_chars", LongType)))
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map { case (id, t) =>
        Row(id, t, "s", t.length.toLong)
      }: _*), schema)
  }

  test("boilerplate: short docs (<3 tokens) contribute no shingles and are absent") {
    val d = docs((1L, "one two"), (2L, "a b c d"), (3L, "a b c d"))
    val out = Curation.boilerplate(d, dfCap = 2, keepBelow = 0.5)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(!out.contains(1L)) // no shingles → no row, never div-by-zero
    // docs 2 and 3 share every shingle → frac 1.0, dropped at the 0.5 cut
    assert(out(2L).getAs[Double]("boiler_frac") == 1.0)
    assert(!out(2L).getAs[Boolean]("keep"))
  }

  test("boilerplate: unique corpus scores 0 and keeps everything") {
    val d = docs((1L, "p q r s"), (2L, "w x y z"))
    val out = Curation.boilerplate(d, dfCap = 2, keepBelow = 0.5).collect()
    assert(out.length == 2)
    assert(out.forall(_.getAs[Double]("boiler_frac") == 0.0))
    assert(out.forall(_.getAs[Boolean]("keep")))
  }

  test("capPerSource keeps exactly cap docs per source, longest first") {
    val d = Tables.load(spark, sf, "documents")
    val out = Curation.capPerSource(d, cap = 3)
    val bySource = out.groupBy("source").count().collect()
    assert(bySource.forall(_.getLong(1) <= 3))
    // the kept set per source is the top-3 by (n_chars desc, doc_id)
    val one = out.filter(col("source") === bySource.head.getString(0))
      .orderBy(col("rn")).collect()
    assert(one.map(_.getAs[Long]("n_chars")).sliding(2).forall {
      case Array(a, b) => a >= b
      case _ => true
    })
  }

  test("profile counts nulls and distincts per column in one pass") {
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("v", StringType)))
    val df = spark.createDataFrame(java.util.Arrays.asList(
      Row(1L, "a"), Row(2L, null), Row(3L, "a")), schema)
    val p = Profile.table(df, Seq("k", "v"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(p("k").getAs[Long]("n_rows") == 3)
    assert(p("k").getAs[Long]("n_nulls") == 0)
    assert(p("k").getAs[Long]("n_distinct") == 3)
    assert(p("v").getAs[Long]("n_nulls") == 1)
    assert(p("v").getAs[Long]("n_distinct") == 1) // nulls excluded
    assert(p("v").getAs[String]("min_val") == "a")
  }

  test("stream outer join: matched rows equal the inner join; the rest null-pad") {
    val outer = SparkEntry.queries("q_stream_outer_join")(spark, sf)
      .persist()
    val inner = SparkEntry.queries("q_stream_stream_join")(spark, sf)
    val matched = outer.filter(col("matched"))
    assert(matched.count() == inner.count())
    assert(outer.filter(!col("matched"))
      .filter(col("signup_id").isNotNull).count() == 0)
    // every click appears at least once
    val clicks = Tables.load(spark, sf, "events")
      .filter(col("event_type") === "click")
    assert(outer.select("click_id").distinct().count() == clicks.count())
    outer.unpersist()
  }

  test("triangles: a chain has none; a closed triple counts once per vertex") {
    val schema = StructType(Seq(
      StructField("da", LongType), StructField("db", LongType)))
    def edges(rows: (Long, Long)*) = spark.createDataFrame(
      java.util.Arrays.asList(rows.map(r => Row(r._1, r._2)): _*), schema)
    // chain 1-2-3-4: zero triangles
    assert(graft.operators.Graph.triangles(
      edges((1L, 2L), (2L, 3L), (3L, 4L))).count() == 0)
    // triangle 1-2-3 plus a pendant 3-4 (and a reversed duplicate edge,
    // which must canonicalize away)
    val out = graft.operators.Graph.triangles(
      edges((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (2L, 1L)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("profile of an empty table: zero rows, zero distincts, null min/max") {
    val schema = StructType(Seq(StructField("k", LongType)))
    val empty = spark.createDataFrame(
      java.util.Collections.emptyList[Row](), schema)
    val p = graft.operators.Profile.table(empty, Seq("k")).collect()
    assert(p.length == 1)
    assert(p(0).getAs[Long]("n_rows") == 0)
    assert(p(0).getAs[Long]("n_distinct") == 0)
    assert(p(0).getAs[String]("min_val") == null)
  }

  test("snapshotDiff ∘ applyChanges is the identity: changeset replays to today's snapshot") {
    val base = Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val curr = base.filter(col("o_orderkey") % 7 =!= 0)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 5 === 0, col("o_totalprice") + 10)
          .otherwise(col("o_totalprice")))
      .unionByName(base.filter(col("o_orderkey") % 11 === 0)
        .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
          col("o_orderstatus"), col("o_totalprice")))
    val diff = graft.operators.Delta.snapshotDiff(base, curr, "o_orderkey")
    val changes = diff
      .withColumn("__del", col("op") === "D").drop("op")
      // deletes carry null value columns; applyChanges only needs the key
    val replayed = graft.operators.Merge.applyChanges(
      base.withColumn("__del", lit(false)).drop("__del"), changes,
      Seq("o_orderkey"), "__del")
    assert(replayed.select("o_orderkey", "o_orderstatus", "o_totalprice")
      .except(curr).count() == 0)
    assert(curr.except(replayed
      .select("o_orderkey", "o_orderstatus", "o_totalprice")).count() == 0)
  }

  test("decay score: an event at the corpus max timestamp contributes its full value") {
    val out = SparkEntry.queries("q_events_decay_score")(spark, sf)
    // scores are positive and bounded by each user's raw value sum
    val ev = Tables.load(spark, sf, "events")
      .groupBy("user_id").agg(sum("value").as("raw"))
    val joined = out.join(ev, "user_id")
      .filter(col("decay_score") > col("raw") + 0.000001)
    assert(joined.count() == 0)
  }
}
