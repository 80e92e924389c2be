package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Round-9 guards.
  *
  * 1. SCHEMA-DRIFT GUARD (the round-8 lesson): the driver regenerated
  *    the fixtures and `events.ts` flipped from parquet TIMESTAMP(NANOS)
  *    (read as raw long under nanosAsLong) to micros TIMESTAMP_NTZ —
  *    and every site that assumed one physical encoding broke: 9
  *    queries errored, 3 streamed WRONG results (time compressed
  *    1000×). The guard writes the same tiny event set under all three
  *    logical encodings Spark can hand us — nanos-as-long, micros-NTZ,
  *    micros-LTZ — and asserts `Tables.load`/the streaming source
  *    normalize each to session-zone TimestampType with IDENTICAL
  *    values. Any future fixture churn that breaks an encoding
  *    assumption fails here, not in 12 driver queries.
  *
  * 2. GENSCALE TOKENIZATION INVARIANT: GenScale's per-copy text rewrite
  *    splits on `\s+` while near-dup operators tokenize via
  *    `TextAnalysis.tokens` (lower+trim+`\s+`). The decade's "within-copy
  *    pair preservation" guarantee holds only while the two agree on the
  *    corpus; this pins it by asserting every within-copy candidate
  *    pair's 3-shingle Jaccard is bit-identical pre/post rewrite.
  */
class Round9Spec extends SparkSuite {

  private lazy val work = Files.createTempDirectory("graft_r9").toString

  /** ~2 days of 15-min events as epoch micros — enough hourly buckets
    * that a nanos/micros mixup (1000× compression) changes the count. */
  private val baseUs: Seq[Long] =
    (0 until 192).map(i => 1700000000000000L + i * 900L * 1000000L)

  /** Write the same events under one physical encoding; returns its dir. */
  private def writeFixture(enc: String): String = {
    import spark.implicits._
    val dir = s"$work/$enc"
    val rows = baseUs.zipWithIndex.map { case (us, i) =>
      (i.toLong, us, (i % 7).toLong,
        if (i % 3 == 0) "click" else "view", i * 0.5)
    }
    val df = rows.toDF("event_id", "us", "user_id", "event_type", "value")
    val withTs = enc match {
      case "nanos_long" => df.withColumn("ts", col("us") * 1000L)
      case "micros_ntz" =>
        df.withColumn("ts", timestamp_micros(col("us")).cast(TimestampNTZType))
      case "micros_ltz" => df.withColumn("ts", timestamp_micros(col("us")))
    }
    withTs.drop("us").write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private lazy val encodings = Seq("nanos_long", "micros_ntz", "micros_ltz")
  private lazy val dirs: Map[String, String] =
    encodings.map(e => e -> writeFixture(e)).toMap

  test("schema-drift guard: Tables.load folds every ts encoding to TimestampType") {
    // pre-flight: the fixtures really carry three different logical types
    val rawTypes = encodings.map { e =>
      spark.read.parquet(s"${dirs(e)}/events.parquet").schema("ts").dataType
    }
    assert(rawTypes.distinct.size == 3,
      s"fixtures collapsed to the same logical type: $rawTypes")

    encodings.foreach { e =>
      val loaded = Tables.load(spark, dirs(e), "events")
      assert(loaded.schema("ts").dataType == TimestampType,
        s"$e: ts is ${loaded.schema("ts").dataType}, not TimestampType")
    }
  }

  test("schema-drift guard: identical values and hourly buckets across encodings") {
    def micros(dir: String): Seq[(Long, Long)] =
      Tables.load(spark, dir, "events")
        .select(col("event_id"), unix_micros(col("ts")))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val perEnc = encodings.map(e => micros(dirs(e)))
    assert(perEnc.distinct.size == 1, "encodings decode to different values")
    assert(perEnc.head.map(_._2) == baseUs, "decoded micros drifted from source")

    def hourly(dir: String): Long =
      Tables.load(spark, dir, "events")
        .groupBy(date_trunc("hour", col("ts"))).count().count()
    val buckets = encodings.map(e => hourly(dirs(e)))
    assert(buckets.distinct.size == 1, s"hourly buckets differ: $buckets")
    assert(buckets.head == 48L, s"expected 48 hourly buckets, got ${buckets.head}")
  }

  test("schema-drift guard: streaming source normalizes like the batch path") {
    // hourlyAggregates derives its schema from the batch footer, so the
    // same data under different encodings must stream to the same result
    val results: Seq[Seq[(Long, String, Long)]] = encodings.map { e =>
      graft.streaming.EventsStream.hourlyAggregates(spark, dirs(e))
        .select(unix_micros(col("hour_start")), col("event_type"), col("n"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .sortBy(t => (t._1, t._2)).toSeq
    }
    assert(results.distinct.size == 1,
      "streaming hourly aggregates differ across physical encodings")
    assert(results.head.map(_._1).distinct.size == 48,
      s"streamed ${results.head.map(_._1).distinct.size} hourly windows, expected 48")
  }

  test("schema-drift guard: real fixtures load as TimestampType") {
    val loaded = Tables.load(spark, sf, "events")
    assert(loaded.schema("ts").dataType == TimestampType)
    // and time arithmetic through the canonical helper analyzes + runs
    val n = loaded
      .select(graft.functions.Scalars.epochMicros(col("ts")).as("us"))
      .where(col("us") > 0).limit(1).count()
    assert(n == 1L)
  }

  test("streaming sessionizer matches batch on sub-millisecond gap boundaries") {
    import spark.implicits._
    // two users: gap 1800s + 400µs (new session — but invisible at
    // millis resolution) and gap exactly 1800s (same session)
    val base = 1700000000000000L
    val rows = Seq(
      (1L, base), (1L, base + 1800000000L + 400L),
      (2L, base), (2L, base + 1800000000L))
    val ev = rows.toDF("user_id", "us")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"))
    val batch = graft.streaming.Sessionize.batch(
        ev.withColumn("event_id", col("user_id")))
      .select(col("user_id"), col("n_events")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(batch == Seq((1L, 1L), (1L, 1L), (2L, 2L)),
      s"batch sessionizer boundary semantics drifted: $batch")
    // the streaming handler must agree at micros resolution: user 1's
    // first session closes (gap > 1800s by 400µs), user 2's never splits
    val closed = graft.streaming.Sessionize.sessionizeStream(
        ev.as[graft.streaming.Sessionize.Event])
      .collect().map(s => (s.user_id, s.n_events)).sorted.toSeq
    assert(closed == Seq((1L, 1L)),
      s"streaming sessionizer disagrees with batch at micros resolution: $closed")
  }

  test("GenScale rewrite preserves within-copy pair Jaccard exactly") {
    val docs = Tables.load(spark, sf, "documents").select("doc_id", "text")
    val rewritten = docs.withColumn("text", GenScale.rewriteText(1))

    def pairJaccard(d: DataFrame): DataFrame = {
      val sh = graft.text.Dedup.shingles(d)
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      sh.select(col("doc_id").as("a"), col("s"))
        .join(sh.select(col("doc_id").as("b"), col("s")), "s")
        .where(col("a") < col("b"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_common"))
        .join(sizes.select(col("doc_id").as("a"), col("n").as("na")), "a")
        .join(sizes.select(col("doc_id").as("b"), col("n").as("nb")), "b")
        .select(col("a"), col("b"), (col("n_common").cast("double") /
          (col("na") + col("nb") - col("n_common"))).as("j"))
    }

    val pre = pairJaccard(docs).where(col("j") >= 0.2)
    val post = pairJaccard(rewritten).where(col("j") >= 0.2)
    // exact set equality of (pair, jaccard): the rewrite is a pure
    // function of (token, copy), so shared-token structure — and every
    // near-dup pair — must survive bit-for-bit
    val diff = pre.join(post, Seq("a", "b"), "full_outer")
      .where(pre("j").isNull || post("j").isNull || pre("j") =!= post("j"))
      .count()
    assert(diff == 0L, s"$diff within-copy pairs changed Jaccard under rewrite")
    assert(pre.count() > 0L, "no candidate pairs at sf0.001 — test is vacuous")
  }
}
