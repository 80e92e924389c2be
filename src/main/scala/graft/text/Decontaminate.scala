package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Scalars

/** Benchmark decontamination — flag training documents that share word
  * n-grams with a held-out evaluation corpus, the standard hygiene step
  * before a training run (a train split that contains eval text inflates
  * every downstream benchmark number).
  *
  * Dataflow shape: shingle both corpora (narrow projections), hash each
  * shingle to a 60-bit md5 key, and probe the training shingles against
  * the benchmark shingle set with a broadcast left join — eval corpora
  * are small by construction (thousands of documents, at most millions
  * of distinct n-grams ≈ tens of MB hashed), so even at a 100 TB train
  * corpus the probe is a map-side join and the only shuffle is the final
  * per-document count. No all-pairs stage anywhere.
  *
  * Hashing uses `Scalars.md5Long60` so the DuckDB oracle reproduces the
  * probe bit-exactly; collisions (2^-60-scale) behave identically in
  * both engines because both count post-distinct string shingles and
  * join on the same hash.
  */
object Decontaminate {

  /** Per-training-document contamination profile against `bench`:
    * (doc_id, n_ngrams, n_hits, contamination_rate, is_contaminated).
    * `n_ngrams` counts the document's distinct word n-shingles,
    * `n_hits` how many also occur anywhere in the benchmark corpus.
    * Documents with fewer than `n` tokens carry no n-grams and are
    * absent from the output (nothing to collide on). The flag is an
    * int (1/0) rather than boolean to keep the oracle comparison
    * engine-neutral. */
  def contamination(train: DataFrame, bench: DataFrame, n: Int = 5,
      rateThreshold: Double = 0.2): DataFrame =
    contaminationFromShingles(Dedup.ngrams(train, n), bench, n, rateThreshold)

  /** [[contamination]] with the train side's n-shingles PRECOMPUTED
    * ((doc_id, s), distinct within each document, as [[Dedup.ngrams]]
    * emits them) — pipeline compositions that already hold the corpus'
    * shingle frame (the pretrain ladder shingles once and feeds
    * containment dedup, near-dup clustering, and decontamination from
    * the same cached frame) skip the re-tokenize + explode + distinct. */
  def contaminationFromShingles(trainSh: DataFrame, bench: DataFrame,
      n: Int = 5, rateThreshold: Double = 0.2): DataFrame = {
    val ts = trainSh
      .select(col("doc_id"), Scalars.md5Long60(col("s")).as("sh"))
    val benchSh = Dedup.ngrams(bench, n)
      .select(Scalars.md5Long60(col("s")).as("sh"))
      .distinct()
      .withColumn("__hit", lit(1L))
    ts.join(broadcast(benchSh), Seq("sh"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_ngrams"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_hits"))
      .withColumn("contamination_rate",
        col("n_hits").cast("double") / col("n_ngrams"))
      .withColumn("is_contaminated",
        (col("contamination_rate") >= rateThreshold).cast("long"))
  }

  /** Bloom-sketch contamination profile — the 100 TB form of
    * [[contamination]]: the benchmark's distinct n-gram hashes compact
    * into ONE Bloom filter value (Spark's own BloomFilterAggregate,
    * the runtime-filter machinery), whose bytes broadcast to every
    * executor; the training corpus probes it per n-gram with
    * might_contain. The benchmark relation is never joined at probe
    * time — at 100 TB the probe side ships a megabyte of filter
    * instead of shuffling the corpus. Bloom guarantees NO FALSE
    * NEGATIVES, so every truly contaminated n-gram is counted;
    * false positives can only inflate `n_hits` (rate fpp set by
    * `numBits` vs the benchmark's cardinality). */
  private val bloomViewSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  def contaminationBloom(train: DataFrame, bench: DataFrame, n: Int = 5,
      rateThreshold: Double = 0.2, estimatedItems: Long = 1000000L,
      numBits: Long = 1L << 23): DataFrame = {
    graft.functions.BloomFunctions.register(train.sparkSession)
    // might_contain requires its filter side to be a constant or a
    // scalar subquery (the same contract the optimizer's own runtime
    // filters satisfy) — so the built filter lands in a temp view and
    // the probe references it as a scalar subquery, which Spark
    // evaluates once and ships to every task like a broadcast value.
    // The view name is per-invocation: Dataset analysis resolves the
    // subquery eagerly, but nested or concurrent callers in one session
    // must not clobber each other's filter between build and resolve.
    val view = s"graft_bloom_bf_${bloomViewSeq.incrementAndGet()}"
    Dedup.ngrams(bench, n)
      .select(Scalars.md5Long60(col("s")).as("sh"))
      .distinct()
      .agg(expr(s"graft_bloom_agg(sh, ${estimatedItems}L, ${numBits}L)")
        .as("bf"))
      .createOrReplaceTempView(view)
    Dedup.ngrams(train, n)
      .select(col("doc_id"), Scalars.md5Long60(col("s")).as("sh"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_ngrams"),
        sum(expr("if(graft_bloom_might_contain(" +
          s"(SELECT bf FROM $view), sh), 1L, 0L)"))
          .as("n_hits"))
      .withColumn("contamination_rate",
        col("n_hits").cast("double") / col("n_ngrams"))
      .withColumn("is_contaminated",
        (col("contamination_rate") >= rateThreshold).cast("long"))
  }

  /** The removal composition: `train` minus every document whose
    * contamination rate reaches `rateThreshold` — a broadcast-probe
    * profile followed by one anti join on doc_id. */
  def removeContaminated(train: DataFrame, bench: DataFrame, n: Int = 5,
      rateThreshold: Double = 0.2): DataFrame = {
    val flagged = contamination(train, bench, n, rateThreshold)
      .filter(col("is_contaminated") === 1L)
      .select(col("doc_id"))
    train.join(flagged, Seq("doc_id"), "left_anti")
  }
}
