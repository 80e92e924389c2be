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
      rateThreshold: Double = 0.2): DataFrame = {
    val trainSh = Dedup.ngrams(train, n)
      .select(col("doc_id"), Scalars.md5Long60(col("s")).as("sh"))
    val benchSh = Dedup.ngrams(bench, n)
      .select(Scalars.md5Long60(col("s")).as("sh"))
      .distinct()
      .withColumn("__hit", lit(1L))
    trainSh.join(broadcast(benchSh), Seq("sh"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_ngrams"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_hits"))
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
