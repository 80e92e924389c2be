package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Scalars

/** Document deduplication for training-data pipelines: exact, MinHash+LSH,
  * SimHash, and n-gram-Jaccard near-dup — all as distributed dataflows
  * (inverted-index joins, never an O(n²) cross join).
  *
  * Hashing is md5-based (`Scalars.md5Long60`) so a SQL oracle can
  * reproduce every signature bit-exactly: x = first 15 hex chars of md5
  * decoded base-16 (60 bits), then universal hashes
  * `(a_i·(x mod p) + b_i) mod p` over prime p = 2^31-1.
  *
  * Scale notes: shingling is a narrow projection; the only shuffles are
  * the distinct/groupBy on (doc, shingle) and the candidate-pair joins,
  * all key-partitioned. The document-frequency cap bounds inverted-index
  * fan-out (a shingle seen in d docs contributes d² candidate pairs —
  * frequency-capped to keep the join linear-ish, the standard trick).
  */
object Dedup {

  val P: Long = 2147483647L // 2^31-1, Mersenne prime
  /** k=16 universal hash parameter pairs (odd multipliers). */
  val AS: Seq[Long] = Seq(3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53, 59)
  val BS: Seq[Long] = Seq(1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024, 2048, 4096, 8192, 16384, 32768)
  val K: Int = AS.size

  /** Distinct word 3-shingles per document: (doc_id, s). */
  def shingles(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), TextAnalysis.tokens.as("t"))
      .select(col("doc_id"), explode(
        when(size(col("t")) >= 3,
          expr("transform(sequence(0, size(t)-3), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])"))
          .otherwise(array().cast("array<string>"))).as("s"))
      .distinct()

  /** Exact dedup by content fingerprint: one keeper (min doc_id) per
    * fingerprint group. */
  def exactDedup(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), TextAnalysis.fingerprint.as("fp"))
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dupes"))

  /** MinHash signatures: k minima of universal hashes over the shingle
    * set. One shuffle (groupBy doc_id), k agg expressions. */
  def minhashSignatures(sh: DataFrame): DataFrame = {
    val xm = Scalars.md5Long60(col("s")) % P
    val aggs = AS.indices.map(i =>
      min((lit(AS(i)) * xm + lit(BS(i))) % P).as(s"s$i"))
    sh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding over the signatures: r=2 rows/band → k/2 bands; docs
    * sharing ≥1 band are candidates. Emits (da, db, n_bands). */
  def lshCandidates(sigs: DataFrame): DataFrame = {
    val bands = (0 until K / 2).map { b =>
      struct(lit(b).as("band_idx"),
        concat_ws("_", col(s"s${2 * b}"), col(s"s${2 * b + 1}")).as("band_val"))
    }
    // persist: both sides of the self-join share this lineage — without
    // it Spark recomputes the shingle+minhash pipeline per side
    // (scope-managed: released by the enclosing CacheScope.scoped)
    val exploded = graft.CacheScope.persist(
      sigs.select(col("doc_id"), explode(array(bands: _*)).as("b"))
        .select(col("doc_id"), col("b.band_idx"), col("b.band_val")))
    val a = exploded.alias("a")
    val b = exploded.alias("b")
    a.join(b,
      col("a.band_idx") === col("b.band_idx") &&
        col("a.band_val") === col("b.band_val") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .groupBy(col("da"), col("db"))
      .agg(count(lit(1)).as("n_bands"))
  }

  /** n-gram Jaccard near-dup: inverted-index candidate pairs over
    * frequency-capped shingles, then exact Jaccard on the full shingle
    * sets of candidates only. */
  def jaccardPairs(sh0: DataFrame, dfCap: Int, threshold: Double): DataFrame = {
    // reused 4× (sizes, df, both join sides); scope-managed persist
    val sh = graft.CacheScope.persist(sh0)
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val dfreq = sh.groupBy(col("s")).agg(count(lit(1)).as("df"))
    // single inverted-index pass: count shared shingles per pair AND
    // remember whether any shared shingle is rare — pairs with no rare
    // shingle are discarded after the aggregation (same candidate set as
    // a separate rare-shingle prefilter join, one join cheaper)
    val a = sh.join(dfreq, "s").alias("a")
    val b = sh.alias("b")
    val pairStats = a.join(b, col("a.s") === col("b.s") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        when(col("a.df") <= dfCap, 1).otherwise(0).as("rare"))
      .groupBy(col("da"), col("db"))
      .agg(count(lit(1)).as("n_common"), max(col("rare")).as("has_rare"))
      .filter(col("has_rare") === 1)
    pairStats
      .join(sizes.withColumnRenamed("doc_id", "da").withColumnRenamed("n", "na"), "da")
      .join(sizes.withColumnRenamed("doc_id", "db").withColumnRenamed("n", "nb"), "db")
      .withColumn("jaccard",
        col("n_common").cast("double") / (col("na") + col("nb") - col("n_common")))
      .filter(col("jaccard") >= threshold)
      .select("da", "db", "n_common", "jaccard")
  }

  /** 32-bit SimHash over the distinct token set: per-bit vote sums of
    * ±1 weighted by the token hash's bit, then reassembled. One explode +
    * one groupBy with 32 codegen'd sum expressions. */
  def simhash(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(array_distinct(TextAnalysis.tokens)).as("tok"))
      .withColumn("h", Scalars.md5Long60(col("tok")))
    val votes = (0 until 32).map(j =>
      sum(when(shiftright(col("h"), j) % 2 === 1, 1).otherwise(-1)).as(s"v$j"))
    val voted = toks.groupBy(col("doc_id")).agg(votes.head, votes.tail: _*)
    val bits = (0 until 32).map(j =>
      when(col(s"v$j") > 0, lit(1L << j)).otherwise(lit(0L)))
    voted.select(col("doc_id"), bits.reduce(_ + _).as("simhash"))
  }

  /** SimHash near-dup candidates: byte-banding (4 bands of 8 bits —
    * pairs within Hamming distance 6 share a byte with high probability),
    * verified with exact bit_count(xor). */
  def simhashPairs(sh: DataFrame, maxHamming: Int): DataFrame = {
    val banded = graft.CacheScope.persist(sh).select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(k =>
        struct(lit(k).as("band_idx"),
          (shiftright(col("simhash"), k * 8) % 256).as("band_val"))): _*)).as("b"))
      .select(col("doc_id"), col("simhash"), col("b.band_idx"), col("b.band_val"))
    val a = banded.alias("a")
    val b = banded.alias("b")
    a.join(b,
      col("a.band_idx") === col("b.band_idx") &&
        col("a.band_val") === col("b.band_val") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash")))
          .cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
