package graft

import org.apache.spark.sql.functions._

/** Realistic-vocabulary documents fixture (verdict round-10 #3): the
  * driver's synthetic corpus has a ~30-word vocabulary, so EVERY query
  * term matches EVERY document and the bm25/pmi/vocab costs are
  * fixture-shape artifacts. This generator synthesizes a corpus whose
  * statistics follow the two laws real text follows:
  *
  *  - Heaps' law: vocabulary V = 8 · T^0.55 over total token count T —
  *    vocabulary GROWS with corpus size (×~3.5 per ×10 docs) instead
  *    of saturating;
  *  - Zipf's law: each token draws rank r = ⌊V^u⌋ (u uniform in (0,1)),
  *    giving P(r) ∝ 1/r — a fat head of stopword-like terms and a long
  *    tail of rare ones, so per-term posting lists range from
  *    corpus-sized down to singletons exactly as in real text.
  *
  * Everything is a deterministic function of (doc_id, position) via
  * xxhash64 — re-running the generator reproduces the corpus bit-exactly
  * (no Math.random anywhere), and generation is pure narrow expression
  * work (range → transform → array_join), embarrassingly parallel at
  * any scale.
  *
  * Usage: `runMain graft.GenZipf <outDir> <nDocs>`
  */
object GenZipf {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("target/zipf50k")
    val nDocs = args.lift(1).map(_.toLong).getOrElse(50000L)
    val meanToks = 140.0
    val vocab = math.max(1000L,
      (8.0 * math.pow(nDocs * meanToks, 0.55)).toLong)
    val spark = GraftSession.local(GraftSession.envCpus)
    val docs = spark.range(0, nDocs, 1, 32)
      .select(col("id").as("doc_id"))
      .withColumn("n_toks",
        (lit(40) + pmod(xxhash64(col("doc_id"), lit(1L)), lit(200L))).cast("int"))
      .withColumn("text", expr(
        s"""array_join(transform(sequence(1, n_toks),
              p -> concat('w', cast(pow($vocab,
                (pmod(xxhash64(doc_id, p, 7), 1000000) + 0.5) / 1000000.0)
                as bigint))), ' ')"""))
      .withColumn("lang",
        when(pmod(xxhash64(col("doc_id"), lit(2L)), lit(10L)) < 8, "en")
          .when(pmod(xxhash64(col("doc_id"), lit(2L)), lit(10L)) < 9, "de")
          .otherwise("fr"))
      .withColumn("source", element_at(
        array(lit("web"), lit("wiki"), lit("books"), lit("code")),
        (pmod(xxhash64(col("doc_id"), lit(3L)), lit(4L)) + 1).cast("int")))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .select("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$out/documents.parquet")
    println(s"[genzipf] wrote $nDocs Zipf docs (vocab ~$vocab) to $out")
    spark.stop()
  }
}
