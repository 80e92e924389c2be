package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis layer for training-data pipelines over the `documents`
  * table: tokenization, language ID, quality scoring, fingerprinting.
  *
  * Everything is built-in expression work (codegen'd, no UDFs): at 100 TB
  * these run as a single narrow projection over the scan — no shuffle at
  * all until an aggregation asks for one. All arithmetic that reaches an
  * output column is either integer-exact or a single IEEE double op, so
  * the DuckDB oracles hash-match.
  */
object TextAnalysis {

  /** Whitespace tokens of the lower-cased text. */
  val tokens: Column = split(lower(trim(col("text"))), "\\s+")

  /** BPE-ish tokens: alnum runs (filtered of empties so Spark's
    * trailing-empty trimming and DuckDB's keep-all agree). */
  val alnumTokens: Column =
    filter(split(lower(trim(col("text"))), "[^a-z0-9]+"), x => x =!= lit(""))

  /** Stopword hit count for a language's list (counts repeats — a
    * frequency signal, not set overlap). */
  def stopHits(toks: Column, stopwords: Seq[String]): Column =
    size(filter(toks, x => x.isin(stopwords.map(lit): _*)))

  val enStops = Seq("the", "a", "and", "of", "to", "in", "is")
  val esStops = Seq("el", "la", "de", "que", "y", "en")
  val deStops = Seq("der", "die", "das", "und", "ist")
  val frStops = Seq("le", "les", "et", "est", "une")

  /** n-gram-heuristic language ID: argmax of stopword-list hits with a
    * deterministic precedence (en > es > de > fr > und) on ties. */
  def langIdExpr(toks: Column): Column = {
    val en = stopHits(toks, enStops)
    val es = stopHits(toks, esStops)
    val de = stopHits(toks, deStops)
    val fr = stopHits(toks, frStops)
    val best = greatest(en, es, de, fr)
    when(best === 0, lit("und"))
      .when(en === best, lit("en"))
      .when(es === best, lit("es"))
      .when(de === best, lit("de"))
      .otherwise(when(fr === best, lit("fr")).otherwise(lit("und")))
      // precedence chain keeps ties deterministic
  }

  /** Punctuation/symbol character count: what remains after stripping
    * alnum + whitespace (Spark regexp_replace is global by default; the
    * oracle passes the 'g' flag). */
  val punctCount: Column =
    length(regexp_replace(lower(col("text")), "[a-z0-9 ]", ""))

  /** Canonical document fingerprint: md5 over the sorted distinct token
    * set — two docs with the same bag-of-words collapse to one
    * fingerprint (exact-dedup key robust to word order). */
  val fingerprint: Column =
    md5(array_join(array_sort(array_distinct(tokens)), " "))

  /** Mean token length (expression-only: sum of lengths / count, both
    * exact longs, one IEEE division). */
  def meanWordLen(toks: Column): Column =
    aggregate(toks, lit(0L), (a, x) => a + length(x)).cast("long") /
      size(toks).cast("long")

  /** Fraction of the document covered by its single most frequent token
    * (the Gopher-style repetition signal). Expression-only — O(distinct ×
    * len) per row, which stays narrow (zero shuffle) and is the right
    * trade for web-scale SHORT documents; for book-length docs switch to
    * the explode + groupBy form (one shuffle, linear per row). */
  /** The canonical-per-cluster keeper score (the one `q_text_quality`
    * oracle-proves): 0.6·distinct_ratio + 0.4·(1−stop_ratio). Shared by
    * the pretrain twins and the curation flagship so the keeper
    * convention can't drift between compositions. */
  def qualityScore: Column = {
    val t = tokens
    val tc = size(t).cast("long")
    lit(0.6) * (size(array_distinct(t)).cast("long") / tc) +
      lit(0.4) * (lit(1.0) -
        stopHits(t, enStops).cast("long") / tc)
  }

  /** Implementation: max run length over the SORTED token array — one
    * O(n log n) sort + one O(n) aggregate pass per row, replacing the
    * r12 `transform(array_distinct, d -> size(filter(toks, = d)))` form
    * whose work is O(distinct × len) per row (measured 320 µs/doc at
    * sf0.1 — 1.6 s of the 4.3 s gopher-gate pass; the sorted form is
    * 3×, r18 plans/). Equal tokens are contiguous after array_sort, so
    * the longest run IS the max frequency — value-identical (asserted
    * row-for-row vs the old form in Round18OptSpec and by the unchanged
    * oracle hashes). Precondition (unchanged): token arrays contain no
    * null elements — `split` never produces one. */
  def topTokenFrac(toks: Column): Column = {
    val run = (acc: Column, x: Column) =>
      when(x <=> acc.getField("prev"), acc.getField("run") + 1L).otherwise(lit(1L))
    val best = aggregate(array_sort(toks),
      struct(lit(null).cast("string").as("prev"), lit(0L).as("run"),
        lit(0L).as("best")),
      (acc, x) => struct(x.as("prev"), run(acc, x).as("run"),
        greatest(acc.getField("best"), run(acc, x)).as("best")),
      acc => acc.getField("best"))
    best.cast("long") / size(toks).cast("long")
  }

  /** Quality-gate metrics + verdict, Gopher-flavored: length bounds,
    * mean-word-length bounds, repetition caps, and a stopword-presence
    * floor. Thresholds are arguments so corpora can tune them. */
  def gopherMetrics(minWords: Int, maxWords: Int,
      minMeanLen: Double, maxMeanLen: Double,
      minDistinctRatio: Double, maxTopTokenFrac: Double): Seq[Column] = {
    val t = tokens
    val wc = size(t).cast("long")
    val mwl = meanWordLen(t)
    val dr = size(array_distinct(t)).cast("long") / wc
    val ttf = topTokenFrac(t)
    val sh = stopHits(t, enStops).cast("long")
    Seq(wc.as("word_count"), mwl.as("mean_word_len"),
      dr.as("distinct_ratio"), ttf.as("top_token_frac"),
      sh.as("stop_hits"),
      (wc >= minWords && wc <= maxWords &&
        mwl >= minMeanLen && mwl <= maxMeanLen &&
        dr >= minDistinctRatio && ttf <= maxTopTokenFrac &&
        sh >= 1).as("keep"))
  }

  /** Per-document TF-IDF top-k terms: tf·ln(N/df), rank-limited per doc
    * with a term tiebreak. Three key-partitioned shuffles (tf groupBy,
    * df groupBy, doc window) + a 1-row broadcast for N — the plan Spark
    * turns into partial-aggregated exchanges with a WindowGroupLimit,
    * linear at corpus scale. Score rounded to 6 dp: ln() is not
    * correctly-rounded in either engine, so raw doubles could drift a
    * ulp between implementations. */
  def tfidfTopTerms(docs: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = docs.select(col("doc_id"), explode(tokens).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("tok").asc)
    tf.join(df, "tok").crossJoin(broadcast(n))
      .withColumn("tfidf",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col("doc_id"), col("tok"), col("tf"), col("df"), col("tfidf"))
  }

  /** BM25 top-k retrieval over an inverted index — the query-driven
    * complement of [[tfidfTopTerms]]: given a (small, fixed) query
    * workload as `(qid, tok)` term sets, rank corpus documents by
    * Okapi BM25 (Robertson & Walker, SIGIR '94) and keep the top `k`
    * per query.
    *
    * Dataflow at 100 TB: the corpus side is the `(doc, tok, tf)`
    * posting table (one map-side-combined groupBy); the query side and
    * its per-term document frequencies are QUERY-VOCABULARY-sized, so
    * both broadcast — the probe is a broadcast hash join that streams
    * the postings once and touches only terms a query mentions. The
    * only corpus-keyed shuffles are the tf/df groupBys and the
    * per-(qid, doc) score sum; ranking is a WindowGroupLimit over the
    * candidate rows (partial top-k before the exchange), never a full
    * sort.
    *
    * Float discipline (the [[lmScore]] rule): each per-term score is
    * one chain of IEEE double ops rounded to 6 dp, summed as
    * DECIMAL(18,6) so the reduction is order-exact — ranking and the
    * oracle hash cannot drift with partitioning.
    *
    * `excludeSelf` (default true): drop candidates whose `doc_id`
    * equals the query's `qid` — the leave-one-out convention for
    * doc-derived query workloads (a document trivially top-ranks
    * itself). Callers whose qids live in a DIFFERENT id space than
    * doc_ids must pass `excludeSelf = false`, or an accidental
    * qid/doc_id collision silently loses a legitimate candidate. */
  def bm25TopK(docs: DataFrame, queries: DataFrame, k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      excludeSelf: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = docs.select(col("doc_id"), explode(tokens).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val dl = docs.select(col("doc_id"), size(tokens).cast("long").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    // df restricted to the query vocabulary BEFORE broadcasting: the
    // broadcast is bounded by |query terms|, not corpus vocabulary.
    val dfq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .join(broadcast(queries.select(col("tok")).distinct()), Seq("tok"))
    val idf = log(lit(1.0) +
      ((col("n_docs") - col("df")).cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5)))
    val tfc = (col("tf").cast("double") * lit(k1 + 1.0)) /
      (col("tf").cast("double") + lit(k1) *
        (lit(1.0) - lit(b) + lit(b) * (col("dl").cast("double") / col("avgdl"))))
    val cand = tf.join(broadcast(queries), Seq("tok"))
    val terms = (if (excludeSelf) cand.filter(col("doc_id") =!= col("qid"))
                 else cand)
      .join(dl, Seq("doc_id"))
      .join(broadcast(dfq), Seq("tok"))
      .crossJoin(broadcast(stats))
      .select(col("qid"), col("doc_id"),
        round(idf * tfc, 6).cast("decimal(18,6)").as("term_score"))
    val scored = terms.groupBy(col("qid"), col("doc_id"))
      .agg(count(lit(1)).as("n_terms"), sum(col("term_score")).as("s"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("s").desc, col("doc_id").asc)
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col("qid"), col("doc_id"), col("n_terms"),
        col("__rn").cast("long").as("rank"),
        col("s").cast("double").as("score"))
  }

  /** PII / deny-list scrubbing: replace email + US-phone shapes and a
    * dictionary of sensitive terms, count what was hit. Pure
    * regexp_replace/extract_all — codegen'd, no shuffle, and the
    * patterns stay in the RE2-compatible subset both engines parse. */
  def scrub(text: Column, denyList: Seq[String]): Seq[Column] = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phone = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
    val dict = "\\b(" + denyList.mkString("|") + ")\\b"
    val scrubbed = regexp_replace(
      regexp_replace(regexp_replace(text, email, "<EMAIL>"),
        phone, "<PHONE>"),
      dict, "<REDACTED>")
    Seq(size(regexp_extract_all(text, lit(email), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(text, lit(phone), lit(0))).cast("long").as("n_phones"),
      size(regexp_extract_all(text, lit(dict), lit(0))).cast("long").as("n_dict_hits"),
      md5(scrubbed).as("scrubbed_md5"))
  }

  /** Order-sensitive rolling fingerprint: polynomial fold over the token
    * sequence, `h = (h·31 + hash(tok)) mod (2^31-1)` — the streaming-
    * friendly exact-dup key where word order matters (one pass, O(1)
    * state, no sort). */
  val rollingHash: Column = expr(
    "aggregate(split(lower(trim(text)), '\\\\s+'), CAST(0 AS BIGINT), " +
      "(acc, x) -> (acc * 31 + " +
      "CAST(conv(substring(md5(x), 1, 15), 16, 10) AS BIGINT) % 2147483647) " +
      "% 2147483647)")

  /** Unigram language-model scoring (the CCNet/RedPajama quality signal):
    * per-document cross-entropy under the corpus's own unigram model,
    * `xent = avg over tokens of −ln(count(tok)/total)`. Low = typical
    * text, high = rare-token soup; the usual use is a [[Curation]]
    * quantile band over this column.
    *
    * Dataflow: one token-count aggregation (partial-agg absorbs hot-token
    * skew), then the fact re-joins the frequency table BROADCAST — a
    * shuffle join on `tok` would send every occurrence of a hot token to
    * one partition. A cleaned corpus's unigram vocab is ~10^7 entries
    * (hundreds of MB) and fits; if it doesn't, pre-bucket both sides on
    * `tok` instead. Per-token ln is rounded to 6dp and summed as
    * DECIMAL(18,6) so partial-agg order can't perturb the hash
    * (ln is not correctly-rounded in either engine). */
  def lmScore(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), explode(tokens).as("tok"))
    val freq = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val total = freq.agg(sum(col("cnt")).as("total"))
    toks.join(broadcast(freq), Seq("tok"))
      .crossJoin(broadcast(total))
      .withColumn("__s",
        round(-log(col("cnt") / col("total")), 6).cast("decimal(18,6)"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        (sum(col("__s")).cast("double") / count(lit(1))).as("xent"))
  }

  /** Feature hashing (the hashing trick): fixed-`dim` bag-of-words count
    * vectors, bucket = md5-hash(token) mod dim — the stateless text →
    * vector bridge (no vocabulary to fit, ship, or keep consistent
    * across a 100 TB corpus; Weinberger et al., ICML 2009). Output is
    * the dense count array; every token hits exactly one bucket, so the
    * dataflow is explode → one (doc, bucket) count shuffle → per-doc
    * map reassembled into the dense vector. Hash is `Scalars.md5Long60`
    * so an oracle can reproduce buckets bit-exactly. */
  def hashingTf(docs: DataFrame, dim: Int): DataFrame = {
    require(dim > 0, "hashingTf needs dim > 0")
    docs.select(col("doc_id"), explode(tokens).as("tok"))
      .select(col("doc_id"),
        pmod(graft.functions.Scalars.md5Long60(col("tok")), lit(dim.toLong))
          .cast("int").as("b"))
      .groupBy(col("doc_id"), col("b"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(map_from_entries(collect_list(struct(col("b"), col("c"))))
        .as("__m"))
      .select(col("doc_id"),
        transform(sequence(lit(0), lit(dim - 1)),
          d => coalesce(element_at(col("__m"), d), lit(0L))).as("tf"))
  }

  /** Document-level PMI of token pairs — how much more often two tokens
    * co-occur in a document than independence predicts; the collocation
    * / phrase-mining primitive. Presence-based (distinct tokens per
    * doc); output (ta, tb, df_a, df_b, df_ab, pmi) with ta < tb.
    *
    * Two bounds, both required at 100 TB:
    * - `minPairDf` cuts pairs with co-document-frequency below the
    *   floor AFTER aggregation — a noise filter, not a cost bound.
    * - `topV` bounds the VOCABULARY before the per-doc self-join: the
    *   distinct-pair key space grows ~V² while V itself grows with the
    *   corpus (Heaps' law), so uncapped PMI's aggregation state is the
    *   one superlinear term in the text-stat family (measured: Zipf
    *   decade exponent 1.02 min-protocol, round 11). The cap keeps
    *   tokens with df ≥ d*, where d* is the smallest df level whose
    *   high-end cumulative vocabulary count stays ≤ V — computed on the
    *   df HISTOGRAM (≤ max(df) rows, a scalar reduction's worth), so no
    *   per-token global sort or rank; kept vocabulary ≤ V by
    *   construction, deterministic under ties (a whole df level is in
    *   or out). Distinct pair keys ≤ C(V,2) — constant in corpus size.
    */
  def pmi(docs: DataFrame, minPairDf: Long = 5,
      topV: Option[Long] = None,
      maxDfFrac: Option[Double] = None): DataFrame = {
    val toks0 = graft.CacheScope.persist(
      docs.select(col("doc_id"), explode(tokens).as("tok")).distinct())
    val nd = docs.agg(count(lit(1)).as("n_docs"))
    val dfreqAll = graft.CacheScope.persist(
      toks0.groupBy(col("tok")).agg(count(lit(1)).as("df")))
    // df-band prefilter: a token in more than maxDfFrac of all
    // documents co-occurs with essentially everything — its PMI is ≈0
    // by definition — yet it contributes the LARGEST per-doc pair
    // explode (present in every doc, it pairs with every other kept
    // token, every time). Dropping the band top cuts the dominant
    // slice of pair-row mass without touching any pair a collocation
    // miner would keep; df_a/df_b lookups below still report the true
    // corpus df of every kept token.
    val dfreq = maxDfFrac match {
      case None => dfreqAll
      case Some(a) =>
        dfreqAll.crossJoin(broadcast(nd))
          .filter(col("df").cast("double") <=
            col("n_docs").cast("double") * lit(a))
          .select(col("tok"), col("df"))
    }
    val toks = topV match {
      case None =>
        if (maxDfFrac.isEmpty) toks0
        else toks0.join(dfreq.select(col("tok")), Seq("tok"), "left_semi")
          .select(col("doc_id"), col("tok"))
      case Some(v) =>
        val w = org.apache.spark.sql.expressions.Window
        val dstar = dfreq.groupBy(col("df")).agg(count(lit(1)).as("c"))
          .withColumn("cc", sum(col("c")).over(w.orderBy(col("df").desc)
            .rowsBetween(w.unboundedPreceding, w.currentRow)))
          .agg(min(when(col("cc") <= v, col("df"))).as("mind"),
            max(col("df")).as("maxdf"))
          // even the top df level can exceed V on a degenerate corpus:
          // keep at least that level rather than emptying the vocab
          .select(coalesce(col("mind"), col("maxdf")).as("dstar"))
        toks0.join(dfreq, "tok").crossJoin(broadcast(dstar))
          .filter(col("df") >= col("dstar"))
          .select(col("doc_id"), col("tok"))
    }
    val pairs = toks.as("a").join(toks.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("a.tok") < col("b.tok"))
      .groupBy(col("a.tok").as("ta"), col("b.tok").as("tb"))
      .agg(count(lit(1)).as("df_ab"))
      .filter(col("df_ab") >= minPairDf)
    pairs
      .join(broadcast(dfreq.select(col("tok").as("ta"),
        col("df").as("df_a"))), Seq("ta"))
      .join(broadcast(dfreq.select(col("tok").as("tb"),
        col("df").as("df_b"))), Seq("tb"))
      .crossJoin(broadcast(nd))
      .select(col("ta"), col("tb"), col("df_a"), col("df_b"),
        col("df_ab"),
        round(log((col("df_ab") * col("n_docs")) /
          (col("df_a") * col("df_b"))), 6).as("pmi"))
  }
}
