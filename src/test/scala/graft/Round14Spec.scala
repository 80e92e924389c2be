package graft

import org.apache.spark.sql.functions._

import graft.sources.DocCollection

/** Round-14 seams: the bounded-sample document-collection reader's
  * unit contracts (the r13 queries pin the end-to-end hashes; these
  * pin the WHY at the operator level), the staged-fixture idempotence
  * that makes the registered queries read-only, and the state-store
  * knob's empty-env contract (the one-line bug that invalidated the
  * r13 A/B campaign).
  */
class Round14Spec extends SparkSuite {

  private def coll: String = DocCollection.stageFixture(spark, sf)

  test("bounded-sample inference stops at the file-aligned horizon") {
    // head shard holds >= 400 docs at every sf, so a 256-doc sample
    // never reaches the tail shard: the inferred schema must MISS the
    // tail-only fields entirely
    val sampled = DocCollection.inferSampledSchema(spark, coll, 256L)
    assert(!sampled.fieldNames.contains("leadid"), sampled.treeString)
    assert(!sampled.fieldNames.contains("extra_score"), sampled.treeString)
    // a horizon past the head shard picks them up
    val full = DocCollection.inferSampledSchema(spark, coll, 1000000L)
    assert(full.fieldNames.contains("leadid"), full.treeString)
    assert(full.fieldNames.contains("extra_score"), full.treeString)
  }

  test("sampled read parses tail docs but silently drops unsampled fields") {
    val df = DocCollection.readSampled(spark, coll, 256L)
    val total = spark.read.option("recursiveFileLookup", "true")
      .json(coll).count()
    // every document parses (PERMISSIVE), none are dropped
    assert(df.count() == total)
    // ...but the tail-only fields are invisible to the whole frame
    assert(!df.columns.contains("leadid"))
    assert(!df.columns.contains("extra_score"))
  }

  test("leadid guard: absent column -> typed null; present -> string cast") {
    val absent = DocCollection.withLeadidGuard(
      DocCollection.readSampled(spark, coll, 256L))
    assert(absent.columns.contains("leadid"))
    assert(absent.schema("leadid").dataType ==
      org.apache.spark.sql.types.StringType)
    assert(absent.filter(col("leadid").isNotNull).count() == 0)
    val present = DocCollection.withLeadidGuard(
      spark.read.option("recursiveFileLookup", "true").json(coll))
    assert(present.schema("leadid").dataType ==
      org.apache.spark.sql.types.StringType)
    // the tail shard's keys survive the present branch
    assert(present.filter(col("leadid").isNotNull).count() > 0)
  }

  test("stageFixture is idempotent and keyed by input dir") {
    val first = coll
    // marker honored: a second call must not rewrite the shards
    val headFile = new java.io.File(s"$first/a_head").listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("."))
      .minBy(_.getName)
    val stamp = headFile.lastModified()
    assert(DocCollection.stageFixture(spark, sf) == first)
    assert(headFile.lastModified() == stamp,
      "second stageFixture call rewrote the staged shard")
    // a different input dir stages at a different path (the r13
    // fixed-path hazard: two sfs overwriting each other mid-read)
    assert(DocCollection.stageFixture(spark, "/root/testdata/sf0.01")
      != first)
  }

  test("incremental LSH dedup agrees with the full-corpus candidate set") {
    // a new-batch doc (doc_id % 4 = 0) is dropped by the index-join
    // path IFF the full-corpus lshCandidates pair set links it to a
    // corpus doc or a smaller same-batch doc — the two computations
    // share no code path beyond bandIndex, so agreement pins the
    // blame-rule rewrite
    import graft.text.Dedup
    import graft.sources.Tables
    graft.CacheScope.scoped {
      val docs = Tables.load(spark, sf, "documents")
      val pairs = Dedup.lshCandidates(
        Dedup.minhashSignatures(Dedup.shingles(docs)))
      // pairs are (da < db); a new doc `n` is linked when it appears
      // as db against any corpus doc or smaller new doc (da < n always
      // satisfies the blame rule), or as da against a corpus doc
      val dropByPairs = pairs
        .filter(col("db") % 4 === 0)
        .select(col("db").as("doc_id"))
        .unionByName(pairs
          .filter(col("da") % 4 === 0 && col("db") % 4 =!= 0)
          .select(col("da").as("doc_id")))
        .distinct()
      val corpusIdx = Dedup.bandIndex(Dedup.minhashSignatures(
        Dedup.shingles(docs.where(col("doc_id") % 4 =!= 0))))
      val inc = Dedup.incrementalLshDedup(
        docs.where(col("doc_id") % 4 === 0), corpusIdx)
      val dropByInc = inc.filter(!col("keep")).select(col("doc_id"))
      assert(dropByInc.exceptAll(dropByPairs).isEmpty,
        "incremental dropped a doc the full candidate set never linked")
      assert(dropByPairs.exceptAll(dropByInc).isEmpty,
        "incremental missed a linked doc")
    }
  }

  test("state-store knob: unset/empty/whitespace mean Spark's default") {
    assert(GraftSession.stateProviderFrom(None).isEmpty)
    assert(GraftSession.stateProviderFrom(Some("")).isEmpty)
    assert(GraftSession.stateProviderFrom(Some("  ")).isEmpty)
    assert(GraftSession.stateProviderFrom(Some(" x.Y ")) == Some("x.Y"))
  }
}
