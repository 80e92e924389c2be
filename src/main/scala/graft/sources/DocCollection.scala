package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Document-collection reader with BOUNDED-SAMPLE schema inference —
  * the last testable S5 slice (SURVEY.md §2a): the reference reads
  * DocumentDB through a sampling partitioner that infers the
  * collection's schema from `sampleSize: 100000` sampled documents
  * (`PUSH:78-81`), then applies that schema to the full scan. The
  * consequence the fixture pins: a field that first appears BEYOND the
  * sample horizon is absent from the inferred schema, so the full read
  * silently drops it — which is why the reference immediately follows
  * the read with runtime column introspection
  * (`if 'leadid' in df_docdb.columns:` — `PUSH:206`, `CONN:57`) instead
  * of trusting the schema.
  *
  * Scale shape: the sample is the smallest FILE-ALIGNED prefix of the
  * collection (files in deterministic path order) whose document count
  * reaches `sampleSize` — the driver loop touches O(sample) bytes and
  * stops, never the corpus; the full scan then runs with the inferred
  * schema applied (no second inference pass over 100 TB). Whole files,
  * not a row limit: a row-limit sample under AQE picks
  * scheduler-ordered rows, which would make the inferred schema — and
  * every downstream hash — nondeterministic.
  */
object DocCollection {

  /** Data files of the collection in deterministic (path-sorted) order;
    * skips `_SUCCESS`/hidden files like the parquet committer does. */
  private def dataFiles(spark: SparkSession, path: String): Seq[String] = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(hPath, true)
    val files = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it.hasNext) {
      val f = it.next()
      val n = f.getPath.getName
      if (f.isFile && !n.startsWith("_") && !n.startsWith("."))
        files += f.getPath.toString
    }
    files.toSeq.sorted
  }

  /** Infer the collection schema from the smallest file-aligned prefix
    * covering `sampleSize` documents (`PUSH:78-81` semantics). The
    * per-file line counts are fenced driver scalars; the loop is
    * bounded by the sample size, not the collection size. */
  def inferSampledSchema(spark: SparkSession, path: String,
      sampleSize: Long): StructType = {
    require(sampleSize > 0, "inferSampledSchema needs sampleSize > 0")
    var taken = Vector.empty[String]
    var cnt = 0L
    val it = dataFiles(spark, path).iterator
    while (cnt < sampleSize && it.hasNext) {
      val f = it.next()
      taken = taken :+ f
      cnt += spark.read.textFile(f).count()
    }
    require(taken.nonEmpty, s"no data files under $path")
    spark.read.json(taken: _*).schema
  }

  /** Bounded-sample read: infer from the sample prefix, apply to the
    * full scan. Documents whose extra fields the sample missed still
    * parse (PERMISSIVE mode); those fields are silently absent — the
    * documented sampling-partitioner behavior the fixture pins. */
  def readSampled(spark: SparkSession, path: String,
      sampleSize: Long): DataFrame =
    spark.read.schema(inferSampledSchema(spark, path, sampleSize))
      .option("recursiveFileLookup", "true") // collections nest shards
      .json(path)

  /** Fingerprint of the source `documents` table's file listing
    * (name, length, mtime per data file): the build-if-absent marker is
    * keyed on THIS, not just the dir path, so a regenerated fixture at
    * the same path (the repo regenerates target/sf* fixtures routinely)
    * invalidates the stage instead of silently serving stale data —
    * the r14 advice. Driver-side listing only; never reads row data. */
  private def sourceStamp(spark: SparkSession, dir: String): String = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/documents.parquet")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile)
        parts += s"${f.getPath.getName}:${f.getLen}:${f.getModificationTime}"
    }
    java.security.MessageDigest.getInstance("MD5")
      .digest(parts.sorted.mkString("\n").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(16)
  }

  /** Stage the two-shard JSON collection fixture the bounded-sample
    * queries read (no document store exists in the sandbox — this
    * stands in for the collection, verdict r12 #2). Head shard
    * (doc_id % 5 ≠ 0): base fields only; tail shard adds `leadid` +
    * `extra_score`, so a sample that never leaves the head file
    * misses both. Build-if-absent behind a marker file, at a path
    * DERIVED FROM THE INPUT DIR — the registered queries are
    * read-only once staged, and concurrent sessions at different
    * scale factors can't overwrite each other mid-read (the r13
    * fixed-path hazard). The marker embeds a digest of the source
    * table's file listing (stale stages rebuild when the fixture is
    * regenerated) and is created ATOMICALLY (temp + rename) so two
    * processes racing past the exists check resolve safely: the
    * rename loser's build wrote the same content from the same
    * source. */
  def stageFixture(spark: SparkSession, dir: String): String = synchronized {
    val tag = dir.replaceAll("[^A-Za-z0-9._-]", "_")
    val base = s"/root/repo/target/stage/doc_collection/$tag"
    val coll = s"$base/coll"
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stamp = sourceStamp(spark, dir)
    val marker = new org.apache.hadoop.fs.Path(s"$base/_STAGED_$stamp")
    if (!fs.exists(marker)) {
      val docs = Tables.load(spark, dir, "documents")
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      docs.where(col("doc_id") % 5 =!= 0)
        .coalesce(1).write.mode("overwrite").json(s"$coll/a_head")
      docs.where(col("doc_id") % 5 === 0)
        .withColumn("leadid",
          concat(lit("L"), col("doc_id").cast("string")))
        .withColumn("extra_score",
          round(col("n_chars").cast("double") / 100.0, 2))
        .coalesce(1).write.mode("overwrite").json(s"$coll/b_tail")
      // clear markers from older fixture generations, then publish ours
      val stale = fs.globStatus(new org.apache.hadoop.fs.Path(s"$base/_STAGED_*"))
      if (stale != null) stale.foreach(m => fs.delete(m.getPath, false))
      val tmp = new org.apache.hadoop.fs.Path(
        s"$base/._staged_${ProcessHandle.current().pid()}.tmp")
      fs.create(tmp, true).close()
      if (!fs.rename(tmp, marker)) fs.delete(tmp, false)
    }
    coll
  }

  /** The reference's runtime column introspection (`PUSH:206`): the
    * read schema can't be trusted after bounded-sample inference, so
    * the leadid leg is chosen by looking at the ACTUAL columns —
    * present: normalize to string; absent: carry an explicit null
    * column so downstream document assembly keeps one shape. */
  def withLeadidGuard(df: DataFrame): DataFrame =
    if (df.columns.contains("leadid"))
      df.withColumn("leadid", col("leadid").cast("string"))
    else df.withColumn("leadid", lit(null).cast("string"))
}
