package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines.
  *
  * Model: media (image/audio/video) travels as an opaque `binary` column
  * plus a typed metadata struct; decode / feature-extraction runs
  * batch-wise over partitions (the Scala analogue of a Pandas-UDF
  * `mapInPandas` stage). The container has no image/audio codecs, so the
  * DECODE STEP IS A DETERMINISTIC STUB (`fakeDecode`) — the Spark-side
  * plumbing (schema, binary handling, partition-wise batching, output
  * shape) is real and is what these fixtures test. Swap `fakeDecode`
  * for a JNI/codec call in production.
  */
object Multimodal {

  /** Wrap documents as fake media rows: the text bytes play the role of
    * an encoded image payload. */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("payload"),
      struct(
        length(col("text").cast("binary")).cast("long").as("n_bytes"),
        col("source").as("origin"),
        lit("fake/utf8").as("format")).as("meta"))

  /** STUB decode: deterministic pseudo-features from the payload bytes —
    * stands in for image decode + resize + embed. Runs per-partition
    * over the raw bytes, exactly where a real codec would. */
  private def fakeDecode(payload: Array[Byte]): (Int, Int, Double) = {
    val n = payload.length
    var sum = 0L
    var i = 0
    while (i < n) { sum += payload(i) & 0xff; i += 1 }
    val mean = if (n == 0) 0.0 else sum.toDouble / n
    (n % 640, (n * 7) % 480, mean) // fake width / height / mean "pixel"
  }

  private val featSchema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("n_bytes", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("mean_byte", DoubleType)))

  /** Frame sampling: slice the payload into fixed-size frames (the video
    * frame-sample analog) — pure expression work (sequence + transform +
    * explode), so it stays columnar and shuffle-free at any scale.
    *
    * Edge semantics: an EMPTY payload yields ZERO frames — the trailing
    * `filter(f.idx * frameBytes < n_bytes)` drops the phantom frame that
    * `sequence(0, (0-1) DIV k) = [0]` would otherwise emit (and is a
    * no-op for every non-empty payload, whose last frame always starts
    * before n_bytes). Frames are BYTE slices of the binary payload; the
    * DuckDB oracle slices characters, so fixtures must stay ASCII
    * (asserted in tests) — byte- and char-slicing coincide there. */
  def sampleFrames(media: DataFrame, frameBytes: Int): DataFrame =
    media
      .select(col("media_id"), col("payload"), col("meta.n_bytes").as("n_bytes"))
      .withColumn("frame", explode(expr(
        s"filter(transform(sequence(0, CAST((n_bytes - 1) DIV $frameBytes AS INT)), " +
          s"i -> struct(i AS idx, substring(payload, i * $frameBytes + 1, $frameBytes) AS bytes)), " +
          s"f -> f.idx * $frameBytes < n_bytes)")))
      .select(col("media_id"),
        col("frame.idx").cast("long").as("frame_idx"),
        length(col("frame.bytes")).cast("long").as("frame_len"),
        md5(col("frame.bytes")).as("frame_md5"))

  /** Resize stub: deterministic 1-in-k byte downsample of the payload
    * (stands in for image resize; swap for a real scaler in production).
    * Expression-only — sequence/transform/concat — so it runs inside
    * whole-stage codegen. */
  def resize(media: DataFrame, k: Int): DataFrame =
    media
      .select(col("media_id"), col("payload"), col("meta.n_bytes").as("n_bytes"))
      .withColumn("resized", expr(
        s"concat_ws('', transform(sequence(1, CAST(n_bytes AS INT), $k), " +
          "i -> CAST(substring(payload, i, 1) AS STRING)))"))
      .select(col("media_id"), col("n_bytes"),
        length(col("resized")).cast("long").as("resized_len"),
        md5(col("resized")).as("resized_md5"))

  /** End-to-end multimodal curation — the media twin of the text leg's
    * `q_pretrain_full` composition: ingest → stub decode → quality gate
    * → frame sampling → cross-media exact frame dedup → keep decision.
    *
    * Stages (all existing operators, wired once):
    *  1. [[asMedia]] — binary payload + typed metadata;
    *  2. [[extractFeatures]] — partition-wise stub decode (the
    *     mapPartitions site a real codec would occupy);
    *  3. quality gate on DECODED features (payload ≥ `minBytes` —
    *     the corrupt/blank-asset filter), applied BEFORE the frame
    *     explode so the expensive stage only sees survivors;
    *  4. [[sampleFrames]] — fixed-`frameBytes` frames per asset;
    *  5. cross-media repeated-frame profile (the ExactSubstr analog
    *     for video): a frame hash occurring in >1 asset marks its
    *     occurrences duplicated; per asset, the duplicated-frame
    *     fraction and `keep = dup_frac < maxDupFrac`.
    *
    * Scale shape: one frame-hash groupBy + one semi join back + two
    * per-asset groupBys — every shuffle key-partitioned, fan-out
    * bounded by frames-per-asset, no all-pairs stage. The frame set is
    * consumed three times, so it is scope-persisted. */
  def curationPipeline(docs: DataFrame, frameBytes: Int = 64,
      minBytes: Long = 64, maxDupFrac: Double = 0.5): DataFrame = {
    val media = graft.CacheScope.persist(asMedia(docs))
    val gated = extractFeatures(media).filter(col("n_bytes") >= minBytes)
    val frames = graft.CacheScope.persist(
      sampleFrames(
        media.join(gated.select(col("media_id")), Seq("media_id"), "left_semi"),
        frameBytes))
    val dupHashes = frames.groupBy(col("frame_md5"))
      .agg(countDistinct(col("media_id")).as("nm"))
      .filter(col("nm") > 1)
      .select(col("frame_md5"))
    val nDup = frames.join(dupHashes, Seq("frame_md5"), "left_semi")
      .groupBy(col("media_id")).agg(count(lit(1)).as("n_dup"))
    val nFrames = frames.groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_frames"))
    val frac = coalesce(col("n_dup"), lit(0L)).cast("double") / col("n_frames")
    gated.join(nFrames, Seq("media_id"))
      .join(nDup, Seq("media_id"), "left")
      .select(col("media_id"), col("n_bytes"), col("width"), col("height"),
        col("mean_byte"), col("n_frames"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup_frames"),
        round(frac, 6).as("dup_frame_frac"),
        (frac < lit(maxDupFrac)).as("keep"))
  }

  /** Partition-wise feature extraction over the binary payload. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val enc = org.apache.spark.sql.Encoders.row(featSchema)
    media.select(col("media_id"), col("payload"), col("meta.n_bytes"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          val (w, h, m) = fakeDecode(payload)
          Row(id, r.getLong(2), w, h, m)
        }
      }(enc)
  }
}
