package graft.queries

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.multimodal.Multimodal
import graft.streaming.EventsStream

/** Multimodal plumbing + streaming fixtures, and the flagship pipeline
  * exposed as a rows-checked query.
  */
object PipelineQueries {

  /** Binary-column plumbing, oracle-checkable part: payload byte length
    * and metadata struct fields (DuckDB mirrors via encode()). */
  private val mmPlumbing = Q("q_mm_binary_plumbing",
    (s, dir) => {
      val media = Multimodal.asMedia(Tables.load(s, dir, "documents"))
      media.select(
        col("media_id"),
        col("meta.n_bytes").as("n_bytes"),
        col("meta.origin").as("origin"),
        col("meta.format").as("format"))
    },
    Some("""
      SELECT doc_id AS media_id,
        CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        source AS origin,
        'fake/utf8' AS format
      FROM documents"""))

  /** Partition-wise stub decode (mapPartitions over raw bytes). The mean
    * byte of ASCII text is still SQL-expressible, so even the stub's
    * output is oracle-checked: mean_byte = sum(codepoints)/len. */
  private val mmDecode = Q("q_mm_decode_features",
    (s, dir) => Multimodal.extractFeatures(
      Multimodal.asMedia(Tables.load(s, dir, "documents"))),
    Some("""
      WITH b AS (SELECT doc_id AS media_id,
          CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
          list_transform(string_split(text, ''), x -> ord(x)) AS cps
        FROM documents)
      SELECT media_id, n_bytes,
        CAST(n_bytes % 640 AS INTEGER) AS width,
        CAST((n_bytes * 7) % 480 AS INTEGER) AS height,
        CAST(list_sum(cps) AS DOUBLE) / n_bytes AS mean_byte
      FROM b"""))

  /** Structured Streaming end-to-end (file source → watermark → windowed
    * agg → memory sink, Trigger.AvailableNow) — same oracle as the batch
    * hourly query, proving stream/batch parity. */
  private val streamHourly = Q("q_stream_events_hourly",
    (s, dir) => EventsStream.hourlyAggregates(s, dir),
    Some("""
      SELECT date_trunc('hour', ts) AS hour_start, event_type,
        count(*) AS n,
        CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1, 2"""))

  /** foreachBatch streaming sink: stream → per-batch idempotent
    * partitioned parquet → read back; oracle checks the full event set
    * survived the trip (with the derived partition column). */
  private val streamSink = Q("q_stream_foreachbatch_sink",
    (s, dir) => graft.streaming.EventsStream.sinkViaForeachBatch(s, dir,
      "/root/repo/target/stage/q_stream_foreachbatch_sink")
      .select(col("event_id"), col("event_type"), col("value"),
        // DATE dtypes diverge across engines in pandas; compare as string
        col("event_date").cast("string").as("event_date")),
    Some("""
      SELECT event_id, event_type, value,
        strftime(ts, '%Y-%m-%d') AS event_date
      FROM events"""))

  /** Stream-stream join (watermarked both sides, time-range-bounded
    * state) — oracle is the equivalent batch join. */
  private val streamStream = Q("q_stream_stream_join",
    (s, dir) => graft.streaming.EventsStream.streamStreamJoin(s, dir),
    Some("""
      WITH clicks AS (SELECT event_id AS click_id, user_id, ts AS click_ts
                      FROM events WHERE event_type = 'click'),
           signups AS (SELECT event_id AS signup_id, user_id, ts AS signup_ts
                       FROM events WHERE event_type = 'signup')
      SELECT c.click_id, c.user_id, s.signup_id
      FROM clicks c JOIN signups s
        ON c.user_id = s.user_id
       AND c.click_ts >= s.signup_ts
       AND c.click_ts <= s.signup_ts + INTERVAL 1 HOUR"""))

  /** Flagship pipeline over the query-arg scale factor (rows-only: output
    * is deeply nested). */
  private val flagship = Q("q_flagship_pipeline",
    (s, dir) => graft.Flagship.prospectPipeline(s, dir),
    None)

  /** EP2 outbound push: delta-select + stage-out + validation (rows-only:
    * nested docs; the validation report is asserted in tests). */
  private val outbound = Q("q_outbound_push",
    (s, dir) => graft.Outbound.push(s, dir,
      "/root/repo/target/stage/q_outbound_push").docs,
    None)

  /** Frame sampling over binary payloads (video frame-sample analog):
    * fixed 64-byte frames, length + content hash per frame. md5 over
    * ascii payload bytes == md5 over the substring in the oracle. */
  private val mmFrames = Q("q_mm_frame_sample",
    (s, dir) => Multimodal.sampleFrames(
      Multimodal.asMedia(Tables.load(s, dir, "documents")), frameBytes = 64),
    Some("""
      WITH f AS (SELECT doc_id AS media_id, text,
          CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        FROM documents),
      idx AS (SELECT media_id, text,
          unnest(range(0, (n_bytes - 1) // 64 + 1)) AS frame_idx
        FROM f)
      SELECT media_id, frame_idx,
        CAST(octet_length(encode(substr(text, CAST(frame_idx * 64 + 1 AS INTEGER), 64))) AS BIGINT) AS frame_len,
        md5(substr(text, CAST(frame_idx * 64 + 1 AS INTEGER), 64)) AS frame_md5
      FROM idx"""))

  /** Stream-static enrichment join (stream events ⋈ static customer dim,
    * broadcast per micro-batch) — oracle is the batch equivalent. */
  private val streamEnrich = Q("q_stream_static_join",
    (s, dir) => graft.streaming.EventsStream.enrichedStream(s, dir),
    Some("""
      SELECT event_type, coalesce(c_mktsegment, 'NONE') AS segment,
        count(*) AS n
      FROM events LEFT JOIN customer ON user_id = c_custkey
      GROUP BY 1, 2"""))

  /** Resize stub: 1-in-4 byte downsample with length + content hash
    * (image-resize analog; oracle steps the string the same way). */
  private val mmResize = Q("q_mm_resize",
    (s, dir) => Multimodal.resize(
      Multimodal.asMedia(Tables.load(s, dir, "documents")), k = 4),
    Some("""
      WITH b AS (SELECT doc_id AS media_id, text,
          CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        FROM documents),
      r AS (SELECT media_id, n_bytes,
          list_aggr(list_transform(range(1, CAST(n_bytes AS INTEGER) + 1, 4),
            i -> substr(text, CAST(i AS INTEGER), 1)), 'string_agg', '') AS resized
        FROM b)
      SELECT media_id, n_bytes,
        CAST(octet_length(encode(resized)) AS BIGINT) AS resized_len,
        md5(resized) AS resized_md5
      FROM r"""))

  /** Streaming dedup (dropDuplicates inside the watermark) — oracle is
    * the batch distinct count. */
  private val streamDedup = Q("q_stream_dedup",
    (s, dir) => graft.streaming.EventsStream.dedupedCounts(s, dir),
    Some("""
      SELECT event_type, count(DISTINCT event_id) AS n_unique
      FROM events GROUP BY event_type"""))

  val all: Seq[Q] = Seq(mmPlumbing, mmDecode, mmFrames, mmResize,
    streamHourly, streamEnrich, streamDedup, streamSink, streamStream,
    flagship, outbound)
}
