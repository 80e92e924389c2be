package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables
import graft.streaming.EventsStream
import graft.multimodal.Multimodal

class StreamingMultimodalSpec extends SparkSuite {

  test("streaming hourly agg ≡ batch hourly agg (stream/batch parity)") {
    val streamed = EventsStream.hourlyAggregates(spark, sf)
    val batch = Tables.load(spark, sf, "events")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(12, 2))).cast("double").as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("sum_value"))
    assert(streamed.except(batch).count() == 0)
    assert(batch.except(streamed).count() == 0)
  }

  test("multimodal: stub decode is deterministic and byte-exact for ascii") {
    val media = Multimodal.asMedia(Tables.load(spark, sf, "documents"))
    val feats = Multimodal.extractFeatures(media)
    // ascii text: payload bytes == n_chars
    val joined = feats.join(Tables.load(spark, sf, "documents"),
      col("media_id") === col("doc_id"))
    assert(joined.filter(col("n_bytes") =!= col("n_chars")).count() == 0)
    assert(feats.filter(col("mean_byte") <= 0 || col("mean_byte") >= 256).count() == 0)
  }
}
