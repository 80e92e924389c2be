package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.sources.Tables
import graft.streaming.Sessionize

class SessionizeSpec extends SparkSuite {
  import spark.implicits._

  test("batch sessionization: per-user event counts are preserved") {
    val ev = Tables.load(spark, sf, "events")
    val sessions = Sessionize.batch(ev)
    assert(sessions.agg(org.apache.spark.sql.functions.sum("n_events"))
      .head().getLong(0) == ev.count())
  }

  test("streaming sessionization closes a session across batches") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[Sessionize.Event]
    val q = Sessionize.sessionizeStream(mem.toDS())
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("sessions_out").start()
    def t(min: Long) = new Timestamp(min * 60000L)
    // batch 1: user 1 has two close events (one open session)
    mem.addData(Sessionize.Event(1L, t(0)), Sessionize.Event(1L, t(5)))
    q.processAllAvailable()
    assert(spark.table("sessions_out").count() == 0) // still open
    // batch 2: an event past the 30-min gap closes it
    mem.addData(Sessionize.Event(1L, t(90)))
    q.processAllAvailable()
    val done = spark.table("sessions_out")
      .as[Sessionize.Session].collect()
    q.stop()
    assert(done.length == 1)
    assert(done.head.n_events == 2)
    assert(done.head.session_start == t(0) && done.head.session_end == t(5))
  }
}
