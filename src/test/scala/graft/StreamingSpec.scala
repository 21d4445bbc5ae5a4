package graft

import graft.streaming.EventStream
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkFunSuite {
  import spark.implicits._

  test("streaming windowed aggregate over events parquet equals batch result") {
    val dir = "/root/testdata/sf0.001"
    val q = EventStream.runToMemory(spark, dir, "stream_daily", "1 day")
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("stream_daily")
      .select(date_format(col("window_start"), "yyyy-MM-dd").as("day"),
        col("event_type"), col("n"))
    val batch = Tables.events(spark, dir)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    assert(collectSorted(streamed) == collectSorted(batch))
    assert(streamed.count() > 0)
  }

  test("sliding windows emit overlapping buckets") {
    val events = Seq(
      (0L, java.sql.Timestamp.valueOf("2024-01-01 00:10:00"), 1L, "click", 1.0),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:40:00"), 1L, "click", 1.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = EventStream.windowedAggregate(events, "1 hour", Some("30 minutes"),
      watermark = "0 seconds")
    // batch mode: event 0 ∈ [23:30,00:30),[00:00,01:00); event 1 ∈ [00:30,01:30),[00:00,01:00)
    val counts = out.select(
      date_format(col("window_start"), "HH:mm").as("s"), col("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("00:00") == 2L)
    assert(counts("23:30") == 1L)
    assert(counts("00:30") == 1L)
  }

  test("sessionization groups events by inactivity gap per user") {
    val mk = (id: Long, t: String, u: Long) =>
      EventStream.Event(id, java.sql.Timestamp.valueOf(t), u, "e", 1.0)
    val events = Seq(
      mk(0, "2024-01-01 00:00:00", 1), mk(1, "2024-01-01 00:10:00", 1),
      mk(2, "2024-01-01 02:00:00", 1), // > 30min gap → new session
      mk(3, "2024-01-01 00:05:00", 2)
    ).toDS()
    val sessions = EventStream.sessionize(events).collect().sortBy(s => (s.user_id, s.session_start.getTime))
    assert(sessions.length == 3)
    assert(sessions(0).n_events == 2 && sessions(0).user_id == 1)
    assert(sessions(1).n_events == 1)
    assert(sessions(2).user_id == 2 && sessions(2).total_value == 1.0)
  }
}
