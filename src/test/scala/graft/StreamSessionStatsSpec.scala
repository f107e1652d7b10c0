package graft

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger

import graft.queries.Events
import graft.streaming.{Sessionize, StreamSessionStats}

class StreamSessionStatsSpec extends SparkSpec {

  test("streamed sessions roll up to exactly the batch session-stats table") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    // the batch gate sessionizes with a 30-minute gap over (ts_us,
    // event_id)-ordered events; feed the same events as a stream
    val input = Sessionize.eventsAsStreamInput(spark, sf)
      .select(col("user_id"), col("ts_us"), col("value"))
      .as[Sessionize.Event]
    val maxUs = input.agg(org.apache.spark.sql.functions.max("ts_us")).head().getLong(0)
    val farUs = maxUs + 365L * 86400L * 1000000L
    val sentinel = Seq(Sessionize.Event(-1L, farUs, 0.0))
    val dir = tmpDir("session_stats_stream_in")
    input.union(sentinel.toDS()).write.mode("overwrite").parquet(dir)

    val streamIn = spark.readStream.schema(input.schema).parquet(dir)
      .as[Sessionize.Event]
    val q = Sessionize.sessions(streamIn, gapSec = 1800L)
      .writeStream.format("memory").queryName("ss_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val emitted = spark.table("ss_out").filter(col("user_id") >= 0)
    val streamed = StreamSessionStats.stats(emitted)
      .select("user_id", "n_sessions", "n_events", "events_per_session_pm",
        "total_dur_us", "max_dur_us", "n_bounce")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().sorted
    val batch = Events.qSessionStats(spark, sf)
      .select("user_id", "n_sessions", "n_events", "events_per_session_pm",
        "total_dur_us", "max_dur_us", "n_bounce")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().sorted
    assert(streamed.length === batch.length)
    assert(streamed.toSeq === batch.toSeq)
  }
}
