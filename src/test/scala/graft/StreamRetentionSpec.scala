package graft

import org.apache.spark.sql.functions.{col, count, lit}
import org.apache.spark.sql.streaming.Trigger

import graft.queries.Events
import graft.streaming.StreamRetention

class StreamRetentionSpec extends SparkSpec {

  test("streamed activity rows aggregate to exactly the batch retention table") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val input = StreamRetention.dayInput(spark, sf)
    val maxUs = input.agg(org.apache.spark.sql.functions.max("ts"))
      .head().getTimestamp(0).getTime * 1000L
    // sentinel a year out flushes the final watermark past every day
    val farUs = maxUs + 365L * 86400L * 1000000L
    val sentinel = Seq(StreamRetention.DayEvent(-1L, farUs / 86400000000L,
      new java.sql.Timestamp(farUs / 1000L)))
    val dir = tmpDir("retention_stream_in")
    input.union(sentinel.toDS()).write.mode("overwrite").parquet(dir)

    val streamIn = spark.readStream.schema(input.schema).parquet(dir)
      .as[StreamRetention.DayEvent]
    val q = StreamRetention.activity(streamIn)
      .writeStream.format("memory").queryName("retention_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val streamed = spark.table("retention_out")
      .filter(col("user_id") >= 0)
      .groupBy("cohort", "day_offset").agg(count(lit(1)).as("n_users"))
      .as[(Long, Long, Long)].collect().sorted
    val batch = Events.qRetention(spark, sf)
      .as[(Long, Long, Long)].collect().sorted
    assert(streamed.length === batch.length)
    assert(streamed.toSeq === batch.toSeq)
  }

  test("cohort waits for the watermark: an in-watermark earlier day wins") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val sq = spark
    implicit val sc = sq.sqlContext
    val mem = MemoryStream[StreamRetention.DayEvent]
    val day = 86400000000L
    def ev(d: Long, us: Long, user: Long = 1L) =
      StreamRetention.DayEvent(user, d, new java.sql.Timestamp((d * day + us) / 1000L))
    val query = StreamRetention.activity(mem.toDS(), "2 days")
      .writeStream.format("memory").queryName("retention_wm_out")
      .outputMode("append").start()
    try {
      // day 3 arrives first; day 2 arrives later but within the 2-day
      // watermark: the cohort must still be 2, NOT 3 — eager emission
      // would have pinned 3
      mem.addData(ev(3, 1000000L))
      query.processAllAvailable()
      mem.addData(ev(2, 2000000L))
      query.processAllAvailable()
      // sentinel far ahead finalizes both days
      mem.addData(ev(400, 0L, user = 99L))
      query.processAllAvailable()
      val out = spark.table("retention_wm_out")
        .filter(col("user_id") === 1L)
        .as[StreamRetention.Activity].collect().sortBy(_.day_offset)
      assert(out.map(a => (a.cohort, a.day_offset)).toSeq ===
        Seq((2L, 0L), (2L, 1L)), out.mkString(", "))
    } finally query.stop()
  }
}
