package graft

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger

import graft.queries.Events
import graft.streaming.{StreamActiveUsers, StreamRetention}

class StreamActiveUsersSpec extends SparkSpec {

  test("streamed user-day rows aggregate to exactly the batch DAU/WAU table") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val input = StreamRetention.dayInput(spark, sf)
    val maxUs = input.agg(org.apache.spark.sql.functions.max("ts"))
      .head().getTimestamp(0).getTime * 1000L
    val farUs = maxUs + 365L * 86400L * 1000000L
    val sentinel = Seq(StreamRetention.DayEvent(-1L, farUs / 86400000000L,
      new java.sql.Timestamp(farUs / 1000L)))
    val dir = tmpDir("active_users_stream_in")
    input.union(sentinel.toDS()).write.mode("overwrite").parquet(dir)

    val streamIn = spark.readStream.schema(input.schema).parquet(dir)
      .as[StreamRetention.DayEvent]
    val q = StreamActiveUsers.userDays(streamIn)
      .writeStream.format("memory").queryName("au_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val emitted = spark.table("au_out").filter(col("user_id") >= 0)
    // exactly-once: the emitted stream IS the distinct (user, day) set
    val expectUd = input.select("user_id", "day").distinct()
      .as[(Long, Long)].collect().sorted
    assert(emitted.as[(Long, Long)].collect().sorted.toSeq === expectUd.toSeq)
    // and the stateless tail reproduces the gated batch table exactly
    val streamed = StreamActiveUsers.activeUsers(emitted)
      .as[(Long, Long, Long)].collect().sorted
    val batch = Events.qActiveUsers(spark, sf)
      .as[(Long, Long, Long)].collect().sorted
    assert(streamed.toSeq === batch.toSeq)
  }

  test("duplicate activity across batches still emits one row per (user, day)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val sq = spark
    implicit val sc = sq.sqlContext
    val mem = MemoryStream[StreamRetention.DayEvent]
    val day = 86400000000L
    def ev(d: Long, us: Long, user: Long = 1L) =
      StreamRetention.DayEvent(user, d, new java.sql.Timestamp((d * day + us) / 1000L))
    val query = StreamActiveUsers.userDays(mem.toDS(), "1 day")
      .writeStream.format("memory").queryName("au_dup_out")
      .outputMode("append").start()
    try {
      mem.addData(ev(3, 1000000L), ev(3, 2000000L)) // same day twice
      query.processAllAvailable()
      mem.addData(ev(3, 3000000L)) // and once more, next batch
      query.processAllAvailable()
      mem.addData(ev(400, 0L, user = 99L)) // sentinel finalizes day 3
      query.processAllAvailable()
      val out = spark.table("au_dup_out").filter(col("user_id") === 1L)
        .as[StreamActiveUsers.UserDay].collect()
      assert(out.toSeq === Seq(StreamActiveUsers.UserDay(1L, 3L)))
    } finally query.stop()
  }
}
