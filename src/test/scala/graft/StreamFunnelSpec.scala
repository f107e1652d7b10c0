package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger

import graft.queries.Events
import graft.streaming.StreamFunnel

class StreamFunnelSpec extends SparkSpec {

  test("file-source streaming funnel equals the batch depth-3 funnel") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val input = StreamFunnel.funnelInput(spark, sf)
    // sentinel far past every real event: advances the final watermark
    // so every real event finalizes (completion emits on watermark
    // passage, unlike the eager-emission operators)
    val maxUs = input.agg(org.apache.spark.sql.functions.max("ts_us"))
      .head().getLong(0)
    val sentinel = Seq(StreamFunnel.FEvent(-1L, maxUs + 86400L * 1000000L, 1,
      new java.sql.Timestamp((maxUs + 86400L * 1000000L) / 1000L)))
    val dir = tmpDir("funnel_stream_in")
    input.union(sentinel.toDS()).write.mode("overwrite").parquet(dir)

    val streamIn = spark.readStream.schema(input.schema).parquet(dir)
      .as[StreamFunnel.FEvent]
    val q = StreamFunnel.completedFunnels(streamIn)
      .writeStream.format("memory").queryName("funnel_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("funnel_out").as[StreamFunnel.Funnel]
      .collect().filter(_.user_id >= 0)
      .map(f => (f.user_id, f.t1_us, f.t2_us, f.t3_us)).sorted

    val batch = Events.qFunnel(spark, sf)
      .filter(col("depth") === 3)
      .select("user_id", "t1_us", "t2_us", "t3_us")
      .as[(Long, Long, Long, Long)].collect().sorted
    assert(streamed.length === batch.length)
    assert(streamed.toSeq === batch.toSeq)
  }

  test("random streams at random batch splits always equal the batch funnel") {
    import spark.implicits._
    val sq = spark
    implicit val sc = sq.sqlContext
    (0 until 5).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val base = 1700000000000000L
      // distinct strictly-increasing timestamps so batch boundaries
      // never split a tie (a 0s watermark would drop the second half)
      val events = (0 until 300).map { i =>
        val user = rnd.nextInt(20).toLong
        val step = rnd.nextInt(3) + 1
        val us = base + i * 1000000L
        StreamFunnel.FEvent(user, us, step, new java.sql.Timestamp(us / 1000))
      }
      // reference: min-after-previous per user over the full stream
      val expect = events.groupBy(_.user_id).flatMap { case (u, es) =>
        val sorted = es.sortBy(_.ts_us)
        val t1 = sorted.find(_.step == 1).map(_.ts_us)
        val t2 = t1.flatMap(a => sorted.find(e => e.step == 2 && e.ts_us > a).map(_.ts_us))
        val t3 = t2.flatMap(b => sorted.find(e => e.step == 3 && e.ts_us > b).map(_.ts_us))
        t3.map(c => (u, t1.get, t2.get, c))
      }.toSeq.sorted

      val mem = MemoryStream[StreamFunnel.FEvent]
      val query = StreamFunnel.completedFunnels(mem.toDS(), "0 seconds")
        .writeStream.format("memory").queryName(s"funnel_rand_$seed")
        .outputMode("append").start()
      try {
        // chronological random splits; shuffle WITHIN each batch (the
        // operator buffers and replays event-time order)
        var rest = events
        while (rest.nonEmpty) {
          val n = 1 + rnd.nextInt(60)
          val (batch, tail) = rest.splitAt(n)
          mem.addData(rnd.shuffle(batch): _*)
          query.processAllAvailable()
          rest = tail
        }
        // sentinel flushes the final watermark past every real event
        val far = base + 10L * 86400L * 1000000L
        mem.addData(StreamFunnel.FEvent(-1L, far, 1,
          new java.sql.Timestamp(far / 1000)))
        query.processAllAvailable()
        val got = spark.table(s"funnel_rand_$seed").as[StreamFunnel.Funnel]
          .collect().filter(_.user_id >= 0)
          .map(f => (f.user_id, f.t1_us, f.t2_us, f.t3_us)).sorted
        assert(got.toSeq === expect, s"seed=$seed")
      } finally query.stop()
    }
  }

  test("completion emits once and later events cannot start a second chain") {
    import spark.implicits._
    val sq = spark
    implicit val sc = sq.sqlContext
    val mem = MemoryStream[StreamFunnel.FEvent]
    val query = StreamFunnel.completedFunnels(mem.toDS(), "0 seconds")
      .writeStream.format("memory").queryName("funnel_once_out")
      .outputMode("append").start()
    try {
      val base = 1700000000000000L
      def ev(us: Long, step: Int, user: Long = 1L) =
        StreamFunnel.FEvent(user, us, step, new java.sql.Timestamp(us / 1000))
      // click before the first view must not advance the funnel
      mem.addData(ev(base, 2), ev(base + 1000000, 1), ev(base + 2000000, 2),
        ev(base + 3000000, 3))
      query.processAllAvailable()
      // watermark still at base+3s: nothing finalized past t3 yet;
      // push it forward so the chain completes
      mem.addData(ev(base + 60000000, 1, user = 99))
      query.processAllAvailable()
      // a second full chain for user 1 must NOT emit again
      mem.addData(ev(base + 70000000, 1), ev(base + 71000000, 2),
        ev(base + 72000000, 3), ev(base + 200000000, 1, user = 98))
      query.processAllAvailable()
      val out = spark.table("funnel_once_out").as[StreamFunnel.Funnel].collect()
      assert(out.count(_.user_id == 1L) === 1, out.mkString(", "))
      val f = out.find(_.user_id == 1L).get
      assert((f.t1_us, f.t2_us, f.t3_us) ===
        ((base + 1000000, base + 2000000, base + 3000000)))
    } finally query.stop()
  }
}
