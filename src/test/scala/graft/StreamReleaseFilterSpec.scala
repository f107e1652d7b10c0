package graft

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger

import graft.queries.Pipeline
import graft.streaming.StreamReleaseFilter
import graft.streaming.StreamReleaseFilter.{DocEvent, Decision}

class StreamReleaseFilterSpec extends SparkSpec {

  test("streamed release decisions equal the batch q_release_filter table") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    // arrival order independent of doc_id: interleave by a hash of the
    // id so canonicality genuinely exercises the min-tracking
    val input = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "text",
        "1000000 + (doc_id * 2654435761) % 1000000 AS ts_us")
      .as[DocEvent]
    val far = DocEvent(-1L, "sentinel", 365L * 86400L * 1000000L)
    val dir = tmpDir("release_stream_in")
    input.union(Seq(far).toDS()).write.mode("overwrite").parquet(dir)

    val streamIn = spark.readStream.schema(input.schema).parquet(dir)
      .as[DocEvent]
    val q = StreamReleaseFilter.decisions(streamIn, horizonMs = 60000L)
      .writeStream.format("memory").queryName("release_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val streamed = spark.table("release_out").filter(col("doc_id") >= 0)
      .as[Decision].collect().sortBy(_.doc_id)
    val batch = Pipeline.qReleaseFilter(spark, sf)
      .as[Decision].collect().sortBy(_.doc_id)
    assert(streamed.length === batch.length)
    assert(streamed.toSeq === batch.toSeq)
    // sanity: the gate genuinely discriminates at this SF
    assert(batch.exists(_.keep == 1) && batch.exists(_.keep == 0))
  }

  test("late duplicate within the horizon steals canonicality; each doc emits once") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val sq = spark
    implicit val sc = sq.sqlContext
    val mem = MemoryStream[DocEvent]
    // doc 10 arrives first, doc 2 (same text → same hash) arrives in a
    // LATER batch but within the horizon: 2 must become canonical
    val text = "the quick brown fox and the lazy dog were friends"
    val query = StreamReleaseFilter.decisions(mem.toDS(), horizonMs = 3600000L)
      .writeStream.format("memory").queryName("release_dup_out")
      .outputMode("append").start()
    try {
      mem.addData(DocEvent(10L, text, 1000000L))
      query.processAllAvailable()
      mem.addData(DocEvent(2L, text, 2000000L))
      query.processAllAvailable()
      // sentinel far past the horizon finalizes the group
      mem.addData(DocEvent(99L, "zzz unique sentinel zzz", 10L * 3600L * 1000000L))
      query.processAllAvailable()
      val out = spark.table("release_dup_out")
        .filter(col("doc_id").isin(10L, 2L)).as[Decision].collect()
        .sortBy(_.doc_id)
      assert(out.length === 2)
      assert(out(0).doc_id === 2L && out(0).is_canonical === 1)
      assert(out(1).doc_id === 10L && out(1).is_canonical === 0)
    } finally query.stop()
  }
}
