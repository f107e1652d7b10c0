package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamDedup

/** Streaming dedup (I4 × P1): first-occurrence emission, duplicate
  * suppression within the horizon, summary rows on key expiry, and
  * batch parity of the keep-list. */
class StreamDedupSpec extends SparkSpec {

  private val base = 1700000000000000L // µs

  private def doc(id: Long, text: String, dtUs: Long): StreamDedup.Doc =
    StreamDedup.Doc(id, text, base + dtUs)

  test("dropDuplicatesWithinWatermark keeps one row per content hash") {
    val sq = spark
    import sq.implicits._
    implicit val sc = sq.sqlContext
    val mem = MemoryStream[StreamDedup.Doc]
    val query = StreamDedup.dropDupContent(mem.toDS(), "10 minutes")
      .writeStream.format("memory").queryName("ddw_out")
      .outputMode("append").start()
    try {
      mem.addData(doc(1, "alpha", 0), doc(2, "beta", 1000000),
        doc(3, "alpha", 2000000))
      query.processAllAvailable()
      mem.addData(doc(4, "alpha", 3000000), doc(5, "gamma", 4000000))
      query.processAllAvailable()
      val texts = spark.table("ddw_out").as[StreamDedup.Doc]
        .collect().map(_.text).sorted
      assert(texts.toSeq === Seq("alpha", "beta", "gamma"))
    } finally query.stop()
  }

  test("firstSeen emits firsts immediately and summaries on expiry") {
    val sq = spark
    import sq.implicits._
    implicit val sc = sq.sqlContext
    val mem = MemoryStream[StreamDedup.Doc]
    val query = StreamDedup.firstSeen(mem.toDS(), horizonMs = 60000)
      .writeStream.format("memory").queryName("fs_out")
      .outputMode("append").start()
    try {
      mem.addData(doc(1, "alpha", 0), doc(2, "alpha", 1000000),
        doc(3, "beta", 2000000))
      query.processAllAvailable()
      val firsts = spark.table("fs_out").as[StreamDedup.DedupOut]
        .collect().filter(_.kind == "first")
      assert(firsts.map(o => (o.doc_id, o.dups)).sorted.toSeq === Seq((1L, 0L), (3L, 0L)))
      // advance the watermark past alpha's horizon (first at t0,
      // horizon 60s): its summary must report 1 suppressed duplicate
      mem.addData(doc(9, "mover", 600L * 1000000))
      query.processAllAvailable()
      mem.addData(doc(10, "mover2", 1200L * 1000000))
      query.processAllAvailable()
      val summaries = spark.table("fs_out").as[StreamDedup.DedupOut]
        .collect().filter(_.kind == "summary")
      val alpha = summaries.find(_.doc_id == 1L)
      assert(alpha.exists(_.dups == 1L), summaries.mkString(", "))
    } finally query.stop()
  }

  test("streaming keep-list matches the batch exact-dedup oracle") {
    val sq = spark
    import sq.implicits._
    implicit val sc = sq.sqlContext
    val docs = (0 until 300).map { i =>
      doc(i.toLong, s"text-${i % 90}", i.toLong * 1000)
    }
    val mem = MemoryStream[StreamDedup.Doc]
    val query = StreamDedup.firstSeen(mem.toDS(), horizonMs = 1L << 40)
      .writeStream.format("memory").queryName("fsb_out")
      .outputMode("append").start()
    try {
      docs.grouped(75).foreach { g => mem.addData(g: _*); query.processAllAvailable() }
      val streamed = spark.table("fsb_out").as[StreamDedup.DedupOut]
        .collect().filter(_.kind == "first")
        .map(o => (o.h, o.doc_id)).sorted.toSeq
      val batch = StreamDedup.batchFirsts(spark.createDataset(docs))
        .collect().map(o => (o.h, o.doc_id)).sorted.toSeq
      assert(streamed === batch)
      assert(streamed.length === 90)
    } finally query.stop()
  }
}
