package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.queries.Pipeline
import graft.streaming.StreamNearDedup
import graft.streaming.StreamNearDedup.Doc

/** Streaming near-dup (I4 × P52): watermark-finalized per-band
  * verdicts, reduced to the global earliest near-neighbor, must match
  * an exact batch oracle over the same (doc, ts) set — including
  * out-of-order and late arrivals within the watermark delay, and
  * horizon expiry. */
class StreamNearDedupSpec extends SparkSpec {

  private val base = 1700000000000000L // µs
  private val min_ = 60L * 1000000L // one minute in µs

  /** Exact oracle: earliest (ts, doc_id) neighbor at hamming ≤ 2
    * within the horizon, computed from the SAME signature expression. */
  private def oracle(docs: Seq[Doc], horizonUs: Long): Map[Long, (Long, Int)] = {
    val sq = spark
    import sq.implicits._
    val sigs = docs.toDF("doc_id", "text", "ts_us")
      .withColumn("sig", expr(Pipeline.simhashExpr))
      .select("doc_id", "ts_us", "sig")
      .as[(Long, Long, Long)].collect().sortBy(r => (r._2, r._1))
    sigs.flatMap { case (id, ts, sig) =>
      val cands = sigs.filter { case (cid, cts, csig) =>
        (cts < ts || (cts == ts && cid < id)) && cts >= ts - horizonUs &&
          java.lang.Long.bitCount(csig ^ sig) <= 2
      }
      if (cands.isEmpty) None
      else {
        val (cid, _, csig) = cands.minBy(c => (c._2, c._1))
        Some(id -> (cid, java.lang.Long.bitCount(csig ^ sig)))
      }
    }.toMap
  }

  private def runStream(name: String, batches: Seq[Seq[Doc]], horizonUs: Long,
                        delay: String): Map[Long, (Long, Int)] = {
    val sq = spark
    import sq.implicits._
    implicit val sc = sq.sqlContext
    val mem = MemoryStream[Doc]
    val query = StreamNearDedup.bandMatches(mem.toDS(), horizonUs, delay)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => mem.addData(b: _*); query.processAllAvailable() }
      StreamNearDedup.assignments(spark.table(name))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    } finally query.stop()
  }

  test("corpus slice: stream ≡ batch oracle under disorder + late data") {
    val sq = spark
    import sq.implicits._
    val texts = Tables.documents(spark, "/root/testdata/sf0.01")
      .orderBy("doc_id").limit(120)
      .select("doc_id", "text").as[(Long, String)].collect()
    // one doc per minute, delivered out of order: a mid-range block
    // arrives a full batch late (within the 45-minute delay)
    val docs = texts.zipWithIndex.map { case ((id, t), i) =>
      Doc(id, t, base + i * min_)
    }
    val rnd = new scala.util.Random(42) // fixed seed — reproducible disorder
    val late = docs.slice(35, 55)
    val batch1 = rnd.shuffle((docs.take(35) ++ docs.slice(55, 80)).toSeq)
    val batch2 = rnd.shuffle((late ++ docs.drop(80)).toSeq)
    // two movers: the watermark from batch N's max event time only
    // takes effect in batch N+1 (the StreamDedupSpec discipline)
    val movers = Seq(
      Seq(Doc(9999998L, "watermark mover text", base + 5000 * min_)),
      Seq(Doc(9999999L, "watermark mover two", base + 9000 * min_)))
    val horizon = 30 * min_
    val got = runStream("snd_corpus", Seq(batch1, batch2) ++ movers,
      horizon, "45 minutes")
    val want = oracle(docs.toSeq, horizon) // mover never finalizes
    assert(got == want)
    assert(want.nonEmpty)
    assert(want.values.exists(_._2 > 0), "corpus slice has no dist>0 match")
    assert(want.size < docs.length, "every doc matched — degenerate")
  }

  test("image face: stream ≡ batch dHash oracle under disorder + late data (r16)") {
    import graft.queries.{ImageDedup, Multimodal}
    import graft.streaming.StreamNearDedup.MediaDoc
    val sq = spark
    import sq.implicits._
    implicit val sc = sq.sqlContext
    // the P71 cross-codec corpus, streamed: one image per minute
    val payloads = ImageDedup.imagePayloadsPaired(spark, "/root/testdata/sf0.01")
      .orderBy("doc_id").limit(120)
      .as[Multimodal.MediaIn].collect()
    val docs = payloads.zipWithIndex.map { case (m, i) =>
      MediaDoc(m.doc_id, m.payload, base + i * min_)
    }
    val rnd = new scala.util.Random(43)
    val late = docs.slice(35, 55)
    val batch1 = rnd.shuffle((docs.take(35) ++ docs.slice(55, 80)).toSeq)
    val batch2 = rnd.shuffle((late ++ docs.drop(80)).toSeq)
    // a mover must still DECODE (the face fingerprints every arrival);
    // 9x8 is the smallest dHash-able geometry
    val moverPng = Multimodal.encodePngGray(9, 8, Array.fill(72)(0))
    val movers = Seq(
      Seq(MediaDoc(9999998L, moverPng, base + 5000 * min_)),
      Seq(MediaDoc(9999999L, moverPng, base + 9000 * min_)))
    val horizon = 30 * min_
    val mem = MemoryStream[MediaDoc]
    val query = StreamNearDedup.imageBandMatches(mem.toDS(), horizon, "45 minutes")
      .writeStream.format("memory").queryName("snd_image")
      .outputMode("append").start()
    val got = try {
      (Seq(batch1, batch2) ++ movers).foreach { b =>
        mem.addData(b: _*); query.processAllAvailable()
      }
      StreamNearDedup.assignments(spark.table("snd_image"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    } finally query.stop()
    // batch oracle: the same dHash kernel, earliest in-horizon neighbor
    // at hamming <= the BATCH operator's MaxDist
    val sigs = docs.map { m =>
      val (w, h, pix) = Multimodal.decodeGray(m.payload)
      (m.doc_id, m.ts_us, ImageDedup.dHash64(w, h, pix))
    }.sortBy(r => (r._2, r._1))
    val want = sigs.flatMap { case (id, ts, sig) =>
      val cands = sigs.filter { case (cid, cts, csig) =>
        (cts < ts || (cts == ts && cid < id)) && cts >= ts - horizon &&
          java.lang.Long.bitCount(csig ^ sig) <= ImageDedup.MaxDist
      }
      if (cands.isEmpty) None
      else {
        val (cid, _, csig) = cands.minBy(c => (c._2, c._1))
        Some(id -> (cid, java.lang.Long.bitCount(csig ^ sig)))
      }
    }.toMap
    assert(got == want)
    assert(want.nonEmpty, "no image near-dup verdict in the slice")
    assert(want.values.exists(_._2 > 0), "no dist>0 image match -- degenerate")
    assert(want.size < docs.length, "every image matched -- degenerate")
  }

  test("horizon expiry: an exact copy beyond the horizon is canonical") {
    val t = "alpha beta gamma delta"
    val docs = Seq(Doc(1, t, base), Doc(2, t, base + 5 * min_),
      Doc(3, t, base + 200 * min_))
    val movers = Seq(
      Seq(Doc(9999998L, "mover", base + 5000 * min_)),
      Seq(Doc(9999999L, "mover two", base + 9000 * min_)))
    val got = runStream("snd_horizon", Seq(docs) ++ movers, 60 * min_, "1 minute")
    // doc2 dups doc1 (dist 0, in horizon); doc3's copies are 195+ min
    // stale — canonical again
    assert(got == Map(2L -> (1L, 0)))
  }
}
