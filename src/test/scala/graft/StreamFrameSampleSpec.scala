package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.queries.Multimodal
import graft.streaming.StreamFrameSample
import graft.streaming.StreamFrameSample.VideoEvent

/** The streaming frame-sampling path must be bit-identical to the
  * batch one: per-frame checksum rows equal `q_frame_sample`'s
  * construction on the same AVI payloads (idx1-seek + real decode
  * inside micro-batches), the per-window audit equals the batch
  * aggregate, the per-frame face stays stateless, and a corrupt
  * container fails with the doc-id-carrying message.
  */
class StreamFrameSampleSpec extends SparkSpec {

  private val winUs = 60L * 1000000

  private def mkEvents: Seq[VideoEvent] = (0 until 40).map { i =>
    val id = i.toLong
    val w = (id % 13 + 6).toInt
    val h = (id % 9 + 5).toInt
    VideoEvent(id, Multimodal.buildAvi(id, (id % 5 + 1).toInt, w, h),
      (id % 3) * winUs + (id * 991L) % winUs)
  }

  test("streamed frame rows and window audit are bit-identical to batch") {
    import spark.implicits._
    val events = mkEvents
    val dir = tmpDir("frame_stream_in")
    events.toDS().repartition(3).write.mode("overwrite").parquet(dir)

    val streamIn = spark.readStream.schema(events.toDS().schema)
      .option("maxFilesPerTrigger", 1).parquet(dir).as[VideoEvent]
    val q = StreamFrameSample.frames(streamIn)
      .writeStream.format("memory").queryName("frame_rows")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val got = spark.table("frame_rows")
      .as[(Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    val want = StreamFrameSample.frames(events.toDS())
      .as[(Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got === want && got.nonEmpty)
    // and the batch face equals q_frame_sample's exact construction
    got.foreach { case (id, f, w, h, sig, _) =>
      assert(f % 2 === 0)
      assert((w, h) === (((id % 13 + 6), (id % 9 + 5))))
      val expect = (0 until (w * h).toInt).map(i =>
        Multimodal.pixFormula((i % w).toInt, (i / w).toInt, id, f.toInt)
          .toLong * (i + 1)).sum
      assert(sig === expect, s"doc $id frame $f")
    }
    // every doc contributes exactly ceil(nFrames / 2) sampled frames
    val byDoc = got.groupBy(_._1)
    events.foreach { e =>
      assert(byDoc(e.doc_id).length === ((e.doc_id % 5 + 1).toInt + 1) / 2)
    }
    // stateless: no stateful operator in the per-frame plan
    assert(q.lastProgress.stateOperators.isEmpty)
  }

  test("per-window audit matches the batch aggregate; one stateful operator") {
    import spark.implicits._
    val events = mkEvents
    val dir = tmpDir("frame_audit_in")
    events.toDS().repartition(3).write.mode("overwrite").parquet(dir)
    Thread.sleep(1200)
    Seq(VideoEvent(-1L, Multimodal.buildAvi(-1L & 0x7fffffffL, 1, 6, 5),
      365L * 86400L * 1000000L))
      .toDS().write.mode("append").parquet(dir)

    val streamIn = spark.readStream.schema(events.toDS().schema)
      .option("maxFilesPerTrigger", 1).parquet(dir).as[VideoEvent]
    val q = StreamFrameSample.audit(streamIn, "1 minute",
        watermarkDelay = "3 minutes")
      .writeStream.format("memory").queryName("frame_audit")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val got = spark.table("frame_audit")
      .filter(col("window_start_us") < 3 * winUs)
      .as[(Long, Long, Long, Long, Long)].collect().sorted.toSeq
    val want = StreamFrameSample.frames(events.toDS())
      .groupBy(((col("ts_us") / winUs).cast("long") * winUs).as("window_start_us"))
      .agg(sum(when(col("frame_no") === 0, 1L).otherwise(0L)).as("n_videos"),
        count(lit(1)).as("n_frames"),
        sum(col("width") * col("height")).as("px_decoded"),
        sum(col("frame_sig")).as("sum_frame_sig"))
      .as[(Long, Long, Long, Long, Long)].collect().sorted.toSeq
    assert(got === want)
    assert(got.map(_._2).sum === 40L) // every video counted exactly once
    assert(q.lastProgress.stateOperators.length === 1)
  }

  test("a corrupt container inside a batch fails with the doc id, not a bounds error") {
    import spark.implicits._
    val bad = Multimodal.buildAvi(7L, 3, 8, 8).take(40)
    val ds = Seq(VideoEvent(7L, bad, 0L)).toDS()
    val e = intercept[Exception] {
      StreamFrameSample.frames(ds).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("doc_id=7")), messages(e).mkString(" | "))
  }
}
