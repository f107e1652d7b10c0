package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.queries.Multimodal

/** Streaming video-frame sampling (I4 × P11b, r14): the continuous
  * face of `q_frame_sample` — each arriving payload is a REAL RIFF
  * AVI container, the sampler seeks to every `stride`-th frame via
  * the `idx1` index (unsampled frames' bytes never touched), decodes
  * it with the batch codec path, and emits the exact
  * `(frame_no, width, height, frame_sig)` checksum row construction
  * the batch query gates.
  *
  * Scale/state story (the StreamThumbnail discipline): container
  * parse + seek + decode run as a STATELESS per-row flatMap inside
  * the micro-batch — frames never enter state, pixels never shuffle,
  * only the narrow checksum rows leave the map.  The windowed audit
  * keeps one 4-long row per open window regardless of video size or
  * arrival rate.  A corrupt container fails the task with the
  * doc_id-carrying `sampleFrames` message, not a raw bounds error.
  */
object StreamFrameSample {

  final case class VideoEvent(doc_id: Long, payload: Array[Byte], ts_us: Long)

  /** Per-frame face: one row per sampled+decoded frame — the exact
    * [[Multimodal.qFrameSample]] columns plus event time.  Stateless;
    * works on a streaming OR batch Dataset. */
  def frames(media: Dataset[VideoEvent], stride: Int = 2): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { m =>
      Multimodal.sampleFrames(m.payload, stride, ctx = s"doc_id=${m.doc_id}")
        .map { case (f, png) =>
          val (w, h, pix) = Multimodal.decodeGray(png)
          var sig = 0L
          var i = 0
          while (i < pix.length) { sig += pix(i).toLong * (i + 1); i += 1 }
          (m.doc_id, f.toLong, w.toLong, h.toLong, sig, m.ts_us)
        }
    }).toDF("doc_id", "frame_no", "width", "height", "frame_sig", "ts_us")
  }

  /** Per-window audit face: `(window_start_us, n_videos, n_frames,
    * px_decoded, sum_frame_sig)` — the live decode-integrity counters
    * a video-ingest pipeline alerts on.  State per window: one row. */
  def audit(media: Dataset[VideoEvent], windowDur: String,
            watermarkDelay: String = "0 seconds", stride: Int = 2): DataFrame =
    frames(media, stride)
      .withColumn("ts", expr("timestamp_micros(ts_us)"))
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDur))
      // frame 0 is ALWAYS sampled (0 % stride == 0), so counting
      // frame-0 rows counts videos exactly — streaming disallows
      // distinct aggregates, and this needs no extra state
      .agg(sum(when(col("frame_no") === 0, 1L).otherwise(0L)).as("n_videos"),
        count(lit(1)).as("n_frames"),
        sum(col("width") * col("height")).as("px_decoded"),
        sum(col("frame_sig")).as("sum_frame_sig"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("n_videos"), col("n_frames"), col("px_decoded"),
        col("sum_frame_sig"))
}
