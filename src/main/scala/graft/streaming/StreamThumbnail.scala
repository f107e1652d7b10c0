package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.queries.Multimodal

/** Streaming media ingest with REAL pixel decode (I4 × P11, r13): the
  * continuous face of `q_thumbnail` — each arriving payload is
  * ImageIO-decoded, aspect-fit average-pooled with the exact batch
  * kernel ([[Multimodal.poolGray]]), and summarized per tumbling
  * window as a live pixel-audit row.
  *
  * Scale/state story: the decode is a STATELESS per-row map inside
  * the micro-batch (pixels never enter state, never shuffle — only
  * the 5 checksum longs leave the map), and the windowed aggregate
  * keeps one 5-long row per open window, so the state store is
  * windows-bounded regardless of arrival rate or image size.  The
  * per-image face reuses `q_thumbnail`'s exact integer checksums, so
  * streamed rows are bit-identical to the batch query on the same
  * payloads — parity is pinned in StreamThumbnailSpec, per image AND
  * per window.
  */
object StreamThumbnail {

  final case class MediaEvent(doc_id: Long, payload: Array[Byte], ts_us: Long)

  /** Per-image face: one row per decoded payload — `(doc_id, width,
    * height, thumb_w, thumb_h, pix_sum, pix_hash, ts_us)`, the exact
    * [[Multimodal.qThumbnail]] columns plus the event time.  Works on
    * a streaming OR batch Dataset (stateless). */
  def thumbs(media: Dataset[MediaEvent], box: Int = Multimodal.ThumbBox): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { m =>
      val (w, h, pix) = Multimodal.decodeGray(m.payload)
      val (tw, th) = Multimodal.thumbDims(w, h, box)
      val pooled = Multimodal.poolGray(w, h, pix, tw, th)
      var sum = 0L
      var hash = 0L
      var i = 0
      while (i < pooled.length) {
        sum += pooled(i); hash += pooled(i).toLong * (i + 1); i += 1
      }
      (m.doc_id, w.toLong, h.toLong, tw.toLong, th.toLong, sum, hash, m.ts_us)
    }).toDF("doc_id", "width", "height", "thumb_w", "thumb_h",
      "pix_sum", "pix_hash", "ts_us")
  }

  /** Color per-image face (r14): the streaming twin of
    * `q_thumbnail_rgb` — 3-band decode + per-channel integer pooling
    * with the exact batch kernel ([[Multimodal.poolRgb]]), emitting
    * the same `(sum_r, sum_g, sum_b, pix_hash_rgb)` checksums, so
    * streamed color rows are bit-identical to the batch query on the
    * same payloads.  Stateless: pixels never enter state. */
  def thumbsRgb(media: Dataset[MediaEvent], box: Int = Multimodal.ThumbBox): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { m =>
      val (w, h, rgb) = Multimodal.decodeRgb(m.payload)
      val (tw, th) = Multimodal.thumbDims(w, h, box)
      val pooled = Multimodal.poolRgb(w, h, rgb, tw, th)
      var sr = 0L; var sg = 0L; var sb = 0L
      var hash = 0L
      var i = 0
      while (i < pooled.length) {
        val v = pooled(i)
        sr += (v >>> 16) & 0xff; sg += (v >>> 8) & 0xff; sb += v & 0xff
        hash += v.toLong * (i + 1)
        i += 1
      }
      (m.doc_id, w.toLong, h.toLong, tw.toLong, th.toLong, sr, sg, sb, hash, m.ts_us)
    }).toDF("doc_id", "width", "height", "thumb_w", "thumb_h",
      "sum_r", "sum_g", "sum_b", "pix_hash_rgb", "ts_us")
  }

  /** Per-window audit face: `(window_start_us, n_imgs, px_in, px_out,
    * sum_pix_hash)` — the live throughput/integrity counters a media
    * ingest pipeline alerts on (a decode drift anywhere in the window
    * moves sum_pix_hash).  State per window: one 4-long row. */
  def audit(media: Dataset[MediaEvent], windowDur: String,
            watermarkDelay: String = "0 seconds",
            box: Int = Multimodal.ThumbBox): DataFrame =
    thumbs(media, box)
      .withColumn("ts", expr("timestamp_micros(ts_us)"))
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDur))
      .agg(count(lit(1)).as("n_imgs"),
        sum(col("width") * col("height")).as("px_in"),
        sum(col("thumb_w") * col("thumb_h")).as("px_out"),
        sum(col("pix_hash")).as("sum_pix_hash"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("n_imgs"), col("px_in"), col("px_out"), col("sum_pix_hash"))
}
