package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.queries.Audio

/** Streaming audio ingest with REAL PCM decode (I4 × P11f, r14): the
  * continuous face of `q_audio_energy` — each arriving WAV payload is
  * decoded through `javax.sound.sampled` and featurized with the
  * exact batch kernel (256-sample frames, integer Σ|s| energies), so
  * streamed rows are bit-identical to the batch query on the same
  * payloads.
  *
  * Scale/state story (the StreamThumbnail discipline): decode +
  * framing run as a STATELESS per-row map inside the micro-batch —
  * samples never enter state, never shuffle; only the 5 feature longs
  * leave.  The windowed audit keeps one 4-long row per open window
  * regardless of clip length or arrival rate.  A corrupt payload
  * fails its task with the doc_id-carrying decode message.
  */
object StreamAudioEnergy {

  final case class AudioEvent(doc_id: Long, payload: Array[Byte], ts_us: Long)

  /** Per-clip face: the exact [[Audio.qAudioEnergy]] columns plus
    * event time.  Stateless; works on a streaming OR batch Dataset. */
  def energies(media: Dataset[AudioEvent]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { a =>
      val (_, _, samples) = Audio.decodeWav(a.payload, s"doc_id=${a.doc_id}")
      // the ONE kernel spelling, shared with the batch query (the
      // StreamThumbnail/poolGray discipline — ADVICE r14)
      val (nFrames, sumAbs, peak, hash) = Audio.energyOf(samples)
      (a.doc_id, nFrames, sumAbs, peak, hash, a.ts_us)
    }).toDF("doc_id", "n_frames", "sum_abs", "peak_frame_energy",
      "energy_hash", "ts_us")
  }

  /** Per-window audit face: `(window_start_us, n_clips, n_frames,
    * sum_abs, sum_energy_hash)` — the live decode-integrity counters
    * an audio-ingest pipeline alerts on.  State per window: one row. */
  def audit(media: Dataset[AudioEvent], windowDur: String,
            watermarkDelay: String = "0 seconds"): DataFrame =
    energies(media)
      .withColumn("ts", expr("timestamp_micros(ts_us)"))
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDur))
      .agg(count(lit(1)).as("n_clips"),
        sum(col("n_frames")).as("n_frames"),
        sum(col("sum_abs")).as("sum_abs"),
        sum(col("energy_hash")).as("sum_energy_hash"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("n_clips"), col("n_frames"), col("sum_abs"),
        col("sum_energy_hash"))
}
