package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.queries.Quality

/** Streaming Gopher-rule keep-rate report (I4 × P55): per-(tumbling
  * window, source) counts of kept docs and per-rule failures as
  * documents land — the live monitoring face of the batch quality
  * gate.  Stateless per row: the rule columns come VERBATIM from
  * [[Quality.gopherCols]], so the streaming report and the batch
  * `q_gopher_rules` verdicts cannot drift; the only streaming
  * machinery is the watermarked tumbling-window aggregation
  * (map-side partials, arrival-rate-bounded state — the
  * StreamPiiScan discipline).
  */
object StreamQualityGate {

  final case class DocEvent(doc_id: Long, source: String, text: String,
                            ts_us: Long)

  def keepReport(docs: Dataset[DocEvent], windowDur: String,
                 watermarkDelay: String = "0 seconds"): DataFrame =
    Quality.gopherCols(docs.toDF())
      .withColumn("ts", expr("timestamp_micros(ts_us)"))
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDur), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("kept"),
        sum(when(!col("r_words"), 1L).otherwise(0L)).as("fail_words"),
        sum(when(!col("r_wordlen"), 1L).otherwise(0L)).as("fail_wordlen"),
        sum(when(!col("r_alpha"), 1L).otherwise(0L)).as("fail_alpha"),
        sum(when(!col("r_stop"), 1L).otherwise(0L)).as("fail_stop"),
        sum(when(!col("r_div"), 1L).otherwise(0L)).as("fail_div"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("source"), col("n_docs"), col("kept"), col("fail_words"),
        col("fail_wordlen"), col("fail_alpha"), col("fail_stop"),
        col("fail_div"))
}
