package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.queries.Analytics

/** Streaming weighted sampling (I4 × P67): per tumbling window, the
  * k-doc Efraimidis-Spirakis sample weighted by length — the
  * continuous face of `q_weighted_sample`, run as the AGGREGATE-shaped
  * top-k (`graft_topk_by`): per-window state is the k-entry heap, so
  * the store is windows × k rows regardless of arrival rate — a
  * windowed `row_number` would have to retain every in-window row.
  *
  * The E-S key is [[Analytics.esKey]] VERBATIM (content-hash u,
  * shared exact micro-ln tree), so for the same rows the streaming
  * per-window sample equals the batch TakeOrdered sample computed on
  * that window's rows — deterministically, whatever the micro-batch
  * layout (the heap is merge-associative and the (key DESC, payload
  * ASC) total order has no ties to split).
  */
object StreamWeightedSample {

  final case class DocEvent(doc_id: Long, lang: String, text: String,
                            n_chars: Long, ts_us: Long)

  /** One row per (window, sampled doc): `(window_start_us, doc_id,
    * es_key, rk)`, rk = 1-based rank within the window's sample. */
  def sample(docs: Dataset[DocEvent], windowDur: String, k: Int = 20,
             watermarkDelay: String = "0 seconds"): DataFrame =
    docs.toDF()
      .filter(col("n_chars") > 0)
      .select(col("ts_us"), col("doc_id"), expr(Analytics.esKey).as("es_key"))
      .withColumn("ts", expr("timestamp_micros(ts_us)"))
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDur))
      .agg(expr(s"graft_topk_by(es_key, doc_id, $k)").as("top"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        posexplode(col("top")))
      .select(col("window_start_us"), col("col.payload").as("doc_id"),
        col("col.key").as("es_key"), (col("pos") + 1).cast("bigint").as("rk"))
}
