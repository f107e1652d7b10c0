package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.queries.{CorpusStats, Pipeline}

/** Streaming analogs of the two remaining release-adjacent batch
  * scans — the PII report (CorpusStats.qPiiScan, P50) and a quality
  * histogram over the release-gate score — as documents land.
  *
  * Both are stateless per row: the scan-stage expressions are shared
  * VERBATIM with the batch queries ([[CorpusStats.piiCounts]] /
  * [[CorpusStats.piiAggs]] and [[Pipeline.releaseGates]]'s `score`),
  * so batch and stream cannot drift.  The only streaming machinery is
  * the watermarked tumbling-window aggregation, which shards by
  * (window, key) with map-side partials — arrival-rate bounded state,
  * stream-length independent, the same discipline as the other
  * streaming operators here.
  */
object StreamPiiScan {

  final case class DocEvent(doc_id: Long, source: String, text: String,
                            ts_us: Long)

  /** Per-(tumbling window, source) PII report: the batch qPiiScan row
    * shape plus the window start (µs). */
  def counts(docs: Dataset[DocEvent], windowDur: String,
             watermarkDelay: String = "0 seconds"): DataFrame =
    CorpusStats.piiCounts(docs.toDF(), "text")
      .withColumn("ts", expr("timestamp_micros(ts_us)"))
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDur), col("source"))
      .agg(CorpusStats.piiAggs.head, CorpusStats.piiAggs.tail: _*)
      .select(
        unix_micros(col("window.start")).as("window_start_us"),
        col("source"), col("n_docs"), col("n_emails"), col("n_phones"),
        col("n_ips"), col("docs_with_pii"))

  /** Per-(tumbling window, decile bucket) histogram of the release
    * quality score — `score` computed by the SAME releaseGates
    * expressions the batch release filter runs. */
  def qualityHist(docs: Dataset[DocEvent], windowDur: String,
                  watermarkDelay: String = "0 seconds"): DataFrame =
    Pipeline.releaseGates(docs.toDF())
      .withColumn("bucket",
        least(floor(col("score") / 10.0), lit(9L)).cast("int"))
      .withColumn("ts", expr("timestamp_micros(ts_us)"))
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDur), col("bucket"))
      .agg(count(lit(1)).as("n_docs"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("bucket"), col("n_docs"))
}
