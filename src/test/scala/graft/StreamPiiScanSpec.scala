package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.queries.{CorpusStats, Pipeline}
import graft.streaming.StreamPiiScan
import graft.streaming.StreamPiiScan.DocEvent

/** The streaming PII report and quality histogram must equal the
  * batch expressions computed over the same rows per window — the
  * shared-expression contract, verified end to end. */
class StreamPiiScanSpec extends SparkSpec {

  private val winUs = 60L * 1000000 // 1-minute tumbling windows

  private def docEvents(sf: String) = {
    import spark.implicits._
    // spread documents across three windows, arrival order hashed
    spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "source", "text",
        s"(doc_id % 3) * $winUs + (doc_id * 2654435761) % $winUs AS ts_us")
      .as[DocEvent]
  }

  // a far-future sentinel pushes the watermark past every real
  // window's end so append mode finalizes them all; its own output
  // rows land past 3*winUs and are filtered from the comparison
  private val sentinel =
    DocEvent(-1L, "zzz", "zzz sentinel zzz", 365L * 86400L * 1000000L)

  test("streamed per-window PII counts equal the batch expressions") {
    import spark.implicits._
    val input = docEvents("/root/testdata/sf0.001")
    val dir = tmpDir("pii_stream_in")
    input.union(Seq(sentinel).toDS()).write.mode("overwrite").parquet(dir)

    val streamIn = spark.readStream.schema(input.schema).parquet(dir)
      .as[DocEvent]
    val q = StreamPiiScan.counts(streamIn, "1 minute")
      .writeStream.format("memory").queryName("pii_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val streamed = spark.table("pii_out")
      .filter(col("window_start_us") < 3 * winUs)
      .as[(Long, String, Long, Long, Long, Long, Long)].collect().sorted

    val batch = CorpusStats.piiCounts(input.toDF(), "text")
      .withColumn("window_start_us", (col("ts_us") / winUs).cast("long") * winUs)
      .groupBy("window_start_us", "source")
      .agg(CorpusStats.piiAggs.head, CorpusStats.piiAggs.tail: _*)
      .select("window_start_us", "source", "n_docs", "n_emails", "n_phones",
        "n_ips", "docs_with_pii")
      .as[(Long, String, Long, Long, Long, Long, Long)].collect().sorted

    assert(streamed.length === batch.length)
    assert(streamed.toSeq === batch.toSeq)
    // sanity: multiple windows, every document counted exactly once
    // (synthetic sf0.001 text carries no organic PII — the batch
    // query plants fixtures for its oracle; the expressions are
    // shared verbatim, so zero counts here still pin the contract)
    assert(streamed.map(_._1).distinct.length === 3)
    assert(streamed.map(_._3).sum === input.count())
  }

  test("streamed quality histogram equals the batch releaseGates buckets") {
    import spark.implicits._
    val input = docEvents("/root/testdata/sf0.001")
    val dir = tmpDir("qhist_stream_in")
    input.union(Seq(sentinel).toDS()).write.mode("overwrite").parquet(dir)

    val streamIn = spark.readStream.schema(input.schema).parquet(dir)
      .as[DocEvent]
    val q = StreamPiiScan.qualityHist(streamIn, "1 minute")
      .writeStream.format("memory").queryName("qhist_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val streamed = spark.table("qhist_out")
      .filter(col("window_start_us") < 3 * winUs)
      .as[(Long, Int, Long)].collect().sorted

    val batch = Pipeline.releaseGates(input.toDF())
      .withColumn("bucket", least(floor(col("score") / 10.0), lit(9L)).cast("int"))
      .withColumn("window_start_us", (col("ts_us") / winUs).cast("long") * winUs)
      .groupBy("window_start_us", "bucket")
      .agg(count(lit(1)).as("n_docs"))
      .as[(Long, Int, Long)].collect().sorted

    assert(streamed.length === batch.length)
    assert(streamed.toSeq === batch.toSeq)
    // sanity: the score distribution genuinely spans buckets
    assert(streamed.map(_._2).distinct.length > 2)
  }
}
