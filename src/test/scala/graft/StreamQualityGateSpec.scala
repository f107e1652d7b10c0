package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.queries.Quality
import graft.streaming.StreamQualityGate
import graft.streaming.StreamQualityGate.DocEvent

/** The streaming keep-rate report must equal the batch Gopher-rule
  * expressions aggregated over the same rows per window — the
  * shared-expression contract, end to end. */
class StreamQualityGateSpec extends SparkSpec {

  private val winUs = 60L * 1000000

  test("streamed per-window keep report equals the batch rule columns") {
    import spark.implicits._
    val input = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .selectExpr("doc_id", "source", "text",
        s"(doc_id % 3) * $winUs + (doc_id * 2654435761) % $winUs AS ts_us")
      .as[DocEvent]
    val sentinel =
      DocEvent(-1L, "zzz", "zzz sentinel zzz", 365L * 86400L * 1000000L)
    val dir = tmpDir("qgate_stream_in")
    input.union(Seq(sentinel).toDS()).write.mode("overwrite").parquet(dir)

    val streamIn = spark.readStream.schema(input.schema).parquet(dir)
      .as[DocEvent]
    val q = StreamQualityGate.keepReport(streamIn, "1 minute")
      .writeStream.format("memory").queryName("qgate_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val streamed = spark.table("qgate_out")
      .filter(col("window_start_us") < 3 * winUs)
      .as[(Long, String, Long, Long, Long, Long, Long, Long, Long)]
      .collect().sorted

    val batch = Quality.gopherCols(input.toDF())
      .withColumn("window_start_us", (col("ts_us") / winUs).cast("long") * winUs)
      .groupBy("window_start_us", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("kept"),
        sum(when(!col("r_words"), 1L).otherwise(0L)).as("fail_words"),
        sum(when(!col("r_wordlen"), 1L).otherwise(0L)).as("fail_wordlen"),
        sum(when(!col("r_alpha"), 1L).otherwise(0L)).as("fail_alpha"),
        sum(when(!col("r_stop"), 1L).otherwise(0L)).as("fail_stop"),
        sum(when(!col("r_div"), 1L).otherwise(0L)).as("fail_div"))
      .as[(Long, String, Long, Long, Long, Long, Long, Long, Long)]
      .collect().sorted

    assert(streamed.length === batch.length)
    assert(streamed.toSeq === batch.toSeq)
    assert(streamed.map(_._1).distinct.length === 3)
    assert(streamed.map(_._3).sum === input.count())
    // the report must actually discriminate on this corpus
    assert(streamed.exists(r => r._4 > 0) && streamed.exists(r => r._4 < r._3))
  }
}
