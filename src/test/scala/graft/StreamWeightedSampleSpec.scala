package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamWeightedSample
import graft.streaming.StreamWeightedSample.DocEvent

/** The streaming per-window E-S sample must equal the batch top-k on
  * each window's rows — heap merging across shuffled micro-batches
  * cannot change a single sampled doc (the total order has no ties),
  * and per-window state is exactly the k-entry heap. */
class StreamWeightedSampleSpec extends SparkSpec {

  private val winUs = 60L * 1000000
  private val K = 15

  test("per-window streamed sample equals the batch top-k over the same rows") {
    import spark.implicits._
    val input = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .selectExpr("doc_id", "lang", "text", "n_chars",
        s"(doc_id % 3) * $winUs + (doc_id * 2654435761) % $winUs AS ts_us")
      .as[DocEvent]
    val sentinel = DocEvent(-1L, "zz", "zz", 1L, 365L * 86400L * 1000000L)
    val dir = tmpDir("ws_stream_in")
    input.repartition(3).write.mode("overwrite").parquet(dir)
    Thread.sleep(1200)
    Seq(sentinel).toDS().write.mode("append").parquet(dir)

    val streamIn = spark.readStream.schema(input.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir).as[DocEvent]
    val q = StreamWeightedSample.sample(streamIn, "1 minute", k = K,
        watermarkDelay = "3 minutes")
      .writeStream.format("memory").queryName("ws_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val streamed = spark.table("ws_out")
      .filter(col("window_start_us") < 3 * winUs)
      .as[(Long, Long, Double, Long)].collect().toSeq.sorted

    val batch = input.toDF()
      .filter(col("n_chars") > 0)
      .select((expr(s"ts_us DIV $winUs") * winUs).as("window_start_us"),
        col("doc_id"), expr(graft.queries.Analytics.esKey).as("es_key"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("window_start_us").orderBy(desc("es_key"), col("doc_id")))
        .cast("bigint"))
      .filter(col("rk") <= K)
      .as[(Long, Long, Double, Long)].collect().toSeq.sorted

    assert(streamed.length == batch.length && streamed.length == 3 * K)
    assert(streamed == batch)
  }
}
