package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.{StreamHeavyHitters, StreamWeightedSample}

/** Checkpoint-recovery pins for the imperative-aggregate streaming
  * operators: the Misra-Gries and top-k-heap buffers live in the
  * state store as the bytes `serialize` wrote, and a RESTARTED query
  * must resume from exactly that state — the other streaming specs
  * drive one continuous query, so the deserialize-on-recovery path
  * (and its merge with post-restart arrivals) is pinned only here.
  * Method: run phase 1 over half the files with AvailableNow against
  * a parquet sink (the memory sink refuses checkpoint recovery), let
  * the query terminate, land more files, start a NEW query on the
  * SAME checkpoint, and compare the sink contents against the
  * one-shot batch answer.
  */
class StreamRecoverySpec extends SparkSpec {

  private val winUs = 60L * 1000000

  test("weighted-sample heaps survive a checkpointed restart") {
    import spark.implicits._
    val K = 15
    val all = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .selectExpr("doc_id", "lang", "text", "n_chars",
        s"(doc_id % 3) * $winUs + (doc_id * 2654435761) % $winUs AS ts_us")
      .as[StreamWeightedSample.DocEvent]
    val sentinel = StreamWeightedSample.DocEvent(
      -1L, "zz", "zz", 1L, 365L * 86400L * 1000000L)
    val dir = tmpDir("rec_ws_in")
    val ckpt = tmpDir("rec_ws_ckpt")
    val out = tmpDir("rec_ws_out") + "/sink"
    val (h1, h2) = (all.filter($"doc_id" % 2 === 0), all.filter($"doc_id" % 2 =!= 0))
    h1.write.mode("overwrite").parquet(dir)
    def run(): Unit = {
      val in = spark.readStream.schema(all.schema).parquet(dir)
        .as[StreamWeightedSample.DocEvent]
      val q = StreamWeightedSample.sample(in, "1 minute", k = K,
          watermarkDelay = "3 minutes")
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    // phase 1: half the corpus — open-window heap state checkpoints,
    // nothing finalizes (watermark still inside the data)
    run()
    assert(spark.read.parquet(out).isEmpty, "nothing may finalize in phase 1")
    // phase 2: the other half + the watermark mover, NEW query, SAME
    // checkpoint — recovered heaps must merge with the new arrivals
    Thread.sleep(1200)
    h2.union(Seq(sentinel).toDS()).write.mode("append").parquet(dir)
    run()
    val streamed = spark.read.parquet(out)
      .filter(col("window_start_us") < 3 * winUs)
      .as[(Long, Long, Double, Long)].collect().toSeq.sorted
    val batch = all.toDF()
      .filter(col("n_chars") > 0)
      .select((expr(s"ts_us DIV $winUs") * winUs).as("window_start_us"),
        col("doc_id"), expr(graft.queries.Analytics.esKey).as("es_key"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("window_start_us").orderBy(desc("es_key"), col("doc_id")))
        .cast("bigint"))
      .filter(col("rk") <= K)
      .as[(Long, Long, Double, Long)].collect().toSeq.sorted
    assert(streamed.nonEmpty && streamed == batch,
      s"recovered sample diverged: ${streamed.size} vs ${batch.size}")
  }

  test("Misra-Gries sketches survive a checkpointed restart with the guarantee intact") {
    import spark.implicits._
    val K = 20
    val base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .selectExpr("doc_id", "source", "text",
        s"(doc_id % 3) * $winUs + (doc_id * 2654435761) % $winUs AS ts_us")
    val hot = (0 until 60).map { i =>
      (100000L + i, "syn", Array.fill(50)("hotword").mkString(" "),
        (i % 3) * winUs + (i * 997L) % winUs)
    }.toDF("doc_id", "source", "text", "ts_us")
    val all = base.union(hot).as[StreamHeavyHitters.DocEvent]
    val sentinel = StreamHeavyHitters.DocEvent(
      -1L, "zz", "zz sentinel", 365L * 86400L * 1000000L)
    val dir = tmpDir("rec_hh_in")
    val ckpt = tmpDir("rec_hh_ckpt")
    val out = tmpDir("rec_hh_out") + "/sink"
    val (h1, h2) = (all.filter($"doc_id" % 2 === 0), all.filter($"doc_id" % 2 =!= 0))
    h1.write.mode("overwrite").parquet(dir)
    def run(): Unit = {
      val in = spark.readStream.schema(all.schema).parquet(dir)
        .as[StreamHeavyHitters.DocEvent]
      val q = StreamHeavyHitters.candidates(in, "1 minute", k = K,
          watermarkDelay = "3 minutes")
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    run()
    Thread.sleep(1200)
    h2.union(Seq(sentinel).toDS()).write.mode("append").parquet(dir)
    run()
    val byWindow = spark.read.parquet(out)
      .filter(col("window_start_us") < 3 * winUs)
      .as[(Long, String, Long, Long)].collect()
      .groupBy(_._1).map { case (w, rs) => w -> rs.map(r => r._2 -> r._3).toMap }
    val exact = all.toDF()
      .select((col("ts_us") / winUs).cast("long").as("w"),
        explode(expr("filter(split(lower(text), ' '), t -> t <> '')")).as("tok"))
      .groupBy("w", "tok").agg(count(lit(1)).as("n"))
      .as[(Long, String, Long)].collect()
      .groupBy(_._1).map { case (w, rs) => w * winUs -> rs.map(r => r._2 -> r._3).toMap }
    assert(byWindow.keySet == exact.keySet && byWindow.size == 3)
    byWindow.foreach { case (w, cands) =>
      val truth = exact(w)
      val n = truth.values.sum
      val thresh = n.toDouble / (K + 1)
      // the mergeable guarantee must hold ACROSS the restart boundary:
      // every >N/(k+1) token (the injected hot one included) survives
      val must = truth.filter(_._2 > thresh).keySet
      assert(must.contains("hotword"))
      must.foreach { t =>
        assert(cands.contains(t), s"window $w lost $t across the restart")
      }
      assert(cands.size <= K)
      cands.foreach { case (t, lb) =>
        val tc = truth.getOrElse(t, 0L)
        assert(lb <= tc && tc - lb <= thresh + 1,
          s"window $w: counter $lb out of band for true $tc after recovery")
      }
    }
  }
}
