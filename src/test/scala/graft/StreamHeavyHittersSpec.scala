package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamHeavyHitters
import graft.streaming.StreamHeavyHitters.DocEvent

/** The streaming Misra-Gries candidates must carry the batch
  * guarantee PER WINDOW: a superset of every ≥-threshold token of
  * that window, ≤ k entries, counters that are lower bounds within
  * n_window/(k+1) of the exact in-window counts (computed batch-side
  * over the same rows), and an exact n_total.  Also pins that the
  * window aggregate actually merges sketches across micro-batches —
  * the corpus is split into 4 batches landing out of window order.
  */
class StreamHeavyHittersSpec extends SparkSpec {

  private val winUs = 60L * 1000000
  private val K = 20

  /** One stream run shared by both tests: returns the ARCHIVE dir
    * (the raw input rows — what a production pipeline lands next to
    * the live path) and materializes per-window candidates in the
    * `hh_out` memory table. */
  private lazy val archiveDir: String = {
    import spark.implicits._
    // corpus rows spread over 3 windows, plus an injected hot token
    // per window so the superset guarantee is NON-vacuous at k=20
    // (the synthetic vocab is ~31 near-uniform tokens — none clears
    // n/(k+1) on its own)
    val hot = (0 until 60).map { i =>
      DocEvent(100000L + i, "syn",
        Array.fill(50)("hotword").mkString(" "),
        (i % 3) * winUs + (i * 997L) % winUs)
    }.toDS()
    val input = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .selectExpr("doc_id", "source", "text",
        s"(doc_id % 3) * $winUs + (doc_id * 2654435761) % $winUs AS ts_us")
      .as[DocEvent]
      .union(hot)
    val sentinel =
      DocEvent(-1L, "zzz", "zzz sentinel zzz", 365L * 86400L * 1000000L)
    val dir = tmpDir("hh_stream_in")
    // 3 data files = 3 micro-batches under maxFilesPerTrigger, rows
    // shuffled across windows so per-window sketches MERGE across
    // batches rather than building in one update pass; the
    // watermark-advancing sentinel lands in its own LAST batch
    // (appended after an mtime gap — the file source replays oldest
    // first), and the 3-minute delay keeps every window open until it
    // arrives
    input.repartition(3).write.mode("overwrite").parquet(dir)
    Thread.sleep(1200)
    Seq(sentinel).toDS().write.mode("append").parquet(dir)

    val streamIn = spark.readStream.schema(input.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir).as[DocEvent]
    val q = StreamHeavyHitters.candidates(streamIn, "1 minute", k = K,
        watermarkDelay = "3 minutes")
      .writeStream.format("memory").queryName("hh_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    dir
  }

  private def archivedInput = {
    import spark.implicits._
    spark.read.parquet(archiveDir).as[DocEvent].filter(col("doc_id") >= 0)
  }

  test("per-window candidates: superset + size + lower bounds vs batch exact") {
    import spark.implicits._
    val input = archivedInput
    val streamed = spark.table("hh_out")
      .filter(col("window_start_us") < 3 * winUs)
      .as[(Long, String, Long, Long)].collect()
      .groupBy(_._1).map { case (w, rs) =>
        w -> (rs.map(r => r._2 -> r._3).toMap, rs.map(_._4).distinct)
      }

    val exact = input.toDF()
      .select((col("ts_us") / winUs).cast("long").as("w"),
        explode(expr("filter(split(lower(text), ' '), t -> t <> '')")).as("tok"))
      .groupBy("w", "tok").agg(count(lit(1)).as("n"))
      .as[(Long, String, Long)].collect()
      .groupBy(_._1).map { case (w, rs) =>
        w * winUs -> rs.map(r => r._2 -> r._3).toMap
      }

    assert(streamed.keySet == exact.keySet && streamed.size == 3)
    streamed.foreach { case (w, (cands, totals)) =>
      val truth = exact(w)
      val n = truth.values.sum
      assert(totals.toSeq == Seq(n), s"window $w n_total ${totals.toSeq} != $n")
      assert(cands.size <= K)
      val thresh = n.toDouble / (K + 1)
      val must = truth.filter(_._2 > thresh).keySet
      assert(must.contains("hotword"), "the injected hot token must clear the guarantee bar")
      assert(cands.size < truth.size, s"window $w: sketch never pruned (vacuous)")
      must.foreach(t => assert(cands.contains(t),
        s"window $w dropped guaranteed token $t (count ${truth(t)} > $thresh)"))
      cands.foreach { case (t, lb) =>
        val tc = truth.getOrElse(t, 0L)
        assert(lb <= tc && tc - lb <= thresh + 1,
          s"window $w: counter $lb out of band for true $tc")
      }
    }
  }

  test("downstream exact recount: archived candidates + archived window = batch-exact heavy hitters") {
    // The full production pattern the operator scaladoc promises
    // (VERDICT r12 item 7): the stream archives per-window CANDIDATE
    // sets (hh_out) while the raw rows land in the archive dir; a
    // batch job then recounts ONLY the candidates against the
    // archived window and applies the true threshold — per window,
    // exactly q_heavy_hitters' two-pass shape, and the result must
    // equal the naive exact GROUP BY + threshold on the same rows.
    // pct = 5% > 1/(K+1) = 1/21, so the sketch superset guarantee
    // covers the threshold.
    import spark.implicits._
    val input = archivedInput
    val pct = 5L
    val toks = input.toDF()
      .select((col("ts_us") / winUs).cast("long").as("w"),
        explode(expr(graft.queries.Analytics.hhTokens)).as("tok"))
    val cands = spark.table("hh_out")
      .select((col("window_start_us") / winUs).cast("long").as("w"), col("tok"))
    val totals = toks.groupBy("w").agg(count(lit(1)).as("n_total"))
    // recount pass: candidate-restricted exact counts (broadcast —
    // ≤ k rows per window), threshold on TRUE counts
    val recount = toks.join(broadcast(cands), Seq("w", "tok"))
      .groupBy("w", "tok").agg(count(lit(1)).as("n"))
      .join(broadcast(totals), Seq("w"))
      .filter(col("n") * 100 >= col("n_total") * pct)
      .select("w", "tok", "n")
      .as[(Long, String, Long)].collect().sorted.toSeq
    // the oracle: plain exact GROUP BY + the same threshold
    val exact = toks.groupBy("w", "tok").agg(count(lit(1)).as("n"))
      .join(broadcast(totals), Seq("w"))
      .filter(col("n") * 100 >= col("n_total") * pct)
      .select("w", "tok", "n")
      .as[(Long, String, Long)].collect().sorted.toSeq
    assert(exact.nonEmpty, "threshold chose no heavy hitters — vacuous")
    assert(recount === exact,
      "candidate-restricted recount diverged from the exact form")
  }
}
