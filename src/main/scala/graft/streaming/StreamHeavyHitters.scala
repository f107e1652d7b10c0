package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.queries.Analytics

/** Streaming heavy-hitter candidates (I4 × P66): per tumbling window,
  * the capacity-k Misra-Gries summary of the token stream — the live
  * monitoring face of `q_heavy_hitters`' candidate pass.
  *
  * The tokenizer is [[Analytics.hhTokens]] VERBATIM and the aggregate
  * is the same mergeable `graft_misra_gries` kernel, so the streaming
  * and batch candidate sets obey the same guarantee: every token with
  * in-window count > n_window/(k+1) is present, at most k come back,
  * and the reported counters are lower bounds within n_window/(k+1)
  * of truth.  State per window is the ≤ k-entry sketch buffer plus
  * the watermark-bounded window bookkeeping — arrival-rate-bounded,
  * never vocabulary-bounded (the whole point: a streaming
  * `GROUP BY token` would grow state with |V|).
  *
  * The EXACT second pass of the batch query has no one-pass streaming
  * analog (the recount would need the already-watermarked rows again)
  * — consumers either treshold on the lower bounds (safe: lb ≥
  * threshold ⇒ true count ≥ threshold) or recount candidates against
  * the archived window downstream.  That asymmetry is the honest
  * contract, stated here rather than papered over.
  */
object StreamHeavyHitters {

  final case class DocEvent(doc_id: Long, source: String, text: String,
                            ts_us: Long)

  /** One row per (window, surviving token): `(window_start_us, tok,
    * lb, n_total)` — `lb` the Misra-Gries counter (lower bound),
    * `n_total` the window's exact token count. */
  def candidates(docs: Dataset[DocEvent], windowDur: String, k: Int = 127,
                 watermarkDelay: String = "0 seconds"): DataFrame =
    docs.toDF()
      .select(col("ts_us"), explode(expr(Analytics.hhTokens)).as("tok"))
      .withColumn("ts", expr("timestamp_micros(ts_us)"))
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDur))
      .agg(expr(s"graft_misra_gries(tok, $k)").as("cands"),
        count(lit(1)).as("n_total"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        explode(col("cands")).as("c"), col("n_total"))
      .select(col("window_start_us"), col("c.tok").as("tok"),
        col("c.lb").as("lb"), col("n_total"))
}
