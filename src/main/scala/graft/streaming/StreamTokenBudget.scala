package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.queries.Corpus

/** Streaming token-budget shard assignment (I4 × P25): as documents
  * land, assign each to its fixed-token-budget training shard within
  * its language — the continuous form of the batch `q_token_shard`
  * packing (a new shard starts every `budget` tokens of cumulative
  * finalized text, per lang).
  *
  * The token-count expression is [[Corpus.tokCount]] VERBATIM, so the
  * streaming and batch faces cannot drift on tokenization.  Per-lang
  * state is ONE running long plus the pending buffer; docs are
  * processed only once the watermark passes them, in (ts, doc_id)
  * order — the StreamFunnel/StreamNearDedup finalization discipline —
  * so within-watermark disorder and micro-batch boundaries cannot
  * change any shard assignment, and a replay from checkpoint emits
  * identical shards (the running sum is a function of the finalized
  * prefix only).
  *
  * At scale: state shards by lang (a handful of keys); each key holds
  * a few longs of durable state regardless of stream length — the
  * pending buffer is bounded by the watermark horizon.  The emitted
  * (doc, shard) stream is what a landing-zone compactor consumes to
  * route documents into shard files.
  */
object StreamTokenBudget {

  final case class Doc(doc_id: Long, lang: String, text: String, ts_us: Long)

  final case class Assignment(doc_id: Long, lang: String,
                              n_tok: Long, shard: Long)

  /** (encoder-visible: state classes must be public for codegen) */
  final case class Pend(doc_id: Long, ts_us: Long, n_tok: Long)
  final case class LangState(cum: Long, pending: List[Pend])

  /** Watermark-finalized shard assignments.
    *
    * @param budget tokens per shard (batch P25 uses 20000)
    * @param delay  watermark delay (allowed disorder/lateness)
    */
  def assignments(docs: Dataset[Doc], budget: Long,
                  delay: String = "10 minutes"): Dataset[Assignment] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .withColumn("ts", expr("timestamp_micros(ts_us)"))
      .withColumn("n_tok", expr(Corpus.tokCount))
      .withWatermark("ts", delay)
      // ts stays in the projection: the event-time timeout needs the
      // watermark column to reach the stateful operator
      .select(col("lang"), col("doc_id"), col("ts_us"), col("n_tok"), col("ts"))
      .as[(String, Long, Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[LangState, Assignment](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (lang: String, rows: Iterator[(String, Long, Long, Long, java.sql.Timestamp)],
         state: GroupState[LangState]) =>
          val s0 = state.getOption.getOrElse(LangState(0L, Nil))
          val arrived = rows.map(r => Pend(r._2, r._3, r._4)).toList
          val wUs = state.getCurrentWatermarkMs() * 1000L
          val (ready, stillPending) =
            (s0.pending ++ arrived).partition(_.ts_us <= wUs)
          var cum = s0.cum
          val out = ready.sortBy(p => (p.ts_us, p.doc_id)).map { p =>
            val shard = cum / budget
            cum += p.n_tok
            Assignment(p.doc_id, lang, p.n_tok, shard)
          }
          if (stillPending.isEmpty && cum == 0L) state.remove()
          else {
            state.update(LangState(cum, stillPending))
            // wake when the watermark can next finalize a pending doc;
            // a quiet lang with nothing pending needs no wakeup — its
            // running total is durable either way
            if (stillPending.nonEmpty)
              state.setTimeoutTimestamp(math.max(
                stillPending.map(_.ts_us).min / 1000 + 1,
                state.getCurrentWatermarkMs() + 1))
          }
          out.iterator
      }
  }
}
