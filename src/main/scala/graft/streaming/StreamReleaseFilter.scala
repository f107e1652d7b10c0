package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.queries.Pipeline

/** Streaming expression of the composite release filter
  * (queries.Pipeline.qReleaseFilter, P51) — the actual keep/drop
  * decision a training-data release runs, as documents land.
  *
  * The four gates split exactly as the batch plan does:
  *  - quality / language / PII are per-row, computed by the SAME
  *    [[Pipeline.releaseGates]] expressions in the scan stage — no
  *    state, no shuffle, full codegen;
  *  - exact-dedup canonicality (min doc_id per content hash) is the
  *    only stateful part.  State is keyed by content hash and holds
  *    the pending documents of that hash with their gate bits; when
  *    the watermark passes the hash's horizon (first arrival +
  *    `horizonMs`), every pending document is emitted EXACTLY ONCE
  *    with is_canonical decided against the group minimum, and the
  *    state entry is dropped.
  *
  * At 100 TB-scale ingest the state store shards by content hash
  * (uniform by construction — no hot partitions) and holds only the
  * documents of hashes still inside their horizon: duplicate groups
  * are overwhelmingly small, so state is bounded by arrival rate ×
  * horizon, independent of stream length — the [[StreamRetention]] /
  * [[StreamActiveUsers]] finalization discipline applied to the
  * release decision.
  */
object StreamReleaseFilter {

  final case class DocEvent(doc_id: Long, text: String, ts_us: Long)

  /** One pending doc of a hash group: gate bits travel with the id so
    * finalization never needs the text again (state stays small). */
  final case class PendingDoc(doc_id: Long, q_pass: Int, lang_en: Int,
                              pii_free: Int)
  final case class HashGroup(min_doc: Long, first_us: Long,
                             docs: List[PendingDoc])

  /** The batch table's row shape: one decision per document. */
  final case class Decision(doc_id: Long, is_canonical: Int, q_pass: Int,
                            lang_en: Int, pii_free: Int, keep: Int)

  /** Exactly-once, watermark-finalized release decisions.
    *
    * @param horizonMs how long after a hash's FIRST arrival late
    *                  duplicates may still contend for canonicality;
    *                  after first_ts + horizonMs passes the watermark
    *                  the group finalizes and its state drops.
    */
  def decisions(docs: Dataset[DocEvent], horizonMs: Long,
                watermarkDelay: String = "0 seconds"): Dataset[Decision] = {
    val spark = docs.sparkSession
    import spark.implicits._
    Pipeline.releaseGates(docs.toDF())
      .withColumn("ts", expr("timestamp_micros(ts_us)"))
      .withColumn("h", md5(col("text")))
      .withWatermark("ts", watermarkDelay)
      // the watermark column must survive into the stateful operator
      .select(col("h"), col("doc_id"), col("q_pass"), col("lang_en"),
        col("pii_free"), col("ts_us"), col("ts"))
      .as[(String, Long, Int, Int, Int, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[HashGroup, Decision](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (h: String, rows: Iterator[(String, Long, Int, Int, Int, Long, java.sql.Timestamp)],
         state: GroupState[HashGroup]) =>
          if (state.hasTimedOut) {
            // watermark passed the horizon: no surviving arrival can
            // change the group minimum — decide, emit once, drop state
            val s = state.get
            state.remove()
            s.docs.reverseIterator.map { d =>
              val canon = if (d.doc_id == s.min_doc) 1 else 0
              Decision(d.doc_id, canon, d.q_pass, d.lang_en, d.pii_free,
                canon * d.q_pass * d.lang_en * d.pii_free)
            }
          } else {
            var s = state.getOption.getOrElse(
              HashGroup(Long.MaxValue, Long.MaxValue, Nil))
            rows.foreach { case (_, id, q, l, p, us, _) =>
              s = HashGroup(math.min(s.min_doc, id), math.min(s.first_us, us),
                PendingDoc(id, q, l, p) :: s.docs)
            }
            state.update(s)
            // Spark rejects timeouts at/below the current watermark
            state.setTimeoutTimestamp(math.max(s.first_us / 1000 + horizonMs,
              state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }
}
