package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.queries.{Pipeline, Quality}

/** Streaming NEAR-duplicate suppression (I4 × P52): the arrival-order
  * face of the banded hamming join — as documents land, report for
  * each doc its earliest near-neighbor (simhash hamming ≤ 2) among
  * docs that arrived within a bounded event-time horizon before it.
  * Completes the streaming dedup matrix: [[StreamDedup]] suppresses
  * EXACT copies, this suppresses near-copies.
  *
  * Construction: the signature scalar is [[Pipeline.simhashExpr]] and
  * the 4×8-bit banding is [[Quality.bandsExpr]]/`bandBitsExpr` —
  * both shared VERBATIM with the batch operators, so the streaming
  * and batch faces cannot drift.  Each doc fans out to its 4 band
  * keys; per-key state holds the finalized signatures inside the
  * horizon plus a pending buffer, and docs are processed ONLY once
  * the watermark passes their event time, in (ts, doc_id) order — so
  * within-watermark disorder cannot change any emitted verdict (the
  * StreamFunnel finalization discipline).  By the pigeonhole identity
  * a hamming-≤2 neighbor shares ≥1 band, so the per-band minima
  * reduced by [[assignments]] give EXACTLY the global earliest
  * neighbor — the reduction is idempotent over any accumulation of
  * band matches, so micro-batch boundaries cannot split a verdict.
  *
  * At scale: state shards by (band, bits) — 1024 keys of
  * horizon-bounded signature lists (16 bytes/doc/band); the text
  * never enters state, and candidate checks are popcounts against
  * one band bucket, never the whole horizon.
  */
object StreamNearDedup {

  final case class Doc(doc_id: Long, text: String, ts_us: Long)

  /** A finalized verdict from one band: doc matched earlier doc
    * `dup_id` at hamming distance `dist`.  Docs with no neighbor in a
    * band emit nothing — absence across all bands = canonical. */
  final case class BandMatch(doc_id: Long, ts_us: Long,
                             dup_id: Long, dup_ts_us: Long, dist: Int)

  /** (encoder-visible: state classes must be public for codegen) */
  final case class Entry(doc_id: Long, ts_us: Long, sig: Long)
  final case class BandState(finalized: List[Entry], pending: List[Entry])

  private def earlier(a: Entry, b: Entry): Boolean =
    a.ts_us < b.ts_us || (a.ts_us == b.ts_us && a.doc_id < b.doc_id)

  /** Per-band near-neighbor verdicts, watermark-finalized.
    *
    * @param horizonUs how far back (event time) a doc can look for
    *                  its near-neighbor; also bounds state size
    * @param delay     watermark delay (allowed disorder/lateness)
    */
  def bandMatches(docs: Dataset[Doc], horizonUs: Long,
                  delay: String = "10 minutes"): Dataset[BandMatch] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .withColumn("ts", expr("timestamp_micros(ts_us)"))
      .withColumn("simhash", expr(Pipeline.simhashExpr))
      .withWatermark("ts", delay)
      .select(col("doc_id"), col("ts_us"), col("simhash"), col("ts"),
        explode(expr(Quality.bandsExpr)).as("band"))
      .withColumn("bits", expr(Quality.bandBitsExpr))
      .select(col("band"), col("bits"), col("doc_id"), col("ts_us"),
        col("simhash"), col("ts"))
      .as[(Int, Int, Long, Long, Long, java.sql.Timestamp)]
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState[BandState, BandMatch](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: (Int, Int), rows: Iterator[(Int, Int, Long, Long, Long, java.sql.Timestamp)],
         state: GroupState[BandState]) =>
          val s0 = state.getOption.getOrElse(BandState(Nil, Nil))
          val arrived = rows.map(r => Entry(r._3, r._4, r._5)).toList
          val wUs = state.getCurrentWatermarkMs() * 1000L
          val (ready, stillPending) =
            (s0.pending ++ arrived).partition(_.ts_us <= wUs)
          val out = scala.collection.mutable.ArrayBuffer[BandMatch]()
          var fin = s0.finalized
          ready.sortBy(e => (e.ts_us, e.doc_id)).foreach { e =>
            val cands = fin.filter(c => earlier(c, e) &&
              c.ts_us >= e.ts_us - horizonUs &&
              java.lang.Long.bitCount(c.sig ^ e.sig) <= 2)
            if (cands.nonEmpty) {
              val m = cands.minBy(c => (c.ts_us, c.doc_id))
              out += BandMatch(e.doc_id, e.ts_us, m.doc_id, m.ts_us,
                java.lang.Long.bitCount(m.sig ^ e.sig))
            }
            fin = e :: fin
          }
          // EXACT eviction: any doc finalizing later has ts > wUs, so
          // its horizon never reaches below wUs - horizonUs
          val finKept = fin.filter(_.ts_us >= wUs - horizonUs)
          if (finKept.isEmpty && stillPending.isEmpty) state.remove()
          else {
            state.update(BandState(finKept, stillPending))
            val nextMs =
              if (stillPending.nonEmpty) stillPending.map(_.ts_us).min / 1000 + 1
              else (finKept.map(_.ts_us).max + horizonUs) / 1000 + 1
            state.setTimeoutTimestamp(
              math.max(nextMs, state.getCurrentWatermarkMs() + 1))
          }
          out.iterator
      }
  }

  /** Cross-band reduction to the global verdict: earliest
    * (ts, doc_id) neighbor per doc.  Stateless and idempotent over
    * any accumulation of [[bandMatches]] output (each band emits its
    * own minimum; the global minimum is their minimum), so it can run
    * per micro-batch in foreachBatch or over the full sink. */
  def assignments(matches: DataFrame): DataFrame =
    matches.groupBy("doc_id")
      .agg(min(struct(col("dup_ts_us"), col("dup_id"), col("dist"))).as("m"))
      .select(col("doc_id"), col("m.dup_id").as("dup_of"),
        col("m.dist").as("dist"))
}
