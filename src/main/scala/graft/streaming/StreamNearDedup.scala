package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.HammingDedup
import graft.queries.{ImageDedup, Multimodal, Pipeline}

/** Streaming NEAR-duplicate suppression (I4 × P52/P71): the
  * arrival-order face of the banded hamming join — as documents land,
  * report for each doc its earliest near-neighbor among docs that
  * arrived within a bounded event-time horizon before it.  Completes
  * the streaming dedup matrix: [[StreamDedup]] suppresses EXACT
  * copies, this suppresses near-copies — over TEXT (32-bit simhash,
  * 4×8-bit bands, hamming ≤ 2, [[bandMatches]]) and over IMAGES
  * (64-bit dHash off the decoded pixels, 4×16-bit bands, hamming ≤
  * [[ImageDedup.MaxDist]], [[imageBandMatches]] — the r16 streaming
  * face of the P71 batch operator).
  *
  * Construction: signatures are the BATCH kernels verbatim
  * ([[Pipeline.simhashExpr]] / [[ImageDedup.dHash64]] over
  * [[Multimodal.decodeGray]]) and the banding is
  * [[HammingDedup.bandsExpr]]/`bandBitsExpr` — the one spelling —
  * so the streaming and batch faces cannot drift.  Each doc fans out
  * to its 4 band keys; per-key state holds the finalized signatures
  * inside the horizon plus a pending buffer, and docs are processed
  * ONLY once the watermark passes their event time, in (ts, doc_id)
  * order — so within-watermark disorder cannot change any emitted
  * verdict (the StreamFunnel finalization discipline).  By the
  * pigeonhole identity a neighbor within the distance bound shares
  * ≥ 1 band, so the per-band minima reduced by [[assignments]] give
  * EXACTLY the global earliest neighbor — the reduction is idempotent
  * over any accumulation of band matches, so micro-batch boundaries
  * cannot split a verdict.
  *
  * At scale: state shards by (band, bits); payloads/text never enter
  * state (images decode scan-side, only the 8-byte signature flows),
  * and candidate checks are popcounts against one band bucket, never
  * the whole horizon.
  */
object StreamNearDedup {

  final case class Doc(doc_id: Long, text: String, ts_us: Long)

  /** An arriving image payload (the P71 corpus shape, streamed). */
  final case class MediaDoc(doc_id: Long, payload: Array[Byte], ts_us: Long)

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

  /** The sig-generic stateful core: `signed` must carry (doc_id,
    * ts_us, sig, ts) with the watermark already applied; bands come
    * from [[HammingDedup]]'s spelling at `bandBits` per band, and
    * verdicts accept hamming ≤ `maxDist` (pigeonhole-exact for
    * maxDist ≤ 3 with 4 bands, `require`d in HammingDedup's batch
    * forms and true here by the same identity). */
  private def bandMatchesCore(signed: DataFrame, horizonUs: Long,
                              bandBits: Int, maxDist: Int): Dataset[BandMatch] = {
    val spark = signed.sparkSession
    import spark.implicits._
    signed
      .select(col("doc_id"), col("ts_us"), col("sig"), col("ts"),
        explode(expr(HammingDedup.bandsExpr)).as("band"))
      .withColumn("bits", expr(HammingDedup.bandBitsExpr("sig", bandBits)))
      .select(col("band"), col("bits"), col("doc_id"), col("ts_us"),
        col("sig"), col("ts"))
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
              java.lang.Long.bitCount(c.sig ^ e.sig) <= maxDist)
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

  /** TEXT face: per-band near-neighbor verdicts (simhash hamming ≤ 2),
    * watermark-finalized.
    *
    * @param horizonUs how far back (event time) a doc can look for
    *                  its near-neighbor; also bounds state size
    * @param delay     watermark delay (allowed disorder/lateness)
    */
  def bandMatches(docs: Dataset[Doc], horizonUs: Long,
                  delay: String = "10 minutes"): Dataset[BandMatch] = {
    val signed = docs
      .withColumn("ts", expr("timestamp_micros(ts_us)"))
      .withColumn("sig", expr(Pipeline.simhashExpr))
      .withWatermark("ts", delay)
      .select("doc_id", "ts_us", "sig", "ts")
    bandMatchesCore(signed, horizonUs, bandBits = 8, maxDist = 2)
  }

  /** IMAGE face (r16, VERDICT r15 item 6): dHash over arriving image
    * payloads — decode + pool + sign scan-side (the P71 kernel
    * VERBATIM; only the 8-byte signature enters state), 4×16-bit
    * bands, verdicts at hamming ≤ [[ImageDedup.MaxDist]] — the same
    * distance bound as the batch q_image_dedup, so stream verdicts are
    * batch-comparable pair-for-pair. */
  def imageBandMatches(docs: Dataset[MediaDoc], horizonUs: Long,
                       delay: String = "10 minutes"): Dataset[BandMatch] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val signed = docs
      .mapPartitions(_.map { m =>
        val (w, h, pix) = Multimodal.decodeGray(m.payload)
        (m.doc_id, m.ts_us, ImageDedup.dHash64(w, h, pix))
      })
      .toDF("doc_id", "ts_us", "sig")
      .withColumn("ts", expr("timestamp_micros(ts_us)"))
      .withWatermark("ts", delay)
      .select("doc_id", "ts_us", "sig", "ts")
    bandMatchesCore(signed, horizonUs, bandBits = 16,
      maxDist = ImageDedup.MaxDist)
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
