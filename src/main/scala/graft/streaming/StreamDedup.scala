package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming deduplication for document-ingest pipelines (I4 × P1):
  * the arrival-order face of the batch dedup family — emit the FIRST
  * occurrence of each content hash as documents land, suppress
  * duplicates within a bounded event-time horizon.
  *
  * Two expressions of the same semantics:
  *  - [[dropDupContent]]: Spark's built-in
  *    `dropDuplicatesWithinWatermark` on the content hash — state
  *    evicts automatically once the watermark passes each key.
  *  - [[firstSeen]]: explicit keyed state (`flatMapGroupsWithState` +
  *    event-time timeout) that ALSO counts the duplicates it
  *    suppressed, emitting a per-key summary row when the key's
  *    horizon expires — the shape real ingest pipelines want for
  *    dedup-rate monitoring.
  *
  * At scale the state store shards by content hash — uniformly
  * distributed by construction, so no hot state partitions; the
  * watermark bounds state size to the duplicate horizon rather than
  * the stream's full history. */
object StreamDedup {

  final case class Doc(doc_id: Long, text: String, ts_us: Long)
  final case class Seen(first_doc_id: Long, first_us: Long, dups: Long)
  /** kind = "first" (emitted on arrival) | "summary" (on key expiry,
    * dups = suppressed count). */
  final case class DedupOut(h: String, doc_id: Long, ts_us: Long,
                            dups: Long, kind: String)

  /** Built-in path: first occurrence per content hash; duplicate
    * arrivals within `horizon` of the first are dropped, and the
    * key's state is freed once the watermark clears it. */
  def dropDupContent(docs: Dataset[Doc], horizon: String): Dataset[Doc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .withColumn("ts", expr("timestamp_micros(ts_us)"))
      .withColumn("h", md5(col("text")))
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("h")
      .select("doc_id", "text", "ts_us")
      .as[Doc]
  }

  /** Explicit-state path: emits each first occurrence immediately
    * (kind = "first"), counts suppressed duplicates in state, and on
    * event-time timeout (`horizonMs` past the first occurrence) emits
    * one "summary" row per expired key. */
  def firstSeen(docs: Dataset[Doc], horizonMs: Long,
                watermarkDelay: String = "0 seconds"): Dataset[DedupOut] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .withColumn("ts", expr("timestamp_micros(ts_us)"))
      .withColumn("h", md5(col("text")))
      .withWatermark("ts", watermarkDelay)
      .select(col("h"), col("doc_id"), col("ts_us"), col("ts"))
      .as[(String, Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Seen, DedupOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (h: String, rows: Iterator[(String, Long, Long, java.sql.Timestamp)],
         state: GroupState[Seen]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(DedupOut(h, s.first_doc_id, s.first_us, s.dups, "summary"))
          } else {
            // process in event-time order so "first" is deterministic
            // within a batch regardless of partition arrival order
            val sorted = rows.toSeq.sortBy(r => (r._3, r._2))
            val out = scala.collection.mutable.ArrayBuffer[DedupOut]()
            var s = state.getOption.orNull
            sorted.foreach { case (_, docId, tsUs, _) =>
              if (s == null) {
                s = Seen(docId, tsUs, 0L)
                out += DedupOut(h, docId, tsUs, 0L, "first")
              } else s = s.copy(dups = s.dups + 1)
            }
            state.update(s)
            // expire when the watermark passes first + horizon; Spark
            // rejects timeouts at/below the current watermark, so clamp
            state.setTimeoutTimestamp(math.max(s.first_us / 1000 + horizonMs,
              state.getCurrentWatermarkMs() + 1))
            out.iterator
          }
      }
  }

  /** Batch-parity oracle for [[firstSeen]]'s "first" rows: the same
    * keep-list the batch exact-dedup computes (min event-time, then
    * min doc_id, per content hash). */
  def batchFirsts(docs: Dataset[Doc]): Dataset[DedupOut] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.withColumn("h", md5(col("text")))
      .groupBy("h")
      .agg(min(struct(col("ts_us"), col("doc_id"))).as("f"),
        count(lit(1)).as("n"))
      .select(col("h"), col("f.doc_id").as("doc_id"), col("f.ts_us").as("ts_us"),
        (col("n") - 1).as("dups"), lit("first").as("kind"))
      .as[DedupOut]
  }
}
