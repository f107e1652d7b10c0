package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the events stream (I4).
  *
  * The batch analog (Relational.qSessionize) gates correctness; this
  * module is the streaming expression of the same semantics:
  * event-time sessionization with `flatMapGroupsWithState` (custom
  * state + event-time timeout) and windowed aggregation under a
  * watermark.  At scale the state store shards by user_id — the same
  * key the batch window partitions by.
  */
object Sessionize {

  final case class Event(user_id: Long, ts_us: Long, value: Double)
  final case class EventTs(user_id: Long, ts_us: Long, value: Double,
                           ts: java.sql.Timestamp)
  final case class SessionAcc(start_us: Long, end_us: Long, n: Long, total: Double)
  final case class Session(user_id: Long, session_start_us: Long,
                           session_end_us: Long, n_events: Long, total_value: Double)

  /** Sessionize a (possibly streaming) Dataset[Event]: sessions close
    * after `gapSec` of event-time inactivity (emitted on watermark
    * passage for streams).
    *
    * Append-mode caveat (inherent to eager emission): a session closed
    * by an intra-batch gap is emitted immediately; an in-watermark
    * late event landing inside that already-emitted span starts a new
    * session rather than amending the emitted row.  Exactly-once
    * session boundaries under arbitrary lateness require holding
    * emission until the watermark passes (end + gap), which the
    * timeout path provides for batch-final sessions. */
  def sessions(events: Dataset[Event], gapSec: Long,
               watermarkDelay: String = "10 minutes"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapSec * 1000000L

    val withTs = events
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", watermarkDelay)
      .as[EventTs]

    withTs.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionAcc, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[EventTs], state: GroupState[SessionAcc]) =>
          if (rows.isEmpty && state.hasTimedOut) {
            // watermark passed the session end + gap: close it
            val s = state.get
            state.remove()
            Iterator.single(Session(user, s.start_us, s.end_us, s.n, s.total))
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts_us, e.value))
            var acc = state.getOption.orNull
            val out = scala.collection.mutable.ArrayBuffer[Session]()
            sorted.foreach { e =>
              if (acc == null) acc = SessionAcc(e.ts_us, e.ts_us, 1, e.value)
              else if (e.ts_us - acc.end_us > gapUs) {
                out += Session(user, acc.start_us, acc.end_us, acc.n, acc.total)
                acc = SessionAcc(e.ts_us, e.ts_us, 1, e.value)
              } else acc = SessionAcc(math.min(acc.start_us, e.ts_us),
                math.max(acc.end_us, e.ts_us), acc.n + 1, acc.total + e.value)
            }
            if (acc != null) {
              state.update(acc)
              state.setTimeoutTimestamp(acc.end_us / 1000 + gapSec * 1000 + 1)
            }
            out.iterator
          }
      }
  }

  /** Tumbling-window event counts under a watermark — the canonical
    * streaming aggregation (late data beyond the watermark dropped). */
  def windowedCounts(events: DataFrame, window_ : String = "10 minutes",
                     watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total_value"))

  /** Batch events table → streaming-shaped input (ts BIGINT ns → µs). */
  def eventsAsStreamInput(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.events(spark, dir)
      .select(col("user_id"), expr("ts DIV 1000").as("ts_us"),
        col("value"), col("event_type"))
}
