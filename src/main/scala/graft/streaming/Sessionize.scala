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
      .select(col("user_id"), col("event_id"), expr("ts DIV 1000").as("ts_us"),
        col("value"), col("event_type"))

  // ------------------------------------------------ streaming as-of
  // The streaming expression of operators.AsOf: enrich each query-side
  // event with the latest state-side event at-or-before it, per key.
  // State per key is the minimal sufficient set of state events: all
  // above the watermark (a not-yet-arrived query may still precede
  // them) plus the single latest one at-or-below it (the match for
  // every future query, since queries below the watermark are late by
  // definition).  State is therefore bounded by the watermark delay,
  // not the stream length.
  //
  // Same eager-emission caveat as sessions(): a state event arriving
  // late (within the watermark) after a query was already emitted
  // does not amend the emitted row.

  final case class Tagged(user_id: Long, ts_us: Long, event_id: Long,
                          is_query: Boolean, ts: java.sql.Timestamp)
  final case class StateBuf(clicks: List[(Long, Long)]) // (ts_us, event_id) asc
  final case class Enriched(user_id: Long, p_event: Long, p_us: Long,
                            c_event: Option[Long], c_us: Option[Long])

  def enrichAsOf(tagged: Dataset[Tagged],
                 watermarkDelay: String = "10 minutes"): Dataset[Enriched] = {
    val spark = tagged.sparkSession
    import spark.implicits._
    tagged
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[StateBuf, Enriched](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[Tagged], state: GroupState[StateBuf]) =>
          // Under NoTimeout Spark does NOT filter below-watermark input
          // to this function (only EventTimeTimeout does), so late rows
          // must be dropped here: the pruning invariant below assumes
          // no query older than the watermark ever arrives — a late
          // query would otherwise silently mis-match against pruned
          // state instead of being dropped like any other late event.
          val wmFloorUs = state.getCurrentWatermarkMs() * 1000L
          val sorted = rows.filter(_.ts_us >= wmFloorUs)
            .toSeq.sortBy(r => (r.ts_us, r.is_query, r.event_id))
          // state rows first at equal ts -> inclusive at-tie match;
          // event_id last -> the largest state event wins a ts tie
          var clicks = state.getOption.map(_.clicks).getOrElse(Nil)
          val out = scala.collection.mutable.ArrayBuffer[Enriched]()
          sorted.foreach { r =>
            if (!r.is_query) {
              // insert keeping (ts, id) ascending order
              val (before, after) = clicks.partition(c =>
                c._1 < r.ts_us || (c._1 == r.ts_us && c._2 <= r.event_id))
              clicks = before ::: (r.ts_us, r.event_id) :: after
            } else {
              val m = clicks.takeWhile(_._1 <= r.ts_us).lastOption
              out += Enriched(user, r.event_id, r.ts_us, m.map(_._2), m.map(_._1))
            }
          }
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (below, above) = clicks.partition(_._1 <= wmUs)
          state.update(StateBuf(below.lastOption.toList ::: above))
          out.iterator
      }
  }

  /** events table → Tagged stream input for [[enrichAsOf]]
    * (purchases = query side, clicks = state side). */
  def purchasesAndClicks(events: DataFrame): Dataset[Tagged] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .filter(col("event_type").isin("purchase", "click"))
      .select(col("user_id"), col("ts_us"), col("event_id"),
        (col("event_type") === "purchase").as("is_query"),
        timestamp_micros(col("ts_us")).as("ts"))
      .as[Tagged]
  }
}
