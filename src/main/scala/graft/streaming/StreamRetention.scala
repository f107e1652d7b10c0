package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming expression of cohort retention (queries.Events.qRetention):
  * each user's cohort is their first active day; every (user, day)
  * activity emits one row carrying (cohort, day_offset) once the
  * WATERMARK passes that day.  The downstream count per
  * (cohort, day_offset) is then an ordinary aggregation over the
  * emitted stream — batch or windowed — so the stateful part stays
  * minimal and exactly-once.
  *
  * Same finalization discipline as StreamFunnel: days fold into the
  * state machine only below the watermark, so within-watermark
  * disorder cannot mis-assign the cohort (the first FINALIZED day is
  * the true minimum over all non-late events).  A finalized (user,
  * day) can never recur — a later duplicate would be below the
  * watermark and dropped — so each activity row emits exactly once
  * with no emitted-set kept in state.
  *
  * State per user = the cohort day (permanent — "first day ever" is
  * per-user-lifetime semantics, as in the batch query) plus the
  * above-watermark pending-day buffer, bounded by the watermark delay.
  */
object StreamRetention {

  final case class DayEvent(user_id: Long, day: Long, ts: java.sql.Timestamp)
  final case class RState(cohort: Long, pending: List[Long]) // cohort -1 = unset
  final case class Activity(user_id: Long, cohort: Long, day_offset: Long)

  private val UsPerDay = 86400000000L

  /** events → per-(user, day) stream input (duplicates fine; the
    * operator dedups within the pending buffer). */
  def dayInput(spark: SparkSession, dir: String): Dataset[DayEvent] = {
    import spark.implicits._
    graft.Tables.events(spark, dir)
      .select(col("user_id"), expr(s"ts DIV 1000 DIV $UsPerDay").as("day"),
        timestamp_micros(expr("ts DIV 1000")).as("ts"))
      .as[DayEvent]
  }

  def activity(events: Dataset[DayEvent],
               watermarkDelay: String = "10 minutes"): Dataset[Activity] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[RState, Activity](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[DayEvent], state: GroupState[RState]) =>
          val wmDay = state.getCurrentWatermarkMs() * 1000L / UsPerDay
          val prev = state.getOption.getOrElse(RState(-1L, Nil))
          val pending = (prev.pending ++ rows.map(_.day)).distinct.sorted
          // a day is finalized once the watermark has passed its END —
          // only then can no further event move the cohort below it
          val (ripe, rest) = pending.partition(_ < wmDay)
          var cohort = prev.cohort
          val out = ripe.map { day =>
            if (cohort < 0) cohort = day // first finalized day = min
            Activity(user, cohort, day - cohort)
          }
          state.update(RState(cohort, rest))
          if (rest.nonEmpty) {
            // wake when the watermark passes the oldest pending day's
            // end, even if the user goes quiet
            val wakeMs = math.max((rest.head + 1) * UsPerDay / 1000L,
              state.getCurrentWatermarkMs() + 1L)
            state.setTimeoutTimestamp(wakeMs)
          }
          out.iterator
      }
  }
}
