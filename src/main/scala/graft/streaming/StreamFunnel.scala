package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming expression of the ordered funnel (queries.Events.qFunnel):
  * per user, t1 = first view, t2 = first click strictly after t1,
  * t3 = first purchase strictly after t2; a completed funnel row is
  * emitted once t3 is decided.
  *
  * Unlike the eager-emission streaming operators (Sessionize.sessions,
  * enrichAsOf), this one only folds events into the state machine when
  * the WATERMARK passes them, so within-watermark disorder cannot
  * change an emitted row: output is exactly the batch answer over all
  * non-late data.  The cost is emission latency = the watermark delay.
  *
  * State per user = the decided timestamps plus only the
  * above-watermark event buffer (bounded by the delay, not stream
  * length).  Completed users drop the buffer but keep a permanent
  * 3-long tombstone — a later event can never revise a
  * min-after-previous chain, but without the tombstone it would start
  * a spurious second chain.  Users with a partial chain likewise hold
  * their few decided longs for their lifetime: "first ever view" is
  * per-user-lifetime semantics, so state is O(distinct users), same as
  * the batch aggregation — bound it operationally by keying the query
  * to a cohort/campaign window when the user population is open-ended.
  * At scale the state store shards by user_id, the same key the batch
  * aggregation shuffles on.
  */
object StreamFunnel {

  final case class FEvent(user_id: Long, ts_us: Long, step: Int,
                          ts: java.sql.Timestamp)
  final case class FState(pending: List[(Long, Int)], // (ts_us, step) ascending
                          t1: Long, t2: Long, t3: Long) // -1 = undecided
  final case class Funnel(user_id: Long, t1_us: Long, t2_us: Long, t3_us: Long)

  /** events as (ts, step) with step 1=view 2=click 3=purchase. */
  def funnelInput(spark: SparkSession, dir: String): Dataset[FEvent] = {
    import spark.implicits._
    graft.Tables.events(spark, dir)
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), expr("ts DIV 1000").as("ts_us"),
        when(col("event_type") === "view", 1)
          .when(col("event_type") === "click", 2).otherwise(3).as("step"),
        timestamp_micros(expr("ts DIV 1000")).as("ts"))
      .as[FEvent]
  }

  def completedFunnels(events: Dataset[FEvent],
                       watermarkDelay: String = "10 minutes"): Dataset[Funnel] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FState, Funnel](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[FEvent], state: GroupState[FState]) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val prev = state.getOption.getOrElse(FState(Nil, -1L, -1L, -1L))
          if (prev.t3 >= 0) {
            // already completed and emitted: drain the input and keep
            // the 3-long tombstone so a user's LATER events can't start
            // a second chain (batch semantics = one funnel per user)
            rows.foreach(_ => ())
            Iterator.empty
          } else {
            // merge new rows (EventTimeTimeout already filtered late
            // ones) into the pending buffer, keeping (ts, step)
            // ascending so finalization replays event-time order; the
            // strict > checks below make same-ts order immaterial, the
            // sort only pins it
            val pending = (prev.pending ++ rows.map(r => (r.ts_us, r.step)))
              .sortBy(identity)
            val (ripe, rest) = pending.partition(_._1 <= wmUs)
            var (t1, t2, t3) = (prev.t1, prev.t2, prev.t3)
            ripe.foreach { case (us, step) =>
              if (t3 < 0) step match {
                case 1 => if (t1 < 0) t1 = us
                case 2 => if (t1 >= 0 && t2 < 0 && us > t1) t2 = us
                case _ => if (t2 >= 0 && us > t2) t3 = us
              }
            }
            if (t3 >= 0) {
              // transition to completed: emit once, drop the buffer,
              // keep the tombstone
              state.update(FState(Nil, t1, t2, t3))
              Iterator.single(Funnel(user, t1, t2, t3))
            } else {
              state.update(FState(rest, t1, t2, t3))
              if (rest.nonEmpty) {
                // wake this group when the watermark passes its oldest
                // buffered event, even if no further events arrive
                val wakeMs = math.max(rest.head._1 / 1000L + 1L,
                  state.getCurrentWatermarkMs() + 1L)
                state.setTimeoutTimestamp(wakeMs)
              }
              // no pending events → nothing to finalize until new
              // data; leaving no timeout set is safe because only new
              // events can extend the chain
              Iterator.empty
            }
          }
      }
  }
}
