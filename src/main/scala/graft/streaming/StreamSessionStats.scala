package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming expression of the per-user session rollup
  * (queries.Events.qSessionStats): session boundaries come from the
  * watermark-finalized [[Sessionize.sessions]] stream (the stateful
  * part, state bounded by the inactivity gap + watermark), and the
  * user-level statistics are a plain aggregation of the emitted
  * session rows — every output an exact integer, so the streamed
  * history aggregates bit-equal to the batch gate.
  */
object StreamSessionStats {

  /** Per-user session statistics over a frame of [[Sessionize.Session]]
    * rows — identical column semantics to the batch q_session_stats. */
  def stats(sessions: DataFrame): DataFrame =
    sessions
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_sessions"),
        sum("n_events").as("n_events"),
        expr("sum(n_events) * 1000 DIV count(1)").as("events_per_session_pm"),
        sum(expr("session_end_us - session_start_us")).as("total_dur_us"),
        max(expr("session_end_us - session_start_us")).as("max_dur_us"),
        sum(when(col("n_events") === 1, 1L).otherwise(0L)).as("n_bounce"))
}
