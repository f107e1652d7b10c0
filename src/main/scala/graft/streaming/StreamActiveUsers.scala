package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming expression of rolling active users (queries.Events
  * .qActiveUsers): the stateful part is ONLY the exactly-once
  * finalization of (user, day) activity — state is keyed by
  * (user, day), holds one boolean, and is emitted + dropped the moment
  * the watermark passes the day's end.  Everything after that single
  * emission (the 7-day fan-out, DAU/WAU aggregation) is stateless,
  * so at 100 TB the state store carries |active users| × |watermark
  * horizon in days| entries, independent of stream length.
  *
  * Watermark discipline as in [[StreamRetention]]: a (user, day) is
  * emitted only once no non-late event can introduce it again, so each
  * pair emits exactly once with no emitted-set retained.
  */
object StreamActiveUsers {

  final case class UserDay(user_id: Long, day: Long)

  private val MsPerDay = 86400000L

  /** Exactly-once finalized (user, day) activity rows. */
  def userDays(events: Dataset[StreamRetention.DayEvent],
               watermarkDelay: String = "10 minutes"): Dataset[UserDay] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(e => (e.user_id, e.day))
      .flatMapGroupsWithState[Boolean, UserDay](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: (Long, Long), rows: Iterator[StreamRetention.DayEvent],
         state: GroupState[Boolean]) =>
          if (rows.isEmpty && state.hasTimedOut) {
            // watermark passed the day's end: no non-late duplicate can
            // arrive anymore — emit once, drop the state entry
            state.remove()
            Iterator.single(UserDay(key._1, key._2))
          } else {
            // duplicates within the horizon all collapse onto this key
            state.update(true)
            val dayEndMs = (key._2 + 1) * MsPerDay
            state.setTimeoutTimestamp(
              math.max(dayEndMs, state.getCurrentWatermarkMs() + 1L))
            Iterator.empty
          }
      }
  }

  /** DAU/WAU over finalized activity — the stateless tail of the
    * pipeline, shared verbatim with the batch query's fan-out shape
    * (posexplode of a 7-day sequence, two hash aggregations).  Runs on
    * the emitted stream's history (or any frame of [[UserDay]] rows). */
  def activeUsers(userDays: DataFrame): DataFrame =
    userDays
      .select(col("user_id"),
        posexplode(expr("sequence(day, day + 6)")).as(Seq("ofs", "day")))
      .groupBy("user_id", "day")
      .agg(max(when(col("ofs") === 0, 1L).otherwise(0L)).as("on_day"))
      .groupBy("day")
      .agg(sum("on_day").as("dau"), count(lit(1)).as("wau"))
      .filter(col("dau") > 0)
}
