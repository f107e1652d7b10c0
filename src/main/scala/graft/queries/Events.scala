package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Event-log analytics operators (SURVEY §2.3 P44-P46, P48) — the
  * classic behavioral-analytics surface over the `events` stream:
  * cohort retention, ordered funnels, semi-structured property
  * extraction, rolling active users.  These complete the "tagged event
  * stream" analog of the reference's record streams (SURVEY §3) on the
  * analysis side.
  *
  * Determinism contract: all time math is exact integer microseconds
  * (`ts` surfaces as BIGINT nanoseconds, see GraftSession nanosAsLong;
  * DuckDB mirrors via epoch_us).  Both engines truncate integer
  * division toward zero (Spark DIV, DuckDB //), and every operand here
  * is non-negative anyway.  All aggregates are integer counts/sums —
  * no float accumulation order to diverge.
  */
object Events {

  private val UsPerDay = 86400000000L

  // ------------------------------------------------------------- P44
  // Cohort retention: cohort(u) = first active day; for each (cohort,
  // day-offset) count the users active that day.  Scale shape: one
  // distinct on (user, day) — a hash agg with map-side partials — one
  // user-keyed agg for the cohort, one shuffle join back on user_id,
  // then a (cohort, offset) hash agg whose cardinality is bounded by
  // days², independent of user count.  No windows, no skew (days are
  // uniform); at 100 TB every stage is partial-agg friendly.
  def qRetention(s: SparkSession, d: String): DataFrame = {
    // distinct FIRST (its map-side partials collapse the raw event
    // stream before any exchange), THEN a user_id barrier over the
    // deduped (user, day) set: both consumers of `ud` ride ONE
    // ReusedExchange instead of re-scanning events, and hash(user_id)
    // clustering lets the cohort agg and the join plan exchange-free.
    // 100× probe: naive dual-scan 2.8s, barrier-before-distinct 4.6s
    // (full raw shuffle), this shape 1.45s steady
    val ud = Tables.events(s, d)
      .select(col("user_id"),
        expr(s"ts DIV 1000 DIV $UsPerDay").as("day"))
      .distinct()
      .repartition(col("user_id"))
    val coh = ud.groupBy("user_id").agg(min("day").as("cohort"))
    ud.join(coh, "user_id")
      .groupBy(col("cohort"), (col("day") - col("cohort")).as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort", "day_offset")
  }

  val qRetentionSql: String =
    s"""WITH ud AS (
       |  SELECT DISTINCT user_id, epoch_us(ts) // $UsPerDay AS day FROM events
       |), coh AS (
       |  SELECT user_id, MIN(day) AS cohort FROM ud GROUP BY user_id
       |)
       |SELECT coh.cohort, ud.day - coh.cohort AS day_offset,
       |  COUNT(*) AS n_users
       |FROM ud JOIN coh USING (user_id)
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ------------------------------------------------------------- P45
  // Ordered funnel view → click → purchase: per user, t1 = first view,
  // t2 = first click strictly after t1, t3 = first purchase strictly
  // after t2 (the standard "min-after-previous-step" funnel — a later
  // click still counts even when an earlier click preceded the view).
  // Scale shape: each step is a pre-filtered scan joined on user_id +
  // a min-agg — three user-keyed shuffles, no windows, no per-user
  // event lists in memory.  Step frames shrink monotonically, so the
  // joins get cheaper down the funnel; AQE can broadcast the tail.
  def qFunnel(s: SparkSession, d: String): DataFrame = {
    // same single-exchange shape as qRetention: the step subtrees are
    // duplicated across the joins (s1 appears three times in the DAG),
    // so without the barrier the events table would be scanned ~5× —
    // with it, every duplicate is a ReusedExchange read and all the
    // user-keyed joins/aggs plan exchange-free
    val e = Tables.events(s, d)
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), col("event_type"), expr("ts DIV 1000").as("us"))
      .repartition(col("user_id"))
    val s1 = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("us").as("t1_us"))
    val s2 = e.filter(col("event_type") === "click")
      .join(s1, "user_id").filter(col("us") > col("t1_us"))
      .groupBy("user_id").agg(min("us").as("t2_us"))
    val s3 = e.filter(col("event_type") === "purchase")
      .join(s2, "user_id").filter(col("us") > col("t2_us"))
      .groupBy("user_id").agg(min("us").as("t3_us"))
    s1.join(s2, Seq("user_id"), "left").join(s3, Seq("user_id"), "left")
      .select(col("user_id"), col("t1_us"), col("t2_us"), col("t3_us"),
        (lit(1) + when(col("t2_us").isNotNull, 1).otherwise(0)
          + when(col("t3_us").isNotNull, 1).otherwise(0))
          .cast("bigint").as("depth"))
      .orderBy("user_id")
  }

  val qFunnelSql: String =
    """WITH e AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events
      |), s1 AS (
      |  SELECT user_id, MIN(us) AS t1_us FROM e
      |  WHERE event_type = 'view' GROUP BY user_id
      |), s2 AS (
      |  SELECT e.user_id, MIN(us) AS t2_us FROM e JOIN s1 USING (user_id)
      |  WHERE event_type = 'click' AND us > t1_us GROUP BY e.user_id
      |), s3 AS (
      |  SELECT e.user_id, MIN(us) AS t3_us FROM e JOIN s2 USING (user_id)
      |  WHERE event_type = 'purchase' AND us > t2_us GROUP BY e.user_id
      |)
      |SELECT s1.user_id, t1_us, t2_us, t3_us,
      |  CAST(1 + CASE WHEN t2_us IS NOT NULL THEN 1 ELSE 0 END
      |         + CASE WHEN t3_us IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS depth
      |FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
      |ORDER BY user_id""".stripMargin

  // ------------------------------------------------------------- P46
  // Semi-structured property extraction: pull a typed field out of the
  // JSON `props` payload and aggregate it per event type.  Scale
  // shape: extraction is a per-row scalar in the scan stage (no
  // shuffle), the agg has 5 groups with map-side partials; the
  // avg is reported as an exact integer permille so no float division
  // can diverge between engines.
  def qPropsExtract(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum("k").as("sum_k"),
        min("k").as("min_k"),
        max("k").as("max_k"))
      .withColumn("avg_permille", expr("(sum_k * 1000) DIV n"))
      .orderBy("event_type")

  val qPropsExtractSql: String =
    """WITH e AS (
      |  SELECT event_type,
      |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |  FROM events
      |)
      |SELECT event_type, COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS sum_k,
      |  MIN(k) AS min_k, MAX(k) AS max_k,
      |  (CAST(SUM(k) AS BIGINT) * 1000) // COUNT(*) AS avg_permille
      |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin

  // ------------------------------------------------------------- P48
  // Rolling active users: per observed day, DAU = distinct users that
  // day, WAU = distinct users over the trailing 7 days.  Scale shape:
  // the trailing window is a fixed 7× FAN-OUT (each (user, day)
  // contributes to 7 target days) — work is 7·|ud| through hash aggs
  // with map-side partials, never a day-range self-join, and no
  // global window sort.
  def qActiveUsers(s: SparkSession, d: String): DataFrame = {
    // ONE pipeline, no dual consumer: posexplode keeps the offset, so
    // DAU (users whose window contribution has ofs = 0) falls out of
    // the same (user, target-day) aggregation that WAU needs — one
    // scan, three hash aggs (distinct, per-(user,tday), per-day), zero
    // joins (the dual-branch formulation ran two full distinct
    // pipelines: 12.2s → 1.8s at the 100× probe).
    // Days with dau = 0 are exactly the unobserved ones → filter.
    val ud = Tables.events(s, d)
      .select(col("user_id"),
        expr(s"ts DIV 1000 DIV $UsPerDay").as("day"))
      .distinct() // map-side partials collapse the raw stream first
    ud.select(col("user_id"),
        posexplode(expr("sequence(day, day + 6)")).as(Seq("ofs", "day")))
      .groupBy("user_id", "day")
      .agg(max(when(col("ofs") === 0, 1L).otherwise(0L)).as("on_day"))
      .groupBy("day")
      .agg(sum("on_day").as("dau"), count(lit(1)).as("wau"))
      .filter(col("dau") > 0)
      .orderBy("day")
  }

  val qActiveUsersSql: String =
    s"""WITH ud AS (
       |  SELECT DISTINCT user_id, epoch_us(ts) // $UsPerDay AS day FROM events
       |), fan AS (
       |  SELECT user_id, day + ofs AS day,
       |    CASE WHEN ofs = 0 THEN 1 ELSE 0 END AS on_day
       |  FROM ud, (SELECT unnest(range(0, 7)) AS ofs)
       |), g AS (
       |  SELECT user_id, day, MAX(on_day) AS on_day FROM fan GROUP BY 1, 2
       |)
       |SELECT day, CAST(SUM(on_day) AS BIGINT) AS dau, COUNT(*) AS wau
       |FROM g GROUP BY day HAVING SUM(on_day) > 0
       |ORDER BY day""".stripMargin

  // ------------------------------------------------------------- P49
  // Session-level user statistics (bounce rate, depth, dwell): a
  // rollup over the O15 session frame — reuses qSessionize wholesale
  // (its final sort is eliminated under the aggregate), adding one
  // user-keyed hash agg on a frame that is already user-partitioned,
  // so the only data-sized cost remains the sessionize window itself.
  // All outputs are exact integers (µs durations, permille depth).
  def qSessionStats(s: SparkSession, d: String): DataFrame =
    Relational.qSessionize(s, d)
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_sessions"),
        sum("n_events").as("n_events"),
        expr("sum(n_events) * 1000 DIV count(1)").as("events_per_session_pm"),
        sum(expr("session_end_us - session_start_us")).as("total_dur_us"),
        max(expr("session_end_us - session_start_us")).as("max_dur_us"),
        sum(when(col("n_events") === 1, 1L).otherwise(0L)).as("n_bounce"))
      .orderBy("user_id")

  val qSessionStatsSql: String =
    s"""WITH ${Relational.sessionFrameCtes}, sess AS (
       |  SELECT user_id, session_id, COUNT(*) AS n_events,
       |    MIN(ts_us) AS s_us, MAX(ts_us) AS e_us
       |  FROM se GROUP BY user_id, session_id
       |)
       |SELECT user_id, COUNT(*) AS n_sessions,
       |  CAST(SUM(n_events) AS BIGINT) AS n_events,
       |  (CAST(SUM(n_events) AS BIGINT) * 1000) // COUNT(*) AS events_per_session_pm,
       |  CAST(SUM(e_us - s_us) AS BIGINT) AS total_dur_us,
       |  MAX(e_us - s_us) AS max_dur_us,
       |  CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounce
       |FROM sess GROUP BY user_id ORDER BY user_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_session_stats" -> (qSessionStats _),
    "q_retention" -> (qRetention _),
    "q_funnel" -> (qFunnel _),
    "q_props_extract" -> (qPropsExtract _),
    "q_active_users" -> (qActiveUsers _))

  val oracle: Map[String, String] = Map(
    "q_session_stats" -> qSessionStatsSql,
    "q_retention" -> qRetentionSql,
    "q_funnel" -> qFunnelSql,
    "q_props_extract" -> qPropsExtractSql,
    "q_active_users" -> qActiveUsersSql)
}
