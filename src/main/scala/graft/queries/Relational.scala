package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Relational core operators (SURVEY §2.2 O1, O5, O6, O11-O15).
  *
  * These are the Spark-first analogs of the reference's query surface —
  * the "scan, group, sort, join, write" shape of
  * ref: examples/TestBAM.java:70-120 (read → group by read name →
  * write) generalized over the shared benchmark tables.
  *
  * Determinism contract with the DuckDB oracle:
  *  - every DOUBLE aggregate is quantized per-row to DECIMAL(18,4) and
  *    accumulated as its unscaled BIGINT (see [[dsum]]) — exact and
  *    independent of partial-aggregation order (Spark) vs sequential
  *    order (DuckDB);
  *  - every query ends in a total deterministic order (unique key
  *    suffix) so the row stream hashes identically;
  *  - integer aggregates are cast to BIGINT on both sides (DuckDB
  *    SUM(BIGINT) would otherwise widen to HUGEINT).
  */
object Relational {

  /** Exact order-independent double sum: per-row quantization to
    * DECIMAL(18,4) (unchanged), accumulated as its unscaled BIGINT —
    * plain long adds instead of the Decimal128 sum buffer the >18-digit
    * result precision forces (2.6× on the lineitem agg heads, r6) —
    * then ONE long→double conversion and ONE divide.  Both engines run
    * the identical op sequence on the identical exact integer, so
    * results stay bit-equal under any partial-agg order or cluster
    * size.  Exactness envelope: |Σ| < 2⁶³ micro-units ≈ 9·10¹⁴ in
    * value units ≈ 10¹² rows per group at TPC-H magnitudes; past that,
    * fall back to the DECIMAL accumulator this replaced.  NOTE the
    * overflow asymmetry outside the envelope: Spark SUM(BIGINT) wraps
    * silently with ANSI off while DuckDB widens to HUGEINT, so a
    * beyond-envelope divergence is silent, not loud — the old DECIMAL
    * accumulator raised instead.  Enable spark.sql.ansi.enabled (or
    * re-widen to DECIMAL(38,4)) if a deployment can approach 10¹²
    * rows per group. */
  /** The per-row micro-unit quantization (identical SQL text on both
    * engines) that [[dsum]], the window running sums, and the pivot
    * conditional sums all share — change it HERE only. */
  private[queries] def microExpr(e: String): String =
    s"CAST(CAST(($e) AS DECIMAL(18,4)) * 10000 AS BIGINT)"

  private[queries] def dsum(e: String): org.apache.spark.sql.Column =
    (sum(expr(microExpr(e))).cast("double") / 10000.0)

  /** The oracle-side spelling of [[dsum]]. */
  private[queries] def dsumSql(e: String): String =
    s"CAST(SUM(${microExpr(e)}) AS DOUBLE) / 10000.0"

  // O1 — scan + project + aggregate (TPC-H Q1 shape; the reference's
  // "count reads by flag" job, ref: examples/TestBAM.java:84-100).
  def q1Agg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("2000-12-01"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum("l_quantity").as("sum_qty"),
        dsum("l_extendedprice").as("sum_base_price"),
        dsum("l_extendedprice * (1 - l_discount)").as("sum_disc_price"),
        (dsum("l_quantity") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val q1AggSql: String =
    s"""SELECT l_returnflag, l_linestatus,
      |  ${dsumSql("l_quantity")} AS sum_qty,
      |  ${dsumSql("l_extendedprice")} AS sum_base_price,
      |  ${dsumSql("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
      |  ${dsumSql("l_quantity")} / COUNT(*) AS avg_qty,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // O5 — group-by-key (the reference's group-by-read-name reduce,
  // ref: examples/TestBAM.java:84).  Map-side partial agg is free via
  // hash aggregation; at 100 TB this is one shuffle on the group key.
  def qGroupbyKey(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_orderkey")
      .agg(
        count(lit(1)).as("n_items"),
        dsum("l_quantity").as("sum_qty"),
        dsum("l_extendedprice").as("total_price"))
      .orderBy("l_orderkey")

  val qGroupbyKeySql: String =
    s"""SELECT l_orderkey, COUNT(*) AS n_items,
      |  ${dsumSql("l_quantity")} AS sum_qty,
      |  ${dsumSql("l_extendedprice")} AS total_price
      |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin

  // O6 — global coordinate sort.  Spark-first: range-partition then
  // sort within partitions (what orderBy compiles to) — no
  // single-reducer sort; 1000 executors each sort one key range
  // (analog of ref: util/GetSortedBAMHeader.java + sorted write).
  def qSort(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_shipdate", "l_quantity")
      .repartitionByRange(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      .sortWithinPartitions("l_shipdate", "l_orderkey", "l_linenumber")

  val qSortSql: String =
    """SELECT l_orderkey, l_linenumber, l_partkey, l_shipdate, l_quantity
      |FROM lineitem ORDER BY l_shipdate, l_orderkey, l_linenumber""".stripMargin

  // O11 — multi-table join, small-dim broadcast (TPC-H Q3 shape).
  def q3Join(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment") === "BUILDING" &&
        col("o_orderdate") < lit("1998-01-01"))
      .groupBy("o_orderkey", "c_mktsegment", "o_orderdate")
      .agg(
        dsum("l_extendedprice * (1 - l_discount)").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(desc("revenue"), col("o_orderkey"))

  val q3JoinSql: String =
    s"""SELECT o_orderkey, c_mktsegment, o_orderdate,
      |  ${dsumSql("l_extendedprice * (1 - l_discount)")} AS revenue,
      |  COUNT(*) AS n_items
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |  JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY o_orderkey, c_mktsegment, o_orderdate
      |ORDER BY revenue DESC, o_orderkey""".stripMargin

  // O11 — five-way join through the dimension chain (TPC-H Q5 shape).
  // region/nation/customer are broadcast; only the lineitem⋈orders
  // join shuffles — at 100 TB that is the only unavoidable shuffle.
  def q5Join(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(
        dsum("l_extendedprice * (1 - l_discount)").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("r_name", "n_name")

  val q5JoinSql: String =
    s"""SELECT r_name, n_name,
      |  ${dsumSql("l_extendedprice * (1 - l_discount)")} AS revenue,
      |  COUNT(*) AS n_items
      |FROM region JOIN nation ON n_regionkey = r_regionkey
      |  JOIN customer ON c_nationkey = n_nationkey
      |  JOIN orders ON o_custkey = c_custkey
      |  JOIN lineitem ON l_orderkey = o_orderkey
      |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin

  // O12 — grouping-sets rollup (summary-stats jobs over flag/status).
  def qRollup(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .rollup("l_returnflag", "l_linestatus")
      .agg(
        expr("CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT)").as("gid"),
        count(lit(1)).as("n"),
        dsum("l_quantity").as("sum_qty"))
      .orderBy(col("gid"), asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))

  val qRollupSql: String =
    s"""SELECT l_returnflag, l_linestatus,
      |  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
      |  COUNT(*) AS n,
      |  ${dsumSql("l_quantity")} AS sum_qty
      |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  // O13 — window/rank analytics (per-customer order ranking).
  def qWindow(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(desc("o_totalprice"), col("o_orderkey"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d)
      .select(
        col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).cast("bigint").as("rk"),
        (sum(expr(microExpr("o_totalprice")))
          .over(run).cast("double") / 10000.0).as("run_total"))
      .orderBy("o_custkey", "rk")
  }

  val qWindowSql: String =
    s"""SELECT o_custkey, o_orderkey, o_totalprice,
      |  CAST(ROW_NUMBER() OVER w AS BIGINT) AS rk,
      |  CAST(SUM(${microExpr("o_totalprice")})
      |       OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
      |             ROWS UNBOUNDED PRECEDING) AS DOUBLE) / 10000.0 AS run_total
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
      |ORDER BY o_custkey, rk""".stripMargin

  // O14 — anti join: customers with no orders (reads w/o annotation).
  def qAntiJoin(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")

  val qAntiJoinSql: String =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
      |ORDER BY c_custkey""".stripMargin

  // O15 — batch sessionization over the event stream: 30-min
  // inactivity gap → session id via lag + running sum.  `ts` surfaces
  // as BIGINT nanoseconds (see GraftSession nanosAsLong); all time
  // math is exact integer µs, so boundaries can't round differently
  // between engines.
  def qSessionize(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .withColumn("ts_us", expr("ts DIV 1000"))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(byUser))
      .withColumn("brk",
        when(col("prev_us").isNull ||
          col("ts_us") - col("prev_us") > 1800L * 1000000L, 1)
          .otherwise(0))
      .withColumn("session_id", sum("brk").over(run).cast("bigint"))
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        min("ts_us").as("session_start_us"),
        max("ts_us").as("session_end_us"),
        dsum("value").as("total_value"))
      .orderBy("user_id", "session_id")
  }

  /** Shared oracle CTEs producing the per-event session frame `se`
    * (user_id, ts_us, value, session_id) — used by q_sessionize and
    * the session-stats rollup (Events P49). */
  private[queries] val sessionFrameCtes: String =
    """e AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
      |    THEN 1 ELSE 0 END AS brk
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), se AS (
      |  SELECT user_id, ts_us, value,
      |    CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      |  FROM e
      |)""".stripMargin

  val qSessionizeSql: String =
    s"""WITH $sessionFrameCtes
      |SELECT user_id, session_id, COUNT(*) AS n_events,
      |  MIN(ts_us) AS session_start_us, MAX(ts_us) AS session_end_us,
      |  ${dsumSql("value")} AS total_value
      |FROM se GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (q1Agg _),
    "q_groupby_key" -> (qGroupbyKey _),
    "q_sort" -> (qSort _),
    "q3_join" -> (q3Join _),
    "q5_join" -> (q5Join _),
    "q_rollup" -> (qRollup _),
    "q_window" -> (qWindow _),
    "q_anti_join" -> (qAntiJoin _),
    "q_sessionize" -> (qSessionize _))

  val oracle: Map[String, String] = Map(
    "q1_agg" -> q1AggSql,
    "q_groupby_key" -> qGroupbyKeySql,
    "q_sort" -> qSortSql,
    "q3_join" -> q3JoinSql,
    "q5_join" -> q5JoinSql,
    "q_rollup" -> qRollupSql,
    "q_window" -> qWindowSql,
    "q_anti_join" -> qAntiJoinSql,
    "q_sessionize" -> qSessionizeSql)
}
