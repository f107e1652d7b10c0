package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join: for each left row, attach the single right
  * row with the greatest timestamp <= the left row's timestamp within
  * the same key group (the "latest state known at event time" join of
  * point-in-time feature pipelines).
  *
  * Spark-first formulation: no per-row subquery, no range join —
  * UNION both sides tagged by origin, ONE shuffle on the join keys,
  * and a running `last(right payload, ignoreNulls)` window ordered by
  * (ts, side) carries the most recent right row forward onto each
  * left row.  Right rows sort before left rows at equal timestamps,
  * which makes the match inclusive (ts_right == ts_left matches).
  *
  * At 100 TB this is the only shape that holds up: cost is one
  * repartition by key plus a per-partition ordered scan — work
  * O(|L| + |R|), shuffle O(|L| + |R|) — versus the O(|L|·|R|)
  * worst-case of the naive inequality join Spark would otherwise
  * plan as a broadcast-nested-loop.  Skewed keys fall to the same
  * mitigation as any keyed window (salt via [[Skew]] utilities).
  *
  * Ties among right rows with equal (keys, ts) are broken by
  * `rightTieBreak` (largest wins); pass columns making (keys, ts,
  * tieBreak) unique for fully deterministic output.
  */
object AsOf {

  /** Left-as-of join `left` with `right` on equal `on` columns and
    * `right.rightTs <= left.leftTs`.  Output: every left row + the
    * matched right row's non-key columns (null when no right row
    * precedes).  Filter `IS NOT NULL` on a right column for inner
    * semantics. */
  def joinAsOf(left: DataFrame, right: DataFrame, on: Seq[String],
               leftTs: String, rightTs: String,
               rightTieBreak: Seq[String] = Nil): DataFrame = {
    require(on.nonEmpty, "as-of join needs at least one equi-key")
    val payloadCols = right.columns.filterNot(on.contains).toSeq
    require(payloadCols.nonEmpty,
      "as-of join right side has no payload columns beyond the keys — " +
        "nothing to attach (struct() of zero fields is also invalid)")
    val clash = payloadCols.intersect(left.columns)
    require(clash.isEmpty,
      s"as-of join would emit duplicate output columns ${clash.mkString(", ")} — " +
        "rename the right-side payload columns (e.g. prefix them) before joining")
    // a null right timestamp can never satisfy rightTs <= leftTs; it
    // must not ride the window as "earliest known state" (asc ordering
    // would put it first and last(ignoreNulls) would match it)
    val rightNonNull = right.filter(col(rightTs).isNotNull)
    val r = rightNonNull.select(
      on.map(col) ++ Seq(
        col(rightTs).cast("long").as("__asof_ts"),
        lit(0).as("__asof_side"),
        struct(payloadCols.map(col): _*).as("__asof_r")): _*)
    val l = left
      .withColumn("__asof_ts", col(leftTs).cast("long"))
      .withColumn("__asof_side", lit(1))
    val unioned = l.unionByName(r, allowMissingColumns = true)

    val order: Seq[Column] =
      Seq(col("__asof_ts").asc, col("__asof_side").asc) ++
        rightTieBreak.map(c => col("__asof_r").getField(c).asc_nulls_first)
    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = unioned
      .withColumn("__asof_m", last(col("__asof_r"), ignoreNulls = true).over(w))
      .filter(col("__asof_side") === 1)
    val outCols =
      left.columns.map(col).toSeq ++
        payloadCols.map(c => col("__asof_m").getField(c).as(c))
    matched.select(outCols: _*)
  }
}
