package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Ascending, AttributeReference, Coalesce, Descending, Expression, Literal, SortOrder}
import org.apache.spark.sql.types.LongType

import graft.plans.{RankedKind, RankedPrefixSum}

/** Distributed prefix aggregation for LOW-CARDINALITY partition keys.
  *
  * `sum(x) OVER (PARTITION BY k ORDER BY o)` hash-partitions rows into
  * one task per distinct `k`: with a handful of groups (a 3-value
  * flag, a chromosome set) the whole table sorts on a handful of
  * cores, which is the dominant cost of the prefix-sum formulations
  * at scale — a 100 TB job collapses onto |k| tasks.
  *
  * This operator keeps the EXACT same semantics but range-partitions
  * by (k, o) so the sort parallelizes across every core, then turns
  * per-partition running sums into global ones with one tiny
  * per-(partition, group) offset table (the classic distributed
  * ranking construction):
  *
  *  - pass 1 collects per-partition, per-group delta totals (a few
  *    longs per task — input-size-independent driver state);
  *  - pass 2 re-reads the SAME range exchange (Spark reuses the
  *    shuffle files across the two jobs — the data moves once) and
  *    adds each group's earlier-partition offset to the local
  *    running sum.
  *
  * Results are deterministic regardless of the sampled range
  * boundaries: offsets are computed from the actual partition
  * contents, and range partitioning guarantees rows in earlier
  * partitions order strictly before later ones.
  */
object Ranked {

  /** Append `outCol` = running sum of `deltaCol` (LongType) over
    * `orderCols` within `partCols`, inclusive of the current row —
    * exactly `sum(delta) OVER (PARTITION BY part ORDER BY order ROWS
    * UNBOUNDED PRECEDING)`, parallel in the number of cores rather
    * than the number of groups. */
  def prefixSum(df: DataFrame, partCols: Seq[String], orderCols: Seq[String],
                deltaCol: String, outCol: String): DataFrame = {
    // build the custom logical node directly (same operator the
    // opt-in RankedWindowRule rewrites windows into): analysis
    // resolves nothing here, so resolve the columns ourselves
    val plan = df.queryExecution.analyzed
    def attr(name: String) = plan.output.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(
        s"column $name not in ${plan.output.map(_.name).mkString(", ")}"))
    val delta = attr(deltaCol)
    require(delta.dataType == LongType, s"$deltaCol must be BIGINT")
    // NULL deltas contribute 0 through this API (coalesced here); the
    // SQL window's running sum instead stays NULL until the first
    // value — the optimizer rule keeps those exact SQL semantics.
    val node = RankedPrefixSum(
      partCols.map(attr),
      orderCols.map(c => SortOrder(attr(c), Ascending)),
      Seq(RankedKind.RSum),
      Seq(if (delta.nullable) Coalesce(Seq(delta, Literal(0L))) else delta),
      Seq(AttributeReference(outCol, LongType, nullable = false)()),
      plan)
    org.apache.spark.sql.classic.GraftDatasetAccess.ofRows(df.sparkSession, node)
  }

  /** Append `outCol` = `row_number() OVER (PARTITION BY part ORDER BY
    * order)` as BIGINT, parallel in cores rather than groups — the
    * keyless (empty `partCols`) form is the only distributed shape of
    * a GLOBAL ranking: `Window.orderBy(...)` serializes every row
    * onto one task.  `orderCols` carries per-column direction
    * (`(name, desc)`); ties take the window's arbitrary order, so
    * pass a tie-breaking unique column for determinism. */
  def rowNumber(df: DataFrame, partCols: Seq[String],
                orderCols: Seq[(String, Boolean)], outCol: String): DataFrame =
    ranked(df, partCols, orderCols, outCol, RankedKind.RRowNumber)

  /** [[prefixSum]] plus the WHOLE-GROUP total as a second output
    * column — `sum(delta) OVER (PARTITION BY part ORDER BY order
    * ROWS UNBOUNDED PRECEDING)` and `sum(delta) OVER (PARTITION BY
    * part)` from ONE operator, one range exchange: pass 1's
    * per-(partition, group) sums are added across-partitions (total)
    * as well as before-only (running offset), so the totals pass
    * costs no extra job, no second aggregate, no broadcast join.
    * The cumulative-distribution workhorse (histogram → cum + n in
    * one pass).  NULL deltas contribute 0 through this API, as in
    * [[prefixSum]]. */
  def prefixSumWithTotal(df: DataFrame, partCols: Seq[String],
                         orderCols: Seq[String], deltaCol: String,
                         cumCol: String, totalCol: String): DataFrame = {
    val plan = df.queryExecution.analyzed
    def attr(name: String) = plan.output.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(
        s"column $name not in ${plan.output.map(_.name).mkString(", ")}"))
    require(orderCols.nonEmpty,
      "prefixSumWithTotal needs a non-empty order: the order columns are " +
        "what spread each group across range partitions — for a bare " +
        "per-group total use groupBy + a broadcast join instead")
    val delta = attr(deltaCol)
    require(delta.dataType == LongType, s"$deltaCol must be BIGINT")
    val d: Expression =
      if (delta.nullable) Coalesce(Seq(delta, Literal(0L))) else delta
    val node = RankedPrefixSum(
      partCols.map(attr),
      orderCols.map(c => SortOrder(attr(c), Ascending)),
      Seq(RankedKind.RSum, RankedKind.RTotal),
      Seq(d, d),
      Seq(AttributeReference(cumCol, LongType, nullable = false)(),
        AttributeReference(totalCol, LongType, nullable = false)()),
      plan)
    org.apache.spark.sql.classic.GraftDatasetAccess.ofRows(df.sparkSession, node)
  }

  /** `rank()` — tie-exact, including peer runs that straddle range
    * partitions (chained through the offset table). */
  def rank(df: DataFrame, partCols: Seq[String],
           orderCols: Seq[(String, Boolean)], outCol: String): DataFrame =
    ranked(df, partCols, orderCols, outCol, RankedKind.RRank)

  /** `dense_rank()` — exact across partitions (boundary-spanning
    * keys merged in the driver pass). */
  def denseRank(df: DataFrame, partCols: Seq[String],
                orderCols: Seq[(String, Boolean)], outCol: String): DataFrame =
    ranked(df, partCols, orderCols, outCol, RankedKind.RDenseRank)

  private def ranked(df: DataFrame, partCols: Seq[String],
                     orderCols: Seq[(String, Boolean)], outCol: String,
                     kind: RankedKind): DataFrame = {
    val plan = df.queryExecution.analyzed
    def attr(name: String) = plan.output.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(
        s"column $name not in ${plan.output.map(_.name).mkString(", ")}"))
    val node = RankedPrefixSum(
      partCols.map(attr),
      orderCols.map { case (c, desc) =>
        SortOrder(attr(c), if (desc) Descending else Ascending)
      },
      Seq(kind),
      Seq(Literal(1L)),
      Seq(AttributeReference(outCol, LongType, nullable = false)()),
      plan)
    org.apache.spark.sql.classic.GraftDatasetAccess.ofRows(df.sparkSession, node)
  }
}
