package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode, Window}
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{IntegerType, LongType}

/** The distributed-ranking construction as a first-class operator
  * (I7 scale path, made automatic — VERDICT r8 item 3).
  *
  * `sum(x) OVER (PARTITION BY k ORDER BY o ROWS UNBOUNDED PRECEDING)`
  * and `row_number()` hash-partition the table into ONE task per
  * distinct `k`: with low-cardinality keys (a 3-value flag, a
  * chromosome set) a 100 TB sort collapses onto |k| cores.  The
  * rewrite keeps identical semantics but range-partitions by (k, o)
  * so the sort runs on every core, then stitches per-partition
  * running sums into global ones with a per-(partition, group) offset
  * table that is a few longs per task — input-size-independent.
  *
  * Opt-in (`spark.graft.ranked.autoRewrite=true`): cardinality is a
  * property of the DATA, not the plan, so the user asserts the
  * low-|k| regime.  With high-cardinality keys the hash-partitioned
  * window is already parallel and cheaper (one exchange, no offset
  * job) — the default stays off.
  *
  * Tie behavior: rows equal under (k, o) take an arbitrary order, as
  * they do in the window form (ROWS frames over ties are
  * order-sensitive in any engine); results are identical whenever the
  * ordering key is total, and a valid tie order otherwise.
  */
case class RankedPrefixSum(partCols: Seq[Expression],
                           orderSpec: Seq[SortOrder],
                           delta: Expression,
                           outAttr: Attribute,
                           child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ outAttr
  override def producedAttributes: AttributeSet = AttributeSet(outAttr)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): RankedPrefixSum =
    copy(child = newChild)
}

/** Rewrites eligible one-expression Window nodes into
  * [[RankedPrefixSum]] when `spark.graft.ranked.autoRewrite` is on.
  * Eligible: a single `sum(<non-null bigint>)` or `row_number()` over
  * `ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW` with a
  * non-empty ORDER BY. */
object RankedWindowRule extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    SQLConf.get.getConfString("spark.graft.ranked.autoRewrite", "false")
      .equalsIgnoreCase("true")

  private val RunningFrame =
    SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case w: Window if w.windowExpressions.size == 1 &&
        w.orderSpec.nonEmpty && w.windowExpressions.head.deterministic =>
        w.windowExpressions.head match {
          case a @ Alias(WindowExpression(fn,
              WindowSpecDefinition(ps, os, RunningFrame)), _)
              if ps == w.partitionSpec && os == w.orderSpec =>
            fn match {
              case ae: AggregateExpression
                  if ae.aggregateFunction.isInstanceOf[Sum] &&
                    !ae.isDistinct && ae.filter.isEmpty &&
                    ae.aggregateFunction.children.head.dataType == LongType &&
                    !ae.aggregateFunction.children.head.nullable =>
                RankedPrefixSum(w.partitionSpec, w.orderSpec,
                  ae.aggregateFunction.children.head, a.toAttribute, w.child)
              case _: RowNumber =>
                RankedPrefixSum(w.partitionSpec, w.orderSpec,
                  Literal(1L), a.toAttribute, w.child)
              case _ => w
            }
          case _ => w
        }
    }
  }
}

object RankedStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case RankedPrefixSum(part, order, delta, out, child) =>
      RankedPrefixSumExec(part, order, delta, out, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** Physical two-pass prefix sum.  EnsureRequirements satisfies the
  * [[OrderedDistribution]] below with ONE range exchange + sort on
  * (part, order); pass 1 (a small collect job over the exchanged RDD)
  * gathers per-(partition, group) delta totals, pass 2 re-reads the
  * same shuffle files (Spark reuses them across the two jobs — the
  * data moves once) and adds each group's earlier-partition offset to
  * the local running sum.  All row work is InternalRow/UnsafeRow —
  * no external-Row conversion anywhere on the hot path. */
case class RankedPrefixSumExec(partCols: Seq[Expression],
                               orderSpec: Seq[SortOrder],
                               delta: Expression,
                               outAttr: Attribute,
                               child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ outAttr
  override def producedAttributes: AttributeSet = AttributeSet(outAttr)

  private def sortOrders: Seq[SortOrder] =
    partCols.map(e => SortOrder(e, Ascending)) ++ orderSpec

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(OrderedDistribution(sortOrders))
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(sortOrders)
  override def outputOrdering: Seq[SortOrder] = child.outputOrdering
  override def outputPartitioning = child.outputPartitioning

  /** Pass 1 needs each row's PARTITION, not its order: when the child
    * is the EnsureRequirements-inserted sort (possibly codegen-fused),
    * run pass 1 on the pre-sort exchange output so the O(n log n)
    * sort is paid once, by pass 2 only. */
  private def preSortInput: Option[SparkPlan] = {
    import org.apache.spark.sql.execution.{InputAdapter, SortExec, WholeStageCodegenExec}
    def unwrap(p: SparkPlan): Option[SparkPlan] = p match {
      case w: WholeStageCodegenExec => unwrap(w.child)
      case s: SortExec => Some(s.child match {
        case ia: InputAdapter => ia.child
        case c => c
      })
      case _ => None
    }
    unwrap(child)
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val childRdd = child.execute()
    val childOutput = child.output
    val boundPart = partCols.map(BindReferences.bindReference(_, childOutput))
    val boundDelta = BindReferences.bindReference(delta, childOutput)
    val intOut = outAttr.dataType == IntegerType // row_number
    val deltaFn: InternalRow => Long = boundDelta match {
      case b: BoundReference if !b.nullable => r => r.getLong(b.ordinal)
      case Literal(v: Long, LongType) => _ => v
      case e => r => e.eval(r).asInstanceOf[Long]
    }

    // pass 1: per-(partition, group) delta totals — a few longs per
    // task regardless of input size
    val pass1Rdd = preSortInput.map(_.execute()).getOrElse(childRdd)
    val totals: Array[(Int, Array[(InternalRow, Long)])] =
      pass1Rdd.mapPartitionsWithIndex { (pid, it) =>
        val proj = UnsafeProjection.create(boundPart)
        val m = scala.collection.mutable.LinkedHashMap[InternalRow, Long]()
        it.foreach { row =>
          val k = proj(row)
          val cur = m.get(k)
          if (cur.isDefined) m(k) = cur.get + deltaFn(row)
          else m(k.copy()) = deltaFn(row)
        }
        Iterator.single((pid, m.toArray))
      }.collect()

    // earlier-partition offsets per (partition, group); rows sorted by
    // (part, order) with range partitioning => earlier partitions hold
    // strictly-earlier rows of each group
    val offsets: Map[(Int, InternalRow), Long] = {
      val running = scala.collection.mutable.Map[InternalRow, Long]()
      val out = Map.newBuilder[(Int, InternalRow), Long]
      totals.sortBy(_._1).foreach { case (pid, groups) =>
        groups.foreach { case (k, total) =>
          out += ((pid, k) -> running.getOrElse(k, 0L))
          running(k) = running.getOrElse(k, 0L) + total
        }
      }
      out.result()
    }
    val bcOff = sparkContext.broadcast(offsets)

    // pass 2: same exchange; group changes are detected by key
    // comparison on the SORTED stream, so the offset lookup happens
    // once per (partition, group), not per row
    childRdd.mapPartitionsWithIndex { (pid, it) =>
      val proj = UnsafeProjection.create(boundPart)
      val joined = new JoinedRow
      val cumRow = new GenericInternalRow(1)
      var curKey: UnsafeRow = null
      var running = 0L
      it.map { row =>
        val k = proj(row)
        if (curKey == null || k != curKey) {
          curKey = k.copy()
          running = bcOff.value.getOrElse((pid, curKey: InternalRow), 0L)
        }
        running += deltaFn(row)
        if (intOut) cumRow.update(0, running.toInt)
        else cumRow.update(0, running)
        joined(row, cumRow)
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): RankedPrefixSumExec =
    copy(child = newChild)
}
