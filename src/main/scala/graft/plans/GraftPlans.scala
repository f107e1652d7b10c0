package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.types.LongType

/** Optimizer rules (I3). */
object GraftPlans {
  def inject(e: SparkSessionExtensions): Unit =
    e.injectOptimizerRule(_ => RangeJoinRule)
}

/** Rewrites a naive interval-overlap join
  *
  *   A ⋈ (aStart <= bEnd AND bStart <= aEnd [AND equi…]) B
  *
  * — which Spark would execute as a cartesian/broadcast-nested-loop
  * join, quadratic at 100 TB — into a binned equi-join: both sides
  * explode the fixed-width bins their interval covers, the join runs
  * on (bin [, equi…]) hash keys, the original predicate stays as a
  * residual, and each qualifying pair is kept exactly once in the bin
  * containing max(aStart, bStart) (both sides generate that bin iff
  * the intervals overlap, so no pair is lost or duplicated).
  *
  * Shuffle becomes O(|A|·bins_A + |B|·bins_B) instead of O(|A|·|B|).
  * This is the Spark-native expression of the reference's bounded
  * traversal / interval machinery (ref: util/IntervalUtil.java,
  * BAMInputFormat bounded traversal) as a general optimizer rewrite.
  *
  * Bin width: spark.graft.rangejoin.binwidth (default 64) — choose ≈
  * the median interval length so intervals span ≤ 2 bins.
  */
object RangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  private val Rewritten = TreeNodeTag[Boolean]("graft.rangeJoin.rewritten")
  private val BinName = "__graft_bin"

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if j.getTagValue(Rewritten).isEmpty && j.resolved &&
          !cond.references.exists(_.name == BinName) =>
      val conjuncts = splitConjunctivePredicates(cond)
      findOverlapPair(conjuncts, left, right) match {
        case Some((aStart, aEnd, bStart, bEnd)) =>
          val w = Literal(conf.getConfString("spark.graft.rangejoin.binwidth", "64").toLong)

          def binsOf(start: Expression, end: Expression, child: LogicalPlan): (LogicalPlan, Attribute) = {
            val lo = IntegralDivide(Cast(start, LongType), w)
            val hi = IntegralDivide(Cast(end, LongType), w)
            // least/greatest guards rows with inverted bounds (start >
            // end): Sequence would throw on a descending range, but a
            // naive join can still match such rows — covering
            // [min,max] keeps every qualifying bin (max(aStart,bStart)
            // of a qualifying pair always lies within it) without ever
            // producing an illegal sequence.
            val loL = Cast(lo, LongType)
            val hiL = Cast(hi, LongType)
            val gen = Explode(Sequence(Least(Seq(loL, hiL)), Greatest(Seq(loL, hiL)),
              Some(Literal(1L)), Some(conf.sessionLocalTimeZone)))
            val binAttr = AttributeReference(BinName, LongType, nullable = true)()
            (Generate(gen, Nil, outer = false, None, Seq(binAttr), child), binAttr)
          }

          val (leftGen, leftBin) = binsOf(aStart, aEnd, left)
          val (rightGen, rightBin) = binsOf(bStart, bEnd, right)
          val countOnce = EqualTo(leftBin,
            Cast(IntegralDivide(
              Greatest(Seq(Cast(aStart, LongType), Cast(bStart, LongType))), w), LongType))
          val newCond = (EqualTo(leftBin, rightBin) +: countOnce +: conjuncts)
            .reduce(And)
          val newJoin = Join(leftGen, rightGen, Inner, Some(newCond), hint)
          newJoin.setTagValue(Rewritten, true)
          Project(j.output, newJoin)
        case None => j
      }
  }

  /** Find aStart <= bEnd ∧ bStart <= aEnd with the four endpoint
    * expressions each referencing exactly one side and numeric. */
  private def findOverlapPair(conjuncts: Seq[Expression], left: LogicalPlan,
                              right: LogicalPlan):
      Option[(Expression, Expression, Expression, Expression)] = {
    def sideOf(e: Expression): Option[Boolean] = { // true = left
      if (e.references.isEmpty) None
      else if (e.references.subsetOf(left.outputSet)) Some(true)
      else if (e.references.subsetOf(right.outputSet)) Some(false)
      else None
    }
    def integral(e: Expression): Boolean = e.dataType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => true
      case _ => false
    }
    // normalize every <=/>= conjunct to (leftSideExpr <= rightSideExpr)
    // or (rightSideExpr <= leftSideExpr)
    val les = conjuncts.collect {
      case LessThanOrEqual(a, b) => (a, b)
      case GreaterThanOrEqual(a, b) => (b, a)
    }.flatMap { case (a, b) =>
      (sideOf(a), sideOf(b)) match {
        case (Some(true), Some(false)) if integral(a) && integral(b) => Some(('L', a, b))
        case (Some(false), Some(true)) if integral(a) && integral(b) => Some(('R', a, b))
        case _ => None
      }
    }
    // need EXACTLY one conjunct of each orientation — with several
    // '<='-conjuncts per direction the endpoint pairing is ambiguous
    // (e.g. an unrelated a.x <= b.y predicate could be picked as an
    // interval bound and blow up the bin fan-out), so we stay
    // conservative and leave the join untouched.
    val ls = les.filter(_._1 == 'L')
    val rs = les.filter(_._1 == 'R')
    if (ls.length == 1 && rs.length == 1)
      Some((ls.head._2, rs.head._3, rs.head._2, ls.head._3))
    else None
  }
}
