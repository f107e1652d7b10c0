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
  * Confs:
  *  - spark.graft.rangejoin.enabled (default true): kill switch — an
  *    accidental non-interval '<='-pair shape can opt out per session.
  *  - spark.graft.rangejoin.binwidth (default 64): ≈ median interval
  *    length so typical intervals span ≤ 2 bins. Must be > 0; an
  *    invalid value disables the rewrite with a warning rather than
  *    failing queries.
  *  - spark.graft.rangejoin.maxBinsPerRow (default 4096): per-row bin
  *    fan-out cap. Rows whose interval covers more bins (megabase
  *    spans at default width) would bloat the Generate output — they
  *    are split out and joined through a broadcast nested-loop
  *    fallback instead (wide rows are rare by construction, so the
  *    broadcast is small), unioned with the binned join of the narrow
  *    majority. Exactly the same pairs come out; Sequence can never
  *    throw its max-length error. Set <= 0 to uncap.
  */
object RangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  private val Rewritten = TreeNodeTag[Boolean]("graft.rangeJoin.rewritten")
  private val BinName = "__graft_bin"

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if j.getTagValue(Rewritten).isEmpty && j.resolved && enabled &&
          !cond.references.exists(_.name == BinName) =>
      val conjuncts = splitConjunctivePredicates(cond)
      findOverlapPair(conjuncts, left, right) match {
        case Some((aStart, aEnd, bStart, bEnd)) =>
          binWidth match {
            case None => j // invalid binwidth conf — warned, no rewrite
            case Some(width) =>
              val w = Literal(width)
              val cap = maxBinsPerRow

              def binBounds(start: Expression, end: Expression): (Expression, Expression) = {
                val lo = Cast(IntegralDivide(Cast(start, LongType), w), LongType)
                val hi = Cast(IntegralDivide(Cast(end, LongType), w), LongType)
                // least/greatest guards rows with inverted bounds
                // (start > end): Sequence would throw on a descending
                // range, but a naive join can still match such rows —
                // covering [min,max] keeps every qualifying bin.
                (Least(Seq(lo, hi)), Greatest(Seq(lo, hi)))
              }

              def binsOf(start: Expression, end: Expression, child: LogicalPlan): (LogicalPlan, Attribute) = {
                val (loL, hiL) = binBounds(start, end)
                val gen = Explode(Sequence(loL, hiL,
                  Some(Literal(1L)), Some(conf.sessionLocalTimeZone)))
                val binAttr = AttributeReference(BinName, LongType, nullable = true)()
                (Generate(gen, Nil, outer = false, None, Seq(binAttr), child), binAttr)
              }

              def nBins(start: Expression, end: Expression): Expression = {
                val (loL, hiL) = binBounds(start, end)
                Add(Subtract(hiL, loL), Literal(1L))
              }

              // capped: partition each side into narrow (binned path)
              // and wide (fallback path) rows. Null endpoints fall out
              // of both filters — they cannot satisfy the overlap
              // predicate, so the original join drops them too.
              val (leftSrc, wideLeft) =
                if (cap <= 0) (left, None)
                else (Filter(LessThanOrEqual(nBins(aStart, aEnd), Literal(cap)), left),
                      Some(Filter(GreaterThan(nBins(aStart, aEnd), Literal(cap)), left)))
              val (rightSrc, wideRight) =
                if (cap <= 0) (right, None)
                else (Filter(LessThanOrEqual(nBins(bStart, bEnd), Literal(cap)), right),
                      Some(Filter(GreaterThan(nBins(bStart, bEnd), Literal(cap)), right)))

              val (leftGen, leftBin) = binsOf(aStart, aEnd, leftSrc)
              val (rightGen, rightBin) = binsOf(bStart, bEnd, rightSrc)
              val countOnce = EqualTo(leftBin,
                Cast(IntegralDivide(
                  Greatest(Seq(Cast(aStart, LongType), Cast(bStart, LongType))), w), LongType))
              val newCond = (EqualTo(leftBin, rightBin) +: countOnce +: conjuncts)
                .reduce(And)
              val binnedJoin = Join(leftGen, rightGen, Inner, Some(newCond), hint)
              binnedJoin.setTagValue(Rewritten, true)
              val binned = Project(j.output, binnedJoin)

              (wideLeft, wideRight) match {
                case (Some(wl), Some(wr)) =>
                  // (wideA × allB) ∪ (narrowA × wideB) ∪ binned(narrowA, narrowB)
                  // — disjoint, complete. The wide side is broadcast-
                  // hinted: rare rows, and the hint guarantees BNLJ
                  // over a cartesian regardless of size estimates.
                  // The fallback condition carries a REDUNDANT flipped
                  // copy of one overlap conjunct (bStart <= aEnd also
                  // as aEnd >= bStart): semantically a no-op, but it
                  // makes findOverlapPair see two '<='-conjuncts in
                  // one direction and refuse the shape — a structural
                  // re-rewrite guard that, unlike the tag, survives
                  // node reconstruction by sibling rules.
                  val guardedCond = And(cond, GreaterThanOrEqual(aEnd, bStart))
                  val bl = JoinHint(Some(HintInfo(strategy = Some(BROADCAST))), None)
                  val br = JoinHint(None, Some(HintInfo(strategy = Some(BROADCAST))))
                  val wideAJoin = Join(wl, right, Inner, Some(guardedCond), bl)
                  wideAJoin.setTagValue(Rewritten, true)
                  val wideBJoin = Join(leftSrc, wr, Inner, Some(guardedCond), br)
                  wideBJoin.setTagValue(Rewritten, true)
                  Union(Seq(binned,
                    Project(j.output, wideAJoin), Project(j.output, wideBJoin)))
                case _ => binned
              }
          }
        case None => j
      }
  }

  private def enabled: Boolean =
    conf.getConfString("spark.graft.rangejoin.enabled", "true").trim.toLowerCase match {
      case "true" => true
      case "false" => false
      case other =>
        logWarning(s"spark.graft.rangejoin.enabled=$other is not true/false; treating as true")
        true
    }

  private def binWidth: Option[Long] = {
    val raw = conf.getConfString("spark.graft.rangejoin.binwidth", "64")
    val parsed = try Some(raw.toLong) catch { case _: NumberFormatException => None }
    parsed.filter(_ > 0).orElse {
      logWarning(s"spark.graft.rangejoin.binwidth=$raw is not a positive integer; " +
        "range-join rewrite disabled")
      None
    }
  }

  private def maxBinsPerRow: Long = {
    val raw = conf.getConfString("spark.graft.rangejoin.maxBinsPerRow", "4096")
    try raw.toLong catch {
      case _: NumberFormatException =>
        logWarning(s"spark.graft.rangejoin.maxBinsPerRow=$raw is not an integer; using 4096")
        4096L
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
