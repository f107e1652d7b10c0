package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.types.LongType

/** Optimizer rules (I3).  Order matters: the count-pushdown rule must
  * see `Aggregate(count) over Join(overlap)` before RangeJoinRule
  * dissolves the join into its binned form. */
object GraftPlans {
  def inject(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => RangeJoinCountRule)
    e.injectOptimizerRule(_ => RangeJoinRule)
    e.injectOptimizerRule(_ => RankedWindowRule)
    e.injectOptimizerRule(_ => RankedLimitRule)
    e.injectPlannerStrategy(_ => RankedStrategy)
  }
}

/** Shared overlap-predicate recognition for the range-join rules. */
private[plans] trait OverlapPatterns extends PredicateHelper {

  /** Joins the rules themselves emit (fallback paths) must never be
    * re-matched by either range rule: the redundant-conjunct guard
    * alone is not enough, because BooleanSimplification canonicalizes
    * `y >= x` and `x <= y` to the same form and deletes the duplicate,
    * after which re-matching every optimizer iteration grows the plan
    * without bound (observed as minutes-long constraint propagation).
    * Tags survive transform-based node reconstruction (copyTagsFrom). */
  protected val SkipRangeRewrite = TreeNodeTag[Boolean]("graft.range.skip")

  /** Find aStart <= bEnd ∧ bStart <= aEnd with the four endpoint
    * expressions each referencing exactly one side and integral.
    * Returns the endpoints plus the two conjuncts they came from.
    * Requires EXACTLY one '<='-conjunct per direction — with several,
    * the endpoint pairing is ambiguous (an unrelated a.x <= b.y
    * could be picked as an interval bound and blow up the rewrite),
    * so we stay conservative and refuse the shape. */
  protected def findOverlap(conjuncts: Seq[Expression], left: LogicalPlan,
                            right: LogicalPlan):
      Option[(Expression, Expression, Expression, Expression,
              Seq[Expression])] = {
    def sideOf(e: Expression): Option[Boolean] = { // true = left
      if (e.references.isEmpty) None
      else if (e.references.subsetOf(left.outputSet)) Some(true)
      else if (e.references.subsetOf(right.outputSet)) Some(false)
      else None
    }
    def integral(e: Expression): Boolean = e.dataType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | LongType => true
      case _ => false
    }
    // normalize every <=/>= conjunct to (leftSideExpr <= rightSideExpr)
    // or (rightSideExpr <= leftSideExpr)
    val les = conjuncts.collect {
      case c @ LessThanOrEqual(a, b) => (c, a, b)
      case c @ GreaterThanOrEqual(a, b) => (c, b, a)
    }.flatMap { case (c, a, b) =>
      (sideOf(a), sideOf(b)) match {
        case (Some(true), Some(false)) if integral(a) && integral(b) => Some(('L', c, a, b))
        case (Some(false), Some(true)) if integral(a) && integral(b) => Some(('R', c, a, b))
        case _ => None
      }
    }
    val ls = les.filter(_._1 == 'L')
    val rs = les.filter(_._1 == 'R')
    if (ls.length == 1 && rs.length == 1)
      Some((ls.head._3, rs.head._4, rs.head._3, ls.head._4,
        Seq(ls.head._2, rs.head._2)))
    else None
  }
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
object RangeJoinRule extends Rule[LogicalPlan] with OverlapPatterns {

  private val Rewritten = TreeNodeTag[Boolean]("graft.rangeJoin.rewritten")
  private val BinName = "__graft_bin"

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if j.getTagValue(Rewritten).isEmpty &&
          j.getTagValue(SkipRangeRewrite).isEmpty && j.resolved && enabled &&
          !cond.references.exists(_.name == BinName) =>
      val conjuncts = splitConjunctivePredicates(cond)
      findOverlap(conjuncts, left, right) match {
        case Some((aStart, aEnd, bStart, bEnd, _)) =>
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

}

/** Pushes a count-only aggregate through an interval-overlap join.
  *
  *   Aggregate(keys ⊆ one side, count(*))
  *     over  A ⋈ (equi… AND aStart <= bEnd AND bStart <= aEnd) B
  *
  * never needs the pair stream: per probe row t, the number of
  * counted rows overlapping it is F − G, where F = #(start <= t.end)
  * and G = #(end < t.start) within t's equi-key group — two running
  * prefix sums over a merged, ordered event stream.  The rewrite
  * replaces an O(pairs) join (204M pairs at sf0.1 for the bench's
  * q_range_join) with two window passes of cost O((|A|+|B|)·log),
  * the only shape that survives 100 TB when only counts are needed.
  * This generalizes the reference's bounded-traversal counting jobs
  * (ref: examples/TestBAM.java read counting over interval scans).
  *
  * Plan shape produced (T = side the group keys come from, R = the
  * counted side; both restricted to well-formed rows start <= end,
  * non-null keys/bounds — rows that can never match drop on both
  * sides exactly as the inner join drops them):
  *
  *   stream1 = R(start events, flag 0) ∪ T(probe at end, flag 1)
  *   F       = cum-sum over (keys; order pos, flag) — inclusive ties
  *   stream2 = F-probes(at start, flag 0) ∪ R(end events, flag 1)
  *   G       = cum-sum — probes first on ties, so 'end < start' strict
  *   cnt     = F − G per T row, kept when > 0 (inner-join groups only)
  *   result  = Aggregate(keys, sum(cnt))
  *
  * Ill-formed rows (start > end) can still satisfy the raw predicate,
  * so they are split out and counted through broadcast fallback joins
  * (rare by construction), unioned as extra partial counts.
  *
  * Conf: spark.graft.rangejoin.countPushdown (default true).
  */
object RangeJoinCountRule extends Rule[LogicalPlan] with OverlapPatterns {

  import org.apache.spark.sql.catalyst.expressions.aggregate._
  import org.apache.spark.sql.types.IntegerType

  /** Respects both its own switch and the family-wide
    * spark.graft.rangejoin.enabled kill switch — opting out of the
    * range-join rewrites must disable ALL of them. */
  private def enabled: Boolean =
    conf.getConfString("spark.graft.rangejoin.countPushdown", "true")
      .trim.equalsIgnoreCase("true") &&
      !conf.getConfString("spark.graft.rangejoin.enabled", "true")
        .trim.equalsIgnoreCase("false")

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformDown {
      case agg @ Aggregate(groupExprs, aggExprs, child, None)
          if agg.resolved && agg.deterministic =>
        inlineProject(child) match {
          case Some((join @ Join(left, right, Inner, Some(cond), _), aliasMap))
              if join.resolved && join.getTagValue(SkipRangeRewrite).isEmpty &&
                // structural backstop if tags are ever dropped: our own
                // fallback aggregates use the __cg/__cnt name scheme
                !aggExprs.exists(e => e.name.startsWith("__cg") || e.name == "__cnt") =>
            val g = groupExprs.map(e => replaceAlias(e, aliasMap))
            val a = aggExprs.map(e => replaceAliasButKeepName(e, aliasMap))
            rewrite(agg, g, a, join, left, right, cond).getOrElse(agg)
          case _ => agg
        }
    }
  }

  /** The aggregate's child may be the join itself or a deterministic
    * Project over it (column pruning inserts one); inlining the
    * aliases lets group/agg exprs be read against the join output. */
  private def inlineProject(p: LogicalPlan)
      : Option[(Join, AttributeMap[Alias])] = p match {
    case j: Join => Some((j, AttributeMap.empty[Alias]))
    case proj @ Project(_, j: Join) if proj.deterministic =>
      Some((j, getAliasMap(proj)))
    case _ => None
  }

  private def rewrite(agg: Aggregate, groupExprs: Seq[Expression],
                      aggExprs: Seq[NamedExpression], join: Join,
                      left: LogicalPlan, right: LogicalPlan,
                      cond: Expression): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    val overlap = findOverlap(conjuncts, left, right)
    if (overlap.isEmpty) return None
    val (aS, aE, bS, bE, overlapConjuncts) = overlap.get
    if (!cond.deterministic) return None

    // every non-overlap conjunct must be a deterministic cross-side
    // equality — anything else and the count algebra doesn't hold
    val rest = conjuncts.filterNot(c => overlapConjuncts.exists(_ eq c))
    val equiPairs: Seq[(Expression, Expression)] = rest.map {
      case EqualTo(x, y) if x.references.nonEmpty &&
          x.references.subsetOf(left.outputSet) &&
          y.references.nonEmpty && y.references.subsetOf(right.outputSet) =>
        (x, y)
      case EqualTo(x, y) if x.references.nonEmpty &&
          x.references.subsetOf(right.outputSet) &&
          y.references.nonEmpty && y.references.subsetOf(left.outputSet) =>
        (y, x)
      case _ => return None
    }

    // group keys must come from exactly one side (the probe side T);
    // an empty grouping (global pair count) probes on the right
    val groupRefs = AttributeSet(groupExprs.flatMap(_.references))
    val tIsRight =
      if (groupRefs.isEmpty) true
      else if (groupRefs.subsetOf(right.outputSet)) true
      else if (groupRefs.subsetOf(left.outputSet)) false
      else return None
    val (t, r) = if (tIsRight) (right, left) else (left, right)
    val (tS, tE, rS, rE) = if (tIsRight) (bS, bE, aS, aE) else (aS, aE, bS, bE)
    // no equi key → the windows would have an empty partitionBy: one
    // task sorts |A|+|B| rows, strictly worse at scale than the
    // binned join RangeJoinRule produces — leave the plan alone
    if (equiPairs.isEmpty) return None
    val keyPairs = equiPairs.map { case (l, rr) => if (tIsRight) (rr, l) else (l, rr) }
    val tKeys = keyPairs.map(_._1)
    val rKeys = keyPairs.map(_._2)

    // aggregate list: group-expr entries and count(non-null literal)
    // entries only; each rebuilt later over the count stream
    sealed trait Entry
    case class GroupEntry(name: String, id: ExprId, q: Seq[String], k: Int) extends Entry
    case class CountEntry(name: String, id: ExprId, q: Seq[String]) extends Entry
    val entries: Seq[Entry] = aggExprs.map {
      case ar: AttributeReference =>
        val k = groupExprs.indexWhere(_.semanticEquals(ar))
        if (k < 0) return None
        GroupEntry(ar.name, ar.exprId, ar.qualifier, k)
      case al @ Alias(c, n) =>
        val k = groupExprs.indexWhere(_.semanticEquals(c))
        if (k >= 0) GroupEntry(n, al.exprId, al.qualifier, k)
        else c match {
          case AggregateExpression(Count(cs), _, false, None, _)
              if cs.nonEmpty && cs.forall(e => e.foldable && e.eval() != null) =>
            CountEntry(n, al.exprId, al.qualifier)
          case _ => return None
        }
      case _ => return None
    }

    val longT = LongType
    def cast64(e: Expression) = Cast(e, longT)
    def lit0 = Literal(0, IntegerType)
    def lit1 = Literal(1, IntegerType)

    // ----- main path: well-formed rows, non-null keys and bounds
    def wellFormed(keys: Seq[Expression], s: Expression, e: Expression,
                   child: LogicalPlan): LogicalPlan =
      Filter((keys.map(IsNotNull) :+ LessThanOrEqual(s, e)).reduce(And), child)
    val rMain = wellFormed(rKeys, rS, rE, r)
    val tMain = wellFormed(tKeys, tS, tE, t)

    val tCols = t.output
    def nullsOf(attrs: Seq[Attribute]): Seq[NamedExpression] =
      attrs.map(x => Alias(Literal(null, x.dataType), x.name)())

    // stream 1: R start-events (flag 0, delta 1) ∪ T probes at end
    // (flag 1, delta 0); cum-sum = F = #(rS <= t.tE), ties inclusive
    val rf = Project(
      rKeys.zipWithIndex.map { case (k, i) => Alias(k, s"__gk$i")() } ++
        Seq(Alias(cast64(rS), "__gpos")(), Alias(lit0, "__gflag")(),
          Alias(Literal(1L), "__gdelta")()) ++ nullsOf(tCols), rMain)
    val tf = Project(
      tKeys.zipWithIndex.map { case (k, i) => Alias(k, s"__gk$i")() } ++
        Seq(Alias(cast64(tE), "__gpos")(), Alias(lit1, "__gflag")(),
          Alias(Literal(0L), "__gdelta")()) ++ tCols, tMain)
    val u1 = Union(Seq(rf, tf), byName = false, allowMissingCol = false)
    val u1k = u1.output.take(rKeys.length)
    val Seq(u1pos, u1flag, u1delta) = u1.output.slice(rKeys.length, rKeys.length + 3)
    val u1t = u1.output.drop(rKeys.length + 3)

    def cumSum(delta: Attribute, keys: Seq[Attribute], pos: Attribute,
               flag: Attribute, name: String, child: LogicalPlan): Window = {
      val frame = SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow)
      val spec = WindowSpecDefinition(keys,
        Seq(SortOrder(pos, Ascending), SortOrder(flag, Ascending)), frame)
      val sum = AggregateExpression(Sum(delta), Complete, isDistinct = false)
      Window(Seq(Alias(WindowExpression(sum, spec), name)()), keys,
        Seq(SortOrder(pos, Ascending), SortOrder(flag, Ascending)), child)
    }
    val w1 = cumSum(u1delta, u1k, u1pos, u1flag, "__f", u1)
    val fAttr = w1.output.last
    val probes1 = Filter(EqualTo(u1flag, lit1), w1)

    // T-side expressions were written against t.output; in stream 2
    // they must read the union's carried copies of those columns
    val toU1 = AttributeMap(tCols.zip(u1t))
    def overU1(e: Expression): Expression = e.transform {
      case x: Attribute => toU1.getOrElse(x, x)
    }

    // stream 2: probes re-keyed at start (flag 0, delta 0) ∪ R
    // end-events (flag 1, delta 1); cum-sum = G = #(rE < t.tS), ties
    // excluded because probes sort first
    val tg = Project(
      u1k.zipWithIndex.map { case (k, i) => Alias(k, s"__hk$i")() } ++
        Seq(Alias(cast64(overU1(tS)), "__hpos")(), Alias(lit0, "__hflag")(),
          Alias(Literal(0L), "__hdelta")()) ++ u1t :+ Alias(fAttr, "__f")(),
      probes1)
    val rg = Project(
      rKeys.zipWithIndex.map { case (k, i) => Alias(k, s"__hk$i")() } ++
        Seq(Alias(cast64(rE), "__hpos")(), Alias(lit1, "__hflag")(),
          Alias(Literal(1L), "__hdelta")()) ++ nullsOf(tCols) :+
        Alias(Literal(null, longT), "__f")(), rMain)
    val u2 = Union(Seq(tg, rg), byName = false, allowMissingCol = false)
    val u2k = u2.output.take(rKeys.length)
    val Seq(u2pos, u2flag, u2delta) = u2.output.slice(rKeys.length, rKeys.length + 3)
    val u2t = u2.output.slice(rKeys.length + 3, rKeys.length + 3 + tCols.length)
    val u2f = u2.output.last
    val w2 = cumSum(u2delta, u2k, u2pos, u2flag, "__g", u2)
    val gAttr = w2.output.last
    val probes2 = Filter(EqualTo(u2flag, lit0), w2)
    val withCnt = Project(u2t :+ Alias(Subtract(u2f, gAttr), "__cnt")(), probes2)
    val cntAttr = withCnt.output.last
    // inner join emits no row for a zero-count probe: groups made
    // solely of such rows must not surface
    val positive = Filter(GreaterThan(cntAttr, Literal(0L)), withCnt)
    val toU2 = AttributeMap(tCols.zip(u2t))
    val mainBranch = Project(
      groupExprs.zipWithIndex.map { case (e, i) =>
        Alias(e.transform { case x: Attribute => toU2.getOrElse(x, x) }, s"__cg$i")()
      } :+ Alias(cntAttr, "__cnt")(), positive)

    // ----- fallback paths: rows with inverted bounds (start > end)
    // can still match the raw predicate but break the prefix-sum
    // algebra; they are rare, so broadcast nested-loop pair joins
    // cover them.  The flipped redundant conjunct makes findOverlap
    // see an ambiguous shape so neither range rule re-fires.
    val guardedCond = And(cond, GreaterThanOrEqual(aE, bS))
    def inverted(s: Expression, e: Expression, child: LogicalPlan): LogicalPlan =
      Filter(GreaterThan(s, e), child)
    def fbCounts(l: LogicalPlan, rr: LogicalPlan, broadcastLeft: Boolean): LogicalPlan = {
      val hint =
        if (broadcastLeft) JoinHint(Some(HintInfo(strategy = Some(BROADCAST))), None)
        else JoinHint(None, Some(HintInfo(strategy = Some(BROADCAST))))
      val fj = Join(l, rr, Inner, Some(guardedCond), hint)
      fj.setTagValue(SkipRangeRewrite, true)
      Aggregate(groupExprs,
        groupExprs.zipWithIndex.map { case (e, i) => Alias(e, s"__cg$i")() } :+
          Alias(AggregateExpression(Count(Seq(Literal(1))), Complete,
            isDistinct = false), "__cnt")(), fj)
    }
    // pairs split disjointly: (wfR × wfT) via prefix sums,
    // (invR × allT), (wfR × invT) via fallback
    val rInv = inverted(rS, rE, r)
    val tInv = inverted(tS, tE, t)
    val fb1 =
      if (tIsRight) fbCounts(rInv, t, broadcastLeft = true)
      else fbCounts(t, rInv, broadcastLeft = false)
    val fb2 =
      if (tIsRight) fbCounts(rMain, tInv, broadcastLeft = false)
      else fbCounts(tInv, rMain, broadcastLeft = true)

    val uAll = Union(Seq(mainBranch, fb1, fb2), byName = false, allowMissingCol = false)
    val gAttrs = uAll.output.dropRight(1)
    val cAttr = uAll.output.last

    val finalAggExprs: Seq[NamedExpression] = entries.map {
      case GroupEntry(name, id, q, k) =>
        Alias(gAttrs(k), name)(exprId = id, qualifier = q)
      case CountEntry(name, id, q) =>
        val s = AggregateExpression(Sum(cAttr), Complete, isDistinct = false)
        Alias(Coalesce(Seq(s, Literal(0L))), name)(exprId = id, qualifier = q)
    }
    logInfo("graft: pushed count aggregate through interval-overlap join " +
      "(prefix-sum rewrite)")
    Some(Aggregate(gAttrs, finalAggExprs, uAll, None))
  }
}
