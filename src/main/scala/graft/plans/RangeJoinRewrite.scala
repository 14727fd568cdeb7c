package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: rewrite a pure range join (`p BETWEEN s AND e` with
  * NO equi conjunct — the shape Spark can only plan as a
  * broadcast-nested-loop or cartesian product) into the cell-bucketized
  * hash equi-join of `graft.operators.RangeJoin`, transparently:
  *
  * {{{
  *   Join(L, R, p >= s && p <= e)
  *     ⇒ Project(origOutput,
  *         Filter(p >= s && p <= e,
  *           Join(L + [__pcell = p div w],
  *                Generate(explode(sequence(s div w, e div w)), R)
  *                  as __icell,
  *                __pcell = __icell)))
  * }}}
  *
  * Cell membership uses integral `div` (truncating division is
  * monotone, so every point in [s, e] lands in a cell of
  * [s div w, e div w] — negatives included); the original predicate
  * re-applies as a post-filter, so semantics are exact, including
  * strict bounds. Each qualifying pair matches in exactly one cell
  * (the point's), so no dedup is needed.
  *
  * OFF unless `spark.graft.rangeJoin.cellWidth` is set to a positive
  * long (the width is workload knowledge — pick it near the typical
  * interval length). Registered by `graft.GraftExtensions`
  * (builder-time) or via `spark.experimental.extraOptimizations`. */
class RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val WidthKey = "spark.graft.rangeJoin.cellWidth"

  /** Opt-in second gate: also rewrite range joins that DO carry equi
    * conjuncts (`k = k AND p BETWEEN s AND e`). Spark hash-joins those
    * on `k` alone and post-filters the range — per-key quadratic when
    * `k` is low-cardinality or skewed (sessions per user, intervals
    * per device). With this on, the cell key is APPENDED to the equi
    * keys, bounding each hash group to one (key, cell). Off by
    * default: with high-cardinality equi keys the plain hash join is
    * already right, and the k× interval fan-out would only add work. */
  val EquiKey = "spark.graft.rangeJoin.rewriteEquiJoins"

  override def apply(plan: LogicalPlan): LogicalPlan =
    conf.getConfString(WidthKey, "").toLongOption.filter(_ > 0) match {
      case None => plan
      case Some(w) => plan.transformUp {
        case j @ Join(left, right, Inner, Some(cond), hint) =>
          rewrite(j, left, right, cond, hint, w).getOrElse(j)
      }
    }

  /** (big, small) of an inequality conjunct — big >= small. */
  private def bigSmall(e: Expression): Option[(Expression, Expression)] =
    e match {
      case GreaterThanOrEqual(a, b) => Some((a, b))
      case GreaterThan(a, b) => Some((a, b))
      case LessThanOrEqual(a, b) => Some((b, a))
      case LessThan(a, b) => Some((b, a))
      case _ => None
    }

  private def isIntegral(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
      cond: Expression, hint: JoinHint, w: Long): Option[LogicalPlan] = {
    // IDEMPOTENCE GUARD: never re-match a join this rule produced. The
    // rewrite leaves the original range predicate as a post-filter;
    // when the rule runs inside the operator-optimization fixed point
    // (injectOptimizerRule), PushPredicateThroughJoin folds that filter
    // straight back into the join condition — without this guard the
    // two rules feed each other a conjunction that doubles every
    // iteration (observed as a StackOverflowError in
    // splitConjunctivePredicates with rewriteEquiJoins on). The cell
    // attributes are this rule's own private names, so their presence
    // in the condition marks the join as already rewritten.
    if (cond.references.exists(a =>
        a.name == "__pcell" || a.name == "__icell")) return None
    val conjuncts = splitConjunctivePredicates(cond)
    // cross-side equi conjuncts Spark can hash on; anything else left
    // in `rest` must be exactly the two range bounds
    val (equis, rest) = conjuncts.partition(isEquiAcross(_, left, right))
    if (equis.nonEmpty &&
      !conf.getConfString(EquiKey, "false").equalsIgnoreCase("true"))
      return None // Spark already hash-joins on the equi key
    if (rest.length != 2) return None
    val (c1, c2) = (rest.head, rest(1))
    (bigSmall(c1), bigSmall(c2)) match {
      case (Some((big1, small1)), Some((big2, small2))) =>
        // the point appears as the BIG of one bound (p >= s) and the
        // SMALL of the other (p <= e)
        val candidates = Seq(
          (big1, small1, small2, big2), // c1 lower, c2 upper
          (big2, small2, small1, big1)) // c2 lower, c1 upper
        candidates.collectFirst {
          case (p1, s, p2, e)
              if p1.canonicalized == p2.canonicalized &&
                isIntegral(p1) && isIntegral(s) && isIntegral(e) &&
                p1.deterministic && s.deterministic && e.deterministic &&
                sidesSplit(p1, s, e, left, right) =>
            build(j, left, right, p1, s, e, cond, hint, w, equis)
        }
      case _ => None
    }
  }

  /** `a = b` with one side's refs in each join child (either way) —
    * the conjuncts Spark's ExtractEquiJoinKeys would hash on. */
  private def isEquiAcross(c: Expression, left: LogicalPlan,
      right: LogicalPlan): Boolean = c match {
    case EqualTo(a, b) if c.deterministic =>
      (a.references.subsetOf(left.outputSet) &&
        b.references.subsetOf(right.outputSet)) ||
        (a.references.subsetOf(right.outputSet) &&
          b.references.subsetOf(left.outputSet))
    case _ => false
  }

  /** point refs ⊆ left, both bounds' refs ⊆ right (the caller tries
    * both orientations via the Join's own sides). */
  private def sidesSplit(p: Expression, s: Expression, e: Expression,
      left: LogicalPlan, right: LogicalPlan): Boolean =
    (p.references.subsetOf(left.outputSet) &&
      s.references.subsetOf(right.outputSet) &&
      e.references.subsetOf(right.outputSet)) ||
      (p.references.subsetOf(right.outputSet) &&
        s.references.subsetOf(left.outputSet) &&
        e.references.subsetOf(left.outputSet))

  private def build(j: Join, left: LogicalPlan, right: LogicalPlan,
      p: Expression, s: Expression, e: Expression, cond: Expression,
      hint: JoinHint, w: Long, equis: Seq[Expression]): LogicalPlan = {
    val pointOnLeft = p.references.subsetOf(left.outputSet)
    val (pointSide, ivSide) = if (pointOnLeft) (left, right) else (right, left)
    def cell(x: Expression): Expression =
      IntegralDivide(Cast(x, LongType), Literal(w))
    val pCell = Alias(cell(p), "__pcell")()
    val newPoint = Project(pointSide.output :+ pCell, pointSide)
    // Sequence is TimeZoneAware — without an explicit zone it stays
    // unresolved and the optimizer rejects the rewritten plan
    val seqExpr = new Sequence(cell(s), cell(e), Some(Literal(1L)))
      .withTimeZone(conf.sessionLocalTimeZone)
    // inverted intervals (e < s) matched nothing before the rewrite;
    // Sequence would THROW on them, so guard to an empty cell list —
    // a transparent rewrite must never change observable behavior
    val gen = Explode(If(LessThanOrEqual(cell(s), cell(e)), seqExpr,
      Literal.create(Seq.empty[Long], seqExpr.dataType)))
    val el = gen.elementSchema.head
    val iCell = AttributeReference("__icell", el.dataType, el.nullable)()
    val newIv = Generate(gen, unrequiredChildIndex = Nil, outer = false,
      qualifier = None, generatorOutput = Seq(iCell), child = ivSide)
    val (nl, nr) = if (pointOnLeft) (newPoint, newIv) else (newIv, newPoint)
    // equi conjuncts ride along: the hash key becomes (equi…, cell)
    val joinCond = (equis :+ (EqualTo(pCell.toAttribute, iCell): Expression))
      .reduce(And(_, _))
    val joined = Join(nl, nr, Inner, Some(joinCond), hint)
    Project(j.output, Filter(cond, joined))
  }
}
