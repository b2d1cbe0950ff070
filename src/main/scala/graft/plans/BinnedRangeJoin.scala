package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: rewrite a pure range-predicate join (point-in-interval,
  * the band-join a user naturally writes as `p BETWEEN s AND e`) into the
  * bin-replicated equi-join of [[graft.operators.RangeJoin]].
  *
  * Without an equi-key Catalyst can only plan BroadcastNestedLoopJoin —
  * O(|points|·|intervals|) comparisons serialized behind one broadcast.
  * This rule detects an inner join whose condition conjuncts contain a
  * lower bound (`p >= s`) and an upper bound (`p <= e`) on the SAME
  * integral point expression, with the point on one side and both bounds
  * on the other, and no equality key; it then:
  *
  *   - appends `bin(p)` to the point side (`floor(p / W)` — any monotone
  *     binning works; truncation details don't matter because the exact
  *     predicate is kept as a residual);
  *   - appends an exploded `bin(s)..bin(e)` column to the interval side
  *     (empty/inverted intervals survive replication and die in the
  *     residual filter);
  *   - joins on the bin equality plus the ORIGINAL condition, restoring
  *     the exact output columns with a final Project.
  *
  * Semantics-preserving for any parent: containment implies the bins
  * collide (monotonicity), so no qualifying pair is lost; every extra
  * bin-collision pair is removed by the residual original condition.
  * The bin width trades replication against per-bin candidate volume —
  * width only affects performance, never results; callers needing a tuned
  * width use `RangeJoin.pointInInterval` directly.
  *
  * Injected by [[graft.functions.GraftExtensions]] alongside
  * [[TiledSimilarityJoin]].
  */
object BinnedRangeJoin extends Rule[LogicalPlan] {

  /** Default bin width in point units. */
  val BinWidth = 32L

  private val BinPrefix = "__rbin_"

  private def integral(e: Expression): Boolean = e.dataType match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case x => Seq(x)
  }

  private def hasEquiKey(e: Expression): Boolean = e.exists {
    case _: EqualTo | _: EqualNullSafe => true
    case _ => false
  }

  /** (point, lowerBound) out of a conjunct, if it is one. */
  private def lower(e: Expression): Option[(Expression, Expression)] = e match {
    case GreaterThanOrEqual(p, s) => Some((p, s))
    case LessThanOrEqual(s, p) => Some((p, s))
    case _ => None
  }
  private def upper(e: Expression): Option[(Expression, Expression)] = e match {
    case LessThanOrEqual(p, x) => Some((p, x))
    case GreaterThanOrEqual(x, p) => Some((p, x))
    case _ => None
  }

  private def bin(e: Expression): Expression =
    Floor(Divide(Cast(e, DoubleType), Literal(BinWidth.toDouble)))

  private def alreadyBinned(p: LogicalPlan): Boolean =
    p.output.exists(_.name.startsWith(BinPrefix))

  /** The detected band: point expr, low expr, high expr, true iff the
    * point comes from the LEFT side. */
  private def findBand(cond: Expression, l: LogicalPlan, r: LogicalPlan)
      : Option[(Expression, Expression, Expression, Boolean)] = {
    val cs = conjuncts(cond)
    val lowers = cs.flatMap(lower)
    val uppers = cs.flatMap(upper)
    (for {
      (p1, s) <- lowers
      (p2, e) <- uppers
      if p1.semanticEquals(p2) && integral(p1) && integral(s) && integral(e)
      side <-
        if (p1.references.subsetOf(l.outputSet) &&
            (s.references ++ e.references).subsetOf(r.outputSet)) Some(true)
        else if (p1.references.subsetOf(r.outputSet) &&
            (s.references ++ e.references).subsetOf(l.outputSet)) Some(false)
        else None
    } yield (p1, s, e, side)).headOption
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(l, r, Inner | Cross, Some(cond), hint)
        if !hasEquiKey(cond) && !alreadyBinned(l) && !alreadyBinned(r) &&
          findBand(cond, l, r).isDefined =>
      val (p, s, e, pointOnLeft) = findBand(cond, l, r).get
      val (pointSide, intervalSide) = if (pointOnLeft) (l, r) else (r, l)

      val pbin = Alias(bin(p), s"${BinPrefix}p")()
      val pointPlan = Project(pointSide.output :+ pbin, pointSide)

      val ibinAttr =
        AttributeReference(s"${BinPrefix}i", LongType, nullable = false)()
      // default step: descends for inverted intervals instead of raising —
      // those replicas (and any bin-only collisions) die in the residual.
      // Sequence is TimeZoneAware: resolution requires the zone even for
      // integral sequences.
      val seq = new Sequence(bin(s), bin(e), None, Some(conf.sessionLocalTimeZone))
      val intervalPlan = Generate(Explode(seq), unrequiredChildIndex = Nil,
        outer = false, qualifier = None, generatorOutput = Seq(ibinAttr),
        child = intervalSide)

      val (lt, rt) =
        if (pointOnLeft) (pointPlan, intervalPlan) else (intervalPlan, pointPlan)
      val binEq = EqualTo(pbin.toAttribute, ibinAttr)
      Project(j.output, Join(lt, rt, Inner, Some(And(binEq, cond)), hint))
  }
}
