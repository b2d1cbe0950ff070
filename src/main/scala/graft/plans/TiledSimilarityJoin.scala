package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite a similarity-threshold CROSS join into a
  * block-tiled equi-join (SURVEY preference (c): extend Catalyst only
  * where built-ins can't express the plan we need).
  *
  * The naive all-pairs formulation —
  *
  *   a.join(b, a("id") < b("id")).where(cosineSim(a("v"), b("v")) >= tau)
  *
  * — has no equi-join key, so Spark plans a BroadcastNestedLoopJoin: one
  * task per broadcast side, no parallelism control, driver-sized build
  * side. This rule detects a join whose condition contains a graft cosine
  * threshold and NO equality key, and tiles the cross product:
  *
  *   - each left row gets `p = xxhash64(row) & (T-1)` and replicates over
  *     `q ∈ 0..T-1` (a Generate/explode);
  *   - each right row gets `q = xxhash64(row) & (T-1)` and replicates over
  *     `p ∈ 0..T-1`;
  *   - the join gains the equi-keys `(p, q)` — every ordered pair meets in
  *     exactly one of the T² evenly-sized tiles, so an ordinary shuffle
  *     join distributes the quadratic work across the cluster.
  *
  * The rewrite only APPENDS columns to each side (original attribute ids
  * flow through untouched) and restores the exact original output with a
  * final Project, so it is semantics-preserving for any parent plan.
  * Work is unchanged — Θ(|L|·|R|) pairs are inherent to an exact
  * low-threshold similarity join — but it now parallelizes instead of
  * serializing behind one broadcast.
  *
  * Injected by [[graft.functions.GraftExtensions]]
  * (`spark.sql.extensions`) or per-session via
  * `spark.experimental.extraOptimizations`.
  */
object TiledSimilarityJoin extends Rule[LogicalPlan] {

  /** 8×8 tiles: 64 evenly-sized tasks per join stage. */
  val Tiles = 8

  private val TilePrefix = "__tile_"

  private def hasCosineThreshold(e: Expression): Boolean = e.exists {
    case si: StaticInvoke => si.functionName == "cosineF"
    case _ => false
  }

  private def hasEquiKey(e: Expression): Boolean = e.exists {
    case _: EqualTo | _: EqualNullSafe => true
    case _ => false
  }

  private def alreadyTiled(p: LogicalPlan): Boolean =
    p.output.exists(_.name.startsWith(TilePrefix))

  /** Append `fixed = xxhash64(row) & (Tiles-1)` and an exploded 0..Tiles-1
    * column to `child`; returns (plan, fixedAttr, explodedAttr). */
  private def tileSide(child: LogicalPlan, tag: String): (LogicalPlan, Attribute, Attribute) = {
    val block = Alias(
      Cast(BitwiseAnd(XxHash64(child.output, 42L), Literal((Tiles - 1).toLong)), IntegerType),
      s"$TilePrefix${tag}_b")()
    val projected = Project(child.output :+ block, child)
    val exploded = AttributeReference(s"$TilePrefix${tag}_e", IntegerType, nullable = false)()
    val gen = Generate(
      Explode(CreateArray((0 until Tiles).map(Literal(_)))),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(exploded), child = projected)
    (gen, block.toAttribute, exploded)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(l, r, Inner | Cross, Some(cond), hint)
        if hasCosineThreshold(cond) && !hasEquiKey(cond) &&
          !alreadyTiled(l) && !alreadyTiled(r) =>
      val (lt, lFixed, lExploded) = tileSide(l, "l")
      val (rt, rFixed, rExploded) = tileSide(r, "r")
      // left's fixed block pairs with right's exploded copy and vice versa:
      // pair (x, y) meets exactly in tile (block(x), block(y))
      val tileCond = And(EqualTo(lFixed, rExploded), EqualTo(lExploded, rFixed))
      Project(j.output, Join(lt, rt, Inner, Some(And(tileCond, cond)), hint))
  }
}
