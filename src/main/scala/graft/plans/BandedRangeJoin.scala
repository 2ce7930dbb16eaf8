package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Union}
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: rewrite bounded range joins into banded equi joins.
  *
  * A join whose only condition is a pure range predicate
  * `y < x AND x <= y + W` (no equi key) plans as a
  * BroadcastNestedLoopJoin — quadratic work that dies at scale. But
  * any in-range partner satisfies `x div W ∈ {y div W, y div W + 1}`
  * (proved for both floor and truncating division, any sign), so the
  * join splits into TWO hash joins keyed on the band — the rewrite the
  * p05 embedding near-dup query applies by hand
  * (`Pipeline.scala`), generalized here as a `Rule[LogicalPlan]` so
  * ANY query in the session gets it automatically. The two band
  * branches are disjoint (x div W takes exactly one value per row
  * pair), so they recombine with UNION ALL — no dedup.
  *
  * The reference delegates all planning to its vendored engine and has
  * no counterpart; this is the Spark-native extension path
  * (SURVEY §4.3): a custom rule injected via [[GraftSparkExtensions]]
  * (`spark.sql.extensions=graft.plans.GraftSparkExtensions`) or
  * `spark.experimental.extraOptimizations`.
  *
  * Scope: INNER/CROSS joins whose condition splits into exactly a
  * lower bound `x > y` / `x >= y + c` and an upper bound
  * `x <= y + W` with integral x from one side, y from the other, and
  * literal W > 0 — and no existing cross-side equi predicate (those
  * joins already hash-partition).
  */
object BandedRangeJoin extends Rule[LogicalPlan] with PredicateHelper {

  private def intLit(e: Expression): Option[Long] = e match {
    case Literal(v: Int, IntegerType) => Some(v.toLong)
    case Literal(v: Long, LongType) => Some(v)
    case _ => None
  }

  private def integral(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType

  /** (x, y, width): condition is y < x ≤ y + width, x/y evaluable on
    * opposite sides of the join. */
  private def extractRange(conjuncts: Seq[Expression], left: LogicalPlan,
      right: LogicalPlan): Option[(Expression, Expression, Long)] = {
    // normalize every comparison to (smaller, larger) "lower" bounds
    // and (larger, smallerPlusW) "upper" bounds on x
    val lowers = conjuncts.collect {
      case GreaterThan(x, y) => (x, y)
      case LessThan(y, x) => (x, y)
    }
    val uppers = conjuncts.collect {
      case LessThanOrEqual(x, Add(y, w, _)) => (x, y, w)
      case GreaterThanOrEqual(Add(y, w, _), x) => (x, y, w)
    }
    (for {
      (x, y) <- lowers
      (ux, uy, w) <- uppers
      if ux.semanticEquals(x) && uy.semanticEquals(y)
      width <- intLit(w)
      if width > 0 && integral(x) && integral(y)
      if x.deterministic && y.deterministic
      if (canEvaluate(x, left) && canEvaluate(y, right)) ||
        (canEvaluate(x, right) && canEvaluate(y, left))
    } yield (x, y, width)).headOption
  }

  private def hasCrossSideEquiKey(conjuncts: Seq[Expression],
      left: LogicalPlan, right: LogicalPlan): Boolean =
    conjuncts.exists {
      case EqualTo(a, b) =>
        (canEvaluate(a, left) && canEvaluate(b, right)) ||
          (canEvaluate(a, right) && canEvaluate(b, left))
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner | Cross, Some(cond), hint)
        if !hasCrossSideEquiKey(splitConjunctivePredicates(cond), left, right) =>
      extractRange(splitConjunctivePredicates(cond), left, right) match {
        case Some((x, y, w)) =>
          def band(e: Expression) =
            IntegralDivide(Cast(e, LongType), Literal(w))
          val sameBand = EqualTo(band(x), band(y))
          val nextBand = EqualTo(band(x), Add(band(y), Literal(1L)))
          Union(Seq(
            Join(left, right, j.joinType, Some(And(cond, sameBand)), hint),
            Join(left, right, j.joinType, Some(And(cond, nextBand)), hint)))
        case None => j
      }
  }
}

/** Session extension entry point:
  * `--conf spark.sql.extensions=graft.plans.GraftSparkExtensions`. */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit =
    extensions.injectOptimizerRule(_ => BandedRangeJoin)
}
