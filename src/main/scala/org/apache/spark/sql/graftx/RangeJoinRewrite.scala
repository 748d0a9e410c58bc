package org.apache.spark.sql.graftx

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: plan point-in-interval non-equi inner joins as bucketed
  * equi-joins automatically.
  *
  * `a JOIN b ON b.lo < a.p AND a.p <= b.hi` has no equi-key, so Catalyst
  * falls back to BroadcastNestedLoopJoin/CartesianProduct — O(|a|·|b|)
  * compares. This rule rewrites the logical join into the same
  * bucket-and-refine shape `graft.operators.RangeJoin` builds by hand
  * (quantize the range dimension, explode each interval to its covered
  * bucket ids, equi-join on bucket id, re-check the exact predicate), so
  * raw SQL range joins get the scale-safe plan without the caller knowing
  * the trick. Each pair meets in exactly one bucket (the point's own), so
  * no dedup is needed; the original predicates are re-applied verbatim, so
  * the rewrite is exact for every combination of strict/inclusive bounds.
  *
  * Guarded by `spark.graft.rangeJoin.bucketWidth` (0 = off, the default):
  * the bucket width is workload-dependent (expansion factor is
  * interval_len/width + 1), so it is an explicit opt-in, like every
  * engine's interval-join bin size. Bucket math is exact integer floor
  * division ((c - pmod(c, w)) div w — IntegralDivide on an exactly
  * divisible numerator, no doubles, pre-1970 safe). Fires only when the
  * join has NO equi conjunct (a hash-joinable join is left alone — and the
  * rewritten join gains one, so the rule cannot re-fire on its own
  * output), both bound expressions live on one side, the point on the
  * other, and all three are integral.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val WidthConf = "spark.graft.rangeJoin.bucketWidth"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val width =
      try conf.getConfString(WidthConf, "0").toLong
      catch { case _: NumberFormatException => 0L }
    if (width <= 0) plan
    else plan.transformUp {
      case j: Join if j.joinType == Inner && j.condition.isDefined =>
        rewrite(j, width).getOrElse(j)
    }
  }

  private def isIntegral(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType

  /** (c - pmod(c, w)) div w — exact floor bucket id as a long. */
  private def bucketOf(e: Expression, w: Long): Expression = {
    val el = if (e.dataType == LongType) e else Cast(e, LongType)
    val wl = Literal(w, LongType)
    IntegralDivide(Subtract(el, Pmod(el, wl)), wl)
  }

  private def rewrite(j: Join, width: Long): Option[LogicalPlan] = {
    // side classifier: Some(true)=only left refs, Some(false)=only right
    def sideOf(e: Expression): Option[Boolean] = {
      val refs = e.references
      if (refs.isEmpty) None
      else if (refs.subsetOf(j.left.outputSet)) Some(true)
      else if (refs.subsetOf(j.right.outputSet)) Some(false)
      else None
    }
    val conjuncts = splitConjunctivePredicates(j.condition.get)
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) =>
        (sideOf(a), sideOf(b)) match {
          case (Some(x), Some(y)) => x != y
          case _ => false
        }
      case EqualNullSafe(a, b) =>
        (sideOf(a), sideOf(b)) match {
          case (Some(x), Some(y)) => x != y
          case _ => false
        }
      case _ => false
    }
    if (hasEqui) return None

    // normalize integral cross-side comparisons to (small, large)
    val ordered = conjuncts.flatMap {
      case LessThan(x, y) => Some((x, y))
      case LessThanOrEqual(x, y) => Some((x, y))
      case GreaterThan(x, y) => Some((y, x))
      case GreaterThanOrEqual(x, y) => Some((y, x))
      case _ => None
    }.filter { case (x, y) =>
      isIntegral(x) && isIntegral(y) &&
        ((sideOf(x), sideOf(y)) match {
          case (Some(a), Some(b)) => a != b
          case _ => false
        })
    }
    // a point p is the `large` of one bound and the `small` of another,
    // with both bounds on the opposite side
    val candidate = (for {
      (lo, p1) <- ordered.iterator
      (p2, hi) <- ordered.iterator
      if p1.semanticEquals(p2) && sideOf(lo) == sideOf(hi) &&
        sideOf(p1) != sideOf(lo)
    } yield (p1, lo, hi)).nextOption()

    candidate.map { case (p, lo, hi) =>
      val pointOnLeft = sideOf(p).get
      val (pointPlan, intervalPlan) =
        if (pointOnLeft) (j.left, j.right) else (j.right, j.left)
      // interval side: one row per covered bucket id
      val bucketAttr =
        AttributeReference("graft_range_bucket", LongType, nullable = false)()
      // Sequence is TimeZoneAwareExpression: post-analysis construction
      // must pin the zone itself (ResolveTimeZone has already run)
      val gen = Generate(
        Explode(Sequence(bucketOf(lo, width), bucketOf(hi, width),
          stepOpt = None, timeZoneId = Some(conf.sessionLocalTimeZone))),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(bucketAttr), child = intervalPlan)
      // point side: its single bucket id
      val pAlias = Alias(bucketOf(p, width), "graft_range_bucket")()
      val proj = Project(pointPlan.output :+ pAlias, pointPlan)
      val equi = EqualTo(bucketAttr, pAlias.toAttribute)
      val (newLeft, newRight) = if (pointOnLeft) (proj, gen) else (gen, proj)
      val joined = Join(newLeft, newRight, Inner,
        Some(And(equi, j.condition.get)), j.hint)
      Project(j.output, joined)
    }
  }
}
