package org.apache.spark.sql.graftx

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Optimizer rule: answer an aggregate over a fact table from a REGISTERED
  * materialized summary instead of rescanning the fact — the classic
  * materialized-view rewrite (Oracle/Calcite/Snowflake class). At 100 TB
  * this is the difference between a dashboard query costing a full fact
  * scan and costing a scan of a few-thousand-row summary: partial
  * aggregates re-aggregate, so any GROUP BY over a SUBSET of the summary
  * keys (optionally filtered ON those keys) is answerable exactly.
  *
  * Soundness conditions, all checked structurally:
  *   - the aggregate's child is the registered fact scan (matched by file
  *     root paths; an interposed column-pruning Project and/or a Filter
  *     whose references are all summary KEYS are unwrapped — a filter on a
  *     non-key column would need finer grain than the summary has);
  *   - every grouping expression is a bare fact column that is a summary
  *     key;
  *   - every aggregate is derivable from a registered partial:
  *     `count(1)` → SUM(cnt), `sum(x)` → SUM(sum_x), `min(x)` → MIN(min_x),
  *     `max(x)` → MAX(max_x), with `x` matched by expression SHAPE
  *     (attribute names, casts, literals — exprId-free), no DISTINCT, no
  *     FILTER clauses. Anything else vetoes the whole rewrite — a partial
  *     rewrite would double-scan.
  *
  * The rewritten Aggregate re-aggregates the summary plan, aliasing every
  * output back to the ORIGINAL exprIds so downstream references keep
  * resolving; a Cast to the original data type guards the widened partial
  * types (sum-of-sum stays in the same decimal class here, but the cast
  * makes the contract explicit).
  *
  * Opt-in via `spark.graft.summary.rewrite` (the RangeJoinRewrite
  * discipline: Graft.confs pins it false, a query enables it right before
  * building its plan, and the next Tables.load resets it). Registration is
  * process-wide and keyed by fact root paths; [[clear]] drops it.
  */
object SummaryRewrite extends Rule[LogicalPlan] {

  val EnableConf = "spark.graft.summary.rewrite"

  /** kind ∈ count | sum | min | max; `inputShape` is [[shape]] of the
    * partial's input expression (ignored for count). */
  final case class Measure(kind: String, inputShape: String, summaryCol: String)

  final case class Registered(
      paths: Set[String], keys: Set[String], measures: Seq[Measure],
      plan: LogicalPlan) {
    def summaryAttr(name: String): Option[Attribute] =
      plan.output.find(_.name.equalsIgnoreCase(name))
  }

  private val registry = new ConcurrentHashMap[Set[String], Registered]()

  /** Register `summary` (checkpointed/materialized: its plan must not scan
    * the fact) as the partial-aggregate table for `fact` grouped by `keys`.
    * @param measures (kind, partial input column, summary column name) */
  def register(fact: DataFrame, keys: Seq[String],
      measures: Seq[(String, Column, String)], summary: DataFrame): Unit = {
    val paths = factPaths(fact.queryExecution.analyzed)
    require(paths.nonEmpty, "fact frame has no file-relation scan to key on")
    val ms = measures.map { case (kind, c, out) =>
      Measure(kind, shapeOf(fact, c), out)
    }
    registry.put(paths,
      Registered(paths, keys.map(_.toLowerCase).toSet, ms,
        summary.queryExecution.analyzed))
  }

  def clear(): Unit = registry.clear()

  /** The shape key a measure Column registers/matches under: Spark 4's
    * Column is a lazy ColumnNode, so the Catalyst tree only exists after
    * ANALYSIS — resolve it through a throwaway projection over the fact. */
  def shapeOf(fact: DataFrame, c: Column): String = {
    val analyzed = fact.select(c).queryExecution.analyzed
    val e = analyzed.asInstanceOf[Project].projectList.head match {
      case Alias(child, _) => child
      case other => other
    }
    shape(e)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val enabled =
      try conf.getConfString(EnableConf, "false").toBoolean
      catch { case _: IllegalArgumentException => false }
    if (!enabled || registry.isEmpty) plan
    else plan.transformUp {
      case agg @ Aggregate(groupExprs, aggExprs, child, _) =>
        rewrite(groupExprs, aggExprs, child).getOrElse(agg)
    }
  }

  /** Expression identity up to exprIds: names, casts, literals, shape. */
  private def shape(e: Expression): String = e match {
    case a: AttributeReference => s"attr:${a.name.toLowerCase}"
    case u: UnresolvedAttribute => s"attr:${u.name.toLowerCase}"
    case c: Cast => s"cast(${shape(c.child)} as ${c.dataType.sql.toLowerCase})"
    case l: Literal => s"lit:$l"
    case o => o.getClass.getSimpleName +
      o.children.map(shape).mkString("(", ",", ")")
  }

  private def factPaths(plan: LogicalPlan): Set[String] = plan.collect {
    case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
      fs.location.rootPaths.map(_.toString)
  }.flatten.toSet

  /** Unwrap column-pruning Projects / key-only Filters down to the fact
    * scan; returns the filter condition (if any) to replay on the summary. */
  private def unwrap(child: LogicalPlan, keys: Set[String])
      : Option[(Set[String], Option[Expression])] = child match {
    case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
      Some((fs.location.rootPaths.map(_.toString).toSet, None))
    case Project(exprs, inner) if exprs.forall(_.isInstanceOf[Attribute]) =>
      unwrap(inner, keys)
    case Filter(cond, inner)
        if cond.references.forall(a => keys(a.name.toLowerCase)) &&
          cond.deterministic =>
      unwrap(inner, keys).map { case (paths, prior) =>
        (paths, Some(prior.map(And(_, cond)).getOrElse(cond)))
      }
    case _ => None
  }

  private def rewrite(groupExprs: Seq[Expression],
      aggExprs: Seq[NamedExpression], child: LogicalPlan): Option[LogicalPlan] = {
    // candidate registration: the one whose keys make the child's filter
    // (if any) key-only AND whose paths match the unwrapped scan
    import scala.jdk.CollectionConverters._
    registry.values().asScala.toSeq
      .flatMap { reg =>
        unwrap(child, reg.keys) match {
          case Some((paths, filt)) if paths == reg.paths =>
            tryRewrite(reg, groupExprs, aggExprs, filt)
          case _ => None
        }
      }.headOption
  }

  private def tryRewrite(reg: Registered, groupExprs: Seq[Expression],
      aggExprs: Seq[NamedExpression],
      filt: Option[Expression]): Option[LogicalPlan] = {
    // Each substitution gets a FRESH instance of the summary plan
    // (MultiInstanceRelation, the same mechanism self-joins use): two
    // rewritten aggregates in one query tree must not share exprIds, or a
    // join of the two would carry ambiguous attributes.
    val freshPlan = reg.plan match {
      case m: org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation =>
        m.newInstance().asInstanceOf[LogicalPlan]
      case p => p
    }
    def sAttr(name: String): Option[Attribute] =
      freshPlan.output.find(_.name.equalsIgnoreCase(name))

    // grouping: bare key columns only
    val groupNames = groupExprs.map {
      case a: AttributeReference if reg.keys(a.name.toLowerCase) =>
        a.name.toLowerCase
      case _ => return None
    }

    def partial(fn: AggregateFunction): Option[Expression] = fn match {
      // count(*) / count(1) only: the child must be foldable AND non-null —
      // a constant-folded count(NULL) is legal SQL meaning 0, and mapping
      // it to SUM(cnt) would return the total row count instead. The
      // rewrite is wrapped in coalesce(..., 0): a GLOBAL aggregate (no
      // GROUP BY) whose key filter matches zero summary rows must still
      // return count=0, but SUM over an empty frame is NULL.
      case c: Count if c.children.forall(ch => ch.foldable && !ch.nullable) =>
        reg.measures.find(_.kind == "count")
          .flatMap(m => sAttr(m.summaryCol))
          .map(a => Coalesce(Seq(
            Cast(Sum(a).toAggregateExpression(), org.apache.spark.sql.types.LongType),
            Literal(0L))))
      case s: Sum =>
        reg.measures.find(m => m.kind == "sum" && m.inputShape == shape(s.child))
          .flatMap(m => sAttr(m.summaryCol))
          .map(a => Sum(a).toAggregateExpression())
      case mi: Min =>
        reg.measures.find(m => m.kind == "min" && m.inputShape == shape(mi.child))
          .flatMap(m => sAttr(m.summaryCol))
          .map(a => Min(a).toAggregateExpression())
      case ma: Max =>
        reg.measures.find(m => m.kind == "max" && m.inputShape == shape(ma.child))
          .flatMap(m => sAttr(m.summaryCol))
          .map(a => Max(a).toAggregateExpression())
      case _ => None
    }

    // every agg output must be rewritable — otherwise veto (a partial
    // rewrite would scan both the summary AND the fact)
    def rewriteAggExpr(ae: AggregateExpression): Option[Expression] =
      if (ae.isDistinct || ae.filter.nonEmpty) None
      else partial(ae.aggregateFunction)

    val rewritten: Seq[NamedExpression] = aggExprs.map {
      case a: AttributeReference if reg.keys(a.name.toLowerCase) =>
        sAttr(a.name) match {
          case Some(sa) =>
            Alias(sa, a.name)(exprId = a.exprId, qualifier = a.qualifier)
          case None => return None
        }
      case al @ Alias(ae: AggregateExpression, name) =>
        rewriteAggExpr(ae) match {
          case Some(e) =>
            Alias(Cast(e, al.dataType), name)(
              exprId = al.exprId, qualifier = al.qualifier)
          case None => return None
        }
      case al @ Alias(Cast(ae: AggregateExpression, t, tz, ansi), name) =>
        rewriteAggExpr(ae) match {
          case Some(e) =>
            Alias(Cast(Cast(e, ae.dataType), t, tz, ansi), name)(
              exprId = al.exprId, qualifier = al.qualifier)
          case None => return None
        }
      case al @ Alias(a: AttributeReference, name) if reg.keys(a.name.toLowerCase) =>
        sAttr(a.name) match {
          case Some(sa) =>
            Alias(sa, name)(exprId = al.exprId, qualifier = al.qualifier)
          case None => return None
        }
      case _ => return None
    }

    val base = filt match {
      case Some(cond) =>
        val remapped = cond.transform {
          case a: AttributeReference =>
            sAttr(a.name).getOrElse(return None)
        }
        Filter(remapped, freshPlan)
      case None => freshPlan
    }
    val newGroups = groupNames.map(n => sAttr(n).getOrElse(return None))
    Some(Aggregate(newGroups, rewritten, base))
  }
}
