package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, WindowExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{Average, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, FloatType}

/** Analyzer-level DETERMINISM LINT — the repo's cross-engine discipline
  * (PLANS.md "round-on-quotient audit", the round-9 typed-sum rule)
  * enforced where it can actually see through aliases and CTEs: the
  * analyzed logical plan.
  *
  * `SUM`/`AVG` over raw FLOAT/DOUBLE is ORDER-DEPENDENT: Spark's
  * partial aggregation and DuckDB's scan order add the same values in
  * different sequences, so the low bits of the result differ between
  * engines (and between runs at different parallelism) even though
  * both are "correct" IEEE sums. Every oracle-checked query here sums
  * through an exact DECIMAL ([[graft.queries.sumExact]]) or integer
  * micro-units instead — and this rule makes that convention a
  * machine-checked invariant rather than a review item: it flags any
  * float-typed Sum/Average in aggregates or window expressions.
  *
  * The rule MUTATES NOTHING — it records findings (plan-fragment SQL)
  * in a drainable set and returns the plan unchanged, so injecting it
  * can never alter results. Injected via [[graft.functions.GraftExtensions]]
  * as a post-hoc-resolution rule; specs also apply it directly to
  * `df.queryExecution.analyzed`.
  *
  * Lexical gates (RegistrySpec's CAST-around-SUM regex) miss flows
  * where the doubled value hides behind a CTE alias — exactly the gs24
  * shape round 9 called out. At the analyzed-plan level the type is
  * already resolved, so the alias is transparent.
  */
object DeterminismLint extends Rule[LogicalPlan] {

  /** Drainable findings: description of each flagged aggregate. */
  val findings: java.util.Set[String] =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def drain(): Seq[String] = {
    val out = scala.jdk.CollectionConverters.SetHasAsScala(findings)
      .asScala.toSeq.sorted
    findings.clear()
    out
  }

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case DoubleType | FloatType => true
    case _ => false
  }

  private def inspect(e: Expression): Unit = e.foreach {
    case s: Sum if isFloat(s.child) =>
      findings.add(s"order-dependent SUM over ${s.child.dataType.simpleString}: ${s.child.sql.take(120)}")
    case a: Average if isFloat(a.child) =>
      findings.add(s"order-dependent AVG over ${a.child.dataType.simpleString}: ${a.child.sql.take(120)}")
    case _ => ()
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    plan.foreach {
      case agg: Aggregate => agg.aggregateExpressions.foreach(inspect)
      case w: Window =>
        w.windowExpressions.foreach(_.foreach {
          case we: WindowExpression => inspect(we.windowFunction)
          case _ => ()
        })
      case _ => ()
    }
    plan
  }
}
