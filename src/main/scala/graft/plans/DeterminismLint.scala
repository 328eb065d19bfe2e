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

  private def inspect(e: Expression, sink: String => Unit): Unit = e.foreach {
    case s: Sum if isFloat(s.child) =>
      sink(s"order-dependent SUM over ${s.child.dataType.simpleString}: ${s.child.sql.take(120)}")
    case a: Average if isFloat(a.child) =>
      sink(s"order-dependent AVG over ${a.child.dataType.simpleString}: ${a.child.sql.take(120)}")
    case _ => ()
  }

  /** Walk one plan's aggregates/windows, reporting each finding to `sink`
    * — shared by the injected rule (sink = the global drainable set) and
    * [[audit]] (sink = a private buffer, so a concurrent analysis on the
    * same JVM — a streaming micro-batch thread, a parallel spec — can
    * neither contaminate nor be masked by an audit in flight). */
  private def collect(plan: LogicalPlan, sink: String => Unit): Unit =
    plan.foreach {
      case agg: Aggregate => agg.aggregateExpressions.foreach(inspect(_, sink))
      case w: Window =>
        w.windowExpressions.foreach(_.foreach {
          case we: WindowExpression => inspect(we.windowFunction, sink)
          case _ => ()
        })
      case _ => ()
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    collect(plan, f => { findings.add(f); () })
    plan
  }

  /** Every float aggregate the board is ALLOWED to contain, each an
    * audited site (PLANS.md round-on-quotient audit): the 6-dp-ROUNDED
    * per-component centroid/codebook means (rounding absorbs the low-bit
    * order dependence and both engines round the same value — the
    * kmeans/IVF/PQ pattern), plus q55's deliberate NULL-semantics AVG
    * over a tiny fixed frame. A new query showing up here must either
    * move to sumExact/halfUpMean6 or be argued onto this list. Lives in
    * the main tree (not the spec) so [[graft.Verify]] enforces it as a
    * hard pre-gate on every full dump — a query added without a spec run
    * can no longer reach the driver carrying a raw float sum
    * (round-10 verdict item 7). */
  val allowlist: Map[String, Seq[String]] = Map(
    "q55_null_gallery" -> Seq("AVG over double"),
    "v02_label_centroids" -> Seq("AVG over double"),
    "v05_ivf_ann" -> Seq("AVG over double"),
    "v06_ivf_recall" -> Seq("AVG over double"),
    "v20_centroid_classify" -> Seq("AVG over double"),
    // v38's half-split centroids: the same audited round(avg, 6) pattern
    // as v02, then SNAPPED to the integer micro-lattice before any
    // cross-half product — everything downstream is exact int64
    "v38_embedding_drift" -> Seq("AVG over double"),
    // v41 embeds v05's IVF pipeline (its audited rounded-centroid AVG);
    // every metric DOWNSTREAM of the ranking is exact integer
    "v41_retrieval_quality" -> Seq("AVG over double"))

  /** BUILDER-SIDE allowlist: float aggregates that appear ONLY in plans
    * analyzed while the query builder runs — k-means/IVF training frames
    * whose lineage `localCheckpoint` cuts out of the returned plan (the
    * v16/v29 "materializes once" audit shape). Invisible to every gate
    * until round 12's drained-findings attribution in [[graft.Verify]]
    * made builder-time analyses auditable; both sites are the SAME
    * audited `round(avg, 6)` centroid pattern as the main allowlist
    * (rounding absorbs the low-bit order dependence before any value is
    * used). Kept separate from [[allowlist]] because the author-time spec
    * sweep (DeterminismLintSpec) lints RETURNED plans only — a row here
    * must NOT make the spec expect a finding the returned plan cannot
    * show. */
  val builderAllowlist: Map[String, Seq[String]] = Map(
    "v16_semantic_dedup" -> Seq("AVG over double"),
    "v39_ivf_balance" -> Seq("AVG over double"),
    // v43/v44's sample-trained PQ codebook: the same audited round(avg, 6)
    // centroid pattern (v12's recipe); eager survivor checkpoints cut it
    // out of the returned plan, so it is builder-time only
    "v43_cascade_pq" -> Seq("AVG over double"),
    "v44_cascade_pq_recall" -> Seq("AVG over double"),
    // r16 plan-barrier optimization: the SAME audited round(avg, 6)
    // centroid/codebook means as before, now behind the per-iteration /
    // per-frame eager localCheckpoints that killed the exponential plan
    // growth (kmeansCentroids fold, v12/v13's cbRow, v24's shared cells)
    // — moved here from [[allowlist]] because the returned plan no longer
    // shows them
    "v12_pq_topk" -> Seq("AVG over double"),
    "v13_ivfpq_topk" -> Seq("AVG over double", "AVG over double"),
    "v15_kmeans" -> Seq("AVG over double"),
    "v24_ivf_nprobe_curve" -> Seq("AVG over double"),
    "v25_kmeans_elbow" -> Seq("AVG over double"))

  /** Collapse a finding to its comparable shape ("SUM over double"). */
  def shapeOf(finding: String): String =
    finding.split(":").head.replace("order-dependent ", "")

  /** Lint one query's analyzed plan against the allowlist; returns an
    * error description, or None when the findings match the audited
    * shapes exactly (drift in EITHER direction is an error — a stale
    * allowlist row is as wrong as a new raw float sum). */
  def audit(name: String, plan: LogicalPlan): Option[String] =
    audit(name, plan, Nil)

  /** As [[audit]], but also audits `drained` — findings the INJECTED
    * rule collected while the query builder ran (streaming micro-batch
    * analyses, side actions like k-means training collects — plans that
    * never appear in the returned DataFrame). [[graft.Verify]] injects
    * the rule into its session, drains before each builder, and passes
    * the post-builder drain here, so a raw float SUM inside a streaming
    * sink is a dump failure too, not just one in the returned batch plan.
    *
    * TWO SEPARATE gates, deliberately asymmetric (round-12 ADVICE — the
    * old presence-conditional union over a string-deduped set made the
    * verdict depend on whether builder memos were cold and on finding
    * strings being byte-identical across re-analyses):
    *  - RETURNED plan vs [[allowlist]]: exact multiset match, drift in
    *    either direction is an error. The returned plan is a pure
    *    function of the query text, so strict equality is stable.
    *  - BUILDER-time drain vs the two allowlists' SHAPE union: subset
    *    only. How many times (and under which alias) a builder-side
    *    frame gets analyzed depends on cache warmth and analyzer memo
    *    state — a warmed builder cache may skip a training analysis
    *    entirely, and the same AVG can yield differently-aliased finding
    *    strings across sub-frames. What must never vary: no UNAUDITED
    *    float-aggregate shape appears anywhere in the builder's work.
    *    (Staleness of [[builderAllowlist]] rows is the one check this
    *    direction can't express; it is reviewed at the source, where
    *    each row cites the checkpoint-hidden site it covers.) */
  def audit(name: String, plan: LogicalPlan,
            drained: Seq[String]): Option[String] = {
    // Local buffer, NOT the process-global set: the same rule runs as a
    // session extension on every analysis in this JVM, so draining the
    // shared set here would discard (or absorb) findings from whatever
    // else is being analyzed between the drains.
    val returned = scala.collection.mutable.LinkedHashSet.empty[String]
    collect(plan, f => { returned += f; () })
    val shapes = returned.toSeq.map(shapeOf).sorted
    val allowed = allowlist.getOrElse(name, Nil).sorted
    if (shapes != allowed)
      return Some(s"determinism lint: $name has float aggregates $shapes, " +
        s"allowlist says $allowed (raw float SUM/AVG is order-dependent " +
        "across engines; use sumExact/halfUpMean6 or audit the site)")
    val budget = (allowed ++ builderAllowlist.getOrElse(name, Nil)).toSet
    val drainedShapes = drained.map(shapeOf)
    val rogue = drainedShapes.distinct.sorted.filterNot(budget)
    if (rogue.nonEmpty)
      return Some(s"determinism lint: $name builder-time analyses carry float " +
        s"aggregates $rogue outside the audited shapes $budget (a plan " +
        "built and run inside the query builder is as cross-engine-" +
        "visible as the returned one; use sumExact/halfUpMean6 or audit " +
        "the site into builderAllowlist)")
    // Occurrence band (round-13 ADVICE): subset-only checking means a
    // query already audited for "AVG over double" admits ANY number of
    // NEW builder-side sites of that shape silently. Exact counts can't
    // be pinned — how often a builder frame is analyzed depends on cache
    // warmth and analyzer memo state — so the gate is a generous BAND,
    // not an equality: the measured per-query maximum across every
    // draining query on the board is 2 (v13; the rest drain 1 — Verify
    // prints each query's counts), so the 16-occurrence band is an 8×
    // warmth allowance while a runaway (dozens of new unaudited sites
    // hiding behind one audited shape) still lands far above it.
    val overBand = drainedShapes.groupBy(identity).collect {
      case (sh, occ) if occ.size > maxDrainedPerShape => s"$sh ×${occ.size}"
    }
    if (overBand.nonEmpty)
      Some(s"determinism lint: $name builder-time analyses repeat audited " +
        s"float-aggregate shapes beyond the warmth band (${overBand.mkString(", ")}" +
        s" > $maxDrainedPerShape): new sites are hiding behind an audited " +
        "shape — audit them individually or argue the documented band up")
    else None
  }

  /** Max builder-time drains tolerated PER audited shape — 8× the worst
    * measured per-query count (see [[audit]]'s occurrence band). */
  val maxDrainedPerShape: Int = 16
}
