package graft

import org.apache.spark.sql.functions._

import graft.plans.DeterminismLint

/** The analyzer-level determinism lint (plans/DeterminismLint): unit
  * semantics, then the BOARD-WIDE audit — every registered query's
  * analyzed plan is linted and the float-aggregate findings must equal
  * the documented allowlist exactly. This is the plan-level form of the
  * round-9 typed-sum gate: lexical checks (RegistrySpec) can't see
  * through CTE aliases; the analyzed plan has resolved types. */
class DeterminismLintSpec extends SparkSpec {

  private def lint(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    DeterminismLint.drain()
    DeterminismLint(df.queryExecution.analyzed)
    DeterminismLint.drain()
  }

  test("flags raw double SUM/AVG in aggregates and windows") {
    import spark.implicits._
    val df = Seq((1L, 1.5), (2L, 2.5)).toDF("k", "v")
    assert(lint(df.agg(sum($"v"))).exists(_.contains("SUM over double")))
    assert(lint(df.agg(avg($"v"))).exists(_.contains("AVG over double")))
    val w = org.apache.spark.sql.expressions.Window.orderBy($"k")
    assert(lint(df.withColumn("s", sum($"v").over(w)))
      .exists(_.contains("SUM over double")))
  }

  test("exact-decimal sums and integer aggregates pass clean") {
    import spark.implicits._
    val df = Seq((1L, 1.5), (2L, 2.5)).toDF("k", "v")
    assert(lint(df.agg(queries.sumExact($"v"))).isEmpty)
    assert(lint(df.agg(sum($"k"), count(lit(1)))).isEmpty)
    val w = org.apache.spark.sql.expressions.Window.orderBy($"k")
    assert(lint(df.withColumn("s", sum($"k").over(w))).isEmpty)
  }

  test("injection point applies the lint without altering the plan") {
    import spark.implicits._
    val df = Seq((1L, 1.5)).toDF("k", "v").agg(sum($"v"))
    val plan = df.queryExecution.analyzed
    assert(DeterminismLint(plan) eq plan)
  }

  // the audited allowlist lives in the main tree (DeterminismLint.allowlist)
  // so Verify enforces it as a hard pre-gate on every dump; this spec is
  // the author-time twin of the same check plus unit semantics above
  private val allow: Map[String, Seq[String]] = DeterminismLint.allowlist

  test("board-wide audit: float aggregates confined to the audited allowlist") {
    val got = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val fs = lint(fn(spark, sf))
      if (fs.isEmpty) Nil else Seq(name -> fs)
    }.toMap
    val gotShapes = got.view
      .mapValues(_.map(_.split(":").head.replace("order-dependent ", ""))
        .sorted.toSeq).toMap
    val allowShapes = allow.view.mapValues(_.sorted).toMap
    assert(gotShapes == allowShapes,
      s"float-aggregate audit drifted.\n  got:   $gotShapes\n  allow: $allowShapes")
    // the headline invariant: NO raw float SUM anywhere on the board
    assert(!got.values.flatten.exists(_.contains("SUM over")),
      s"raw float SUM found: $got")
  }
}
