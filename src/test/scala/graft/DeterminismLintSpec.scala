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

  /** Every float aggregate the board is ALLOWED to contain, each one an
    * audited site (PLANS.md round-on-quotient audit): the 6-dp-ROUNDED
    * per-component centroid/codebook means (rounding absorbs the low-
    * bit order dependence, and both engines round the same value — the
    * kmeans/IVF/PQ pattern), plus q55's deliberate NULL-semantics AVG
    * over a tiny fixed frame. Anything new showing up here must either
    * move to sumExact/halfUpMean6 or be argued onto this list.
    *
    * Note the lint sees the FINAL analyzed plan only: v16/v29's kmeans
    * means sit behind their assignment checkpoint barrier and are the
    * same audited round(avg(component), 6) pattern. */
  private val allow: Map[String, Seq[String]] = Map(
    "q55_null_gallery" -> Seq("AVG over double"),
    "v02_label_centroids" -> Seq("AVG over double"),
    "v05_ivf_ann" -> Seq("AVG over double"),
    "v06_ivf_recall" -> Seq("AVG over double"),
    "v12_pq_topk" -> Seq("AVG over double"),
    "v13_ivfpq_topk" -> Seq("AVG over double", "AVG over double"),
    "v15_kmeans" -> Seq("AVG over double"),
    "v20_centroid_classify" -> Seq("AVG over double"),
    "v24_ivf_nprobe_curve" -> Seq("AVG over double"),
    "v25_kmeans_elbow" -> Seq("AVG over double"),
    // v38's half-split centroids: the same audited round(avg, 6)
    // pattern as v02, then SNAPPED to the integer micro-lattice before
    // any cross-half product — everything downstream is exact int64
    "v38_embedding_drift" -> Seq("AVG over double"),
    // v41 embeds v05's IVF pipeline (its audited rounded-centroid AVG);
    // every metric DOWNSTREAM of the ranking is exact integer
    "v41_retrieval_quality" -> Seq("AVG over double")
  )

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
