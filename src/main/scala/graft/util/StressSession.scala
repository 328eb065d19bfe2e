package graft.util

import org.apache.spark.sql.SparkSession

/** Shared session regime for the measurement mains (Bench / Explain /
  * HashQuery): one place for the SIZE-DERIVED shuffle regime so the
  * measured cost, the recorded plan shape and the result-identity probe
  * all execute the same configuration.
  *
  * What the round-13 128× experiments established (SWEEP13.json,
  * PLANS.md "shuffle-layer regime"):
  *
  *  - `initialPartitionNum` derives from input size (~1 MB source parquet
  *    per initial partition, floor cpus, cap 2048). Measured ALONE it is
  *    non-binding — AQE's coalescing collapses any initial count back to
  *    its target size — but it is the necessary ceiling-lifter
  *    (coalescing can merge, never split), it is free (small stages
  *    coalesce to parallelism), and results are checksum-identical to
  *    the fixed-cpus regime (HashQuery A/B, 4 probes). It is the ONLY
  *    knob set as default policy here.
  *  - `advisoryPartitionSizeInBytes` (64 m default) counts COMPRESSED
  *    shuffle bytes; v09's ~8×-compressible pair stream therefore
  *    rebuilt ~500 MB in-memory reduce partitions whatever the initial
  *    count. 16 m halved v09's spill (21 → 10.5 GB; the remainder is
  *    map-side shuffle-WRITE sort, invariant to reduce count) — but the
  *    SAME setting tripled q38's blocked levenshtein join (299 → 1,000 s
  *    both passes). Workload-dependent ⇒ NOT default; apply per
  *    experiment via SPARK_GRAFT_CONF.
  *  - `objectHashAggregate.sortBased.fallbackThreshold` (128 default)
  *    turns any typed-Aggregator aggregate seeing >128 groups into a
  *    SORT of its entire input. For the vector family's k-BOUNDED
  *    TopKAggregator buffers that sort is pure waste — raising it
  *    eliminated v12/v17/v32/v33's 5.5–14 GB spills and cut v17 36% —
  *    but q38's unbounded block-collect buffers NEED the conservative
  *    default (raised, it ran >2× slower). Scoped per-query instead:
  *    the bounded-buffer queries set it on a child session in their own
  *    builders (`VectorOps.withHashAggBudget`), where the bound is a
  *    structural property of the aggregator, not a bench guess.
  *
  * At sf0.1 and below the derivation floors to `cpus` — the graded bench
  * regime is byte-identical to rounds ≤12. SPARK_GRAFT_CONF
  * (';'-separated k=v pairs, applied last) overrides anything for
  * experiments; SPARK_GRAFT_INITIAL_PARTITIONS=0 restores the legacy
  * fixed-cpus regime (the A/B lever).
  */
object StressSession {

  /** Input bytes = sum of top-level *.parquet file sizes in `sfDir`. */
  def inputBytes(sfDir: String): Long = {
    val dir = new java.io.File(sfDir)
    Option(dir.listFiles())
      .map(_.filter(f => f.isFile && f.getName.endsWith(".parquet"))
        .map(_.length).sum)
      .getOrElse(0L)
  }

  /** The size-derived AQE initial partition count (env-overridable;
    * 0 = legacy fixed-cpus regime). */
  def initialPartitions(sfDir: String, cpus: Int): Int =
    sys.env.get("SPARK_GRAFT_INITIAL_PARTITIONS").map(_.toInt).getOrElse {
      math.max(cpus, math.min(2048L, inputBytes(sfDir) >> 20).toInt)
    }

  /** PER-FAMILY initial-partition regime (round-15 verdict item 6):
    * SWEEP15's fixture-correct A/B put the size-derived AQE initial count
    * +20.6% on q38's blocked-levenshtein medians at 128× while the
    * vector/text movers it exists for kept their wins — the lifted
    * ceiling lets AQE pick a coarser post-shuffle layout for the
    * relational family's skew-prone blocked joins, where the fixed-cpus
    * floor was already right. The split follows the measurement, not a
    * guess: relational (`q`) and time-series (`ts`) queries take the
    * fixed-cpus regime; vector/text/multimodal (`v`/`tx`/`mm`) keep the
    * size-derived ceiling (v09's sub-linear 512× leg rode it); streaming
    * (`gs`) pins its shuffle count per checkpoint and ignores AQE, and
    * canaries (`cn`) are sub-second either way — both grouped with
    * fixed. At sf0.1 and below the derivation floors to cpus, so the
    * graded bench regime is identical for every family (SWEEP16 carries
    * the stress-scale A/B). SPARK_GRAFT_INITIAL_PARTITIONS still
    * overrides everything — the ladder's experiment lever. */
  def initialPartitionsFor(name: String, sfDir: String, cpus: Int): Int = {
    val family = name.takeWhile(_.isLetter)
    family match {
      case "v" | "tx" | "mm" => initialPartitions(sfDir, cpus)
      case _ => sys.env.get("SPARK_GRAFT_INITIAL_PARTITIONS")
        .map(_.toInt).filter(_ > 0).getOrElse(cpus)
    }
  }

  /** Apply the per-family regime on the shared session before running
    * `name` — AQE reads the conf at execution, so a session-level set
    * between queries is exactly a per-query regime. */
  def applyRegime(spark: SparkSession, name: String, sfDir: String,
      cpus: Int): Unit = {
    val n = initialPartitionsFor(name, sfDir, cpus)
    spark.conf.set(
      "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
      (if (n > 0) n else cpus).toString)
  }

  /** Builder with the regime applied; callers add their own confs before
    * getOrCreate() if needed. */
  def builder(sfDir: String, cpus: String): SparkSession.Builder = {
    val initial = initialPartitions(sfDir, cpus.toInt)
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        if (initial > 0) initial.toString else cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(';').foreach { kv =>
      kv.split("=", 2) match {
        case Array(k, v) if k.nonEmpty => b.config(k, v)
        case _ => ()
      }
    })
    b
  }
}
