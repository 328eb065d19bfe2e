package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.FileSourceScanExec

import graft.queries.GasQueries

/** CALENDAR-AXIS benchmark (round-12 verdict item 3): every other ladder
  * scales rows-per-day or rate over 13 day-partitions; 100 TB is YEARS of
  * partitions, where the classic bottleneck is driver-side planning —
  * file listing, footer reads, partition pruning over 1,000+ date
  * partitions. This main measures exactly that axis on a
  * `tools/make_gas_calendar.py` fixture (many consecutive THIN days, so
  * any super-linear cost is planning, never data):
  *
  *  1. `ingest_s` — the full pipeline batch over N day files (ledger
  *     anti-join, N-way dynamic-partition store write).
  *  2. `noop_rerun_s` — the idempotent re-run (ledger says all seen): the
  *     per-batch fixed cost a scheduler pays every tick at N partitions.
  *  3. `pruned_scan_cold_s` — Q3 (`GasQueries.timeRange`, a 2-day window)
  *     against a FRESH read of the store: pays the one-time O(N) file
  *     listing (Spark's InMemoryFileIndex lists before pruning; the
  *     session FileStatusCache then amortizes it), plus the pruned scan
  *     itself. The scan-node metrics recorded alongside prove the PRUNE:
  *     files/partitions read must cover only the window's days, not N.
  *  4. `pruned_scan_warm_s` — the same query re-planned in-session: the
  *     steady state a long-lived engine serves (listing cached; pruning +
  *     2-day scan only).
  *  5. `full_agg_s` — gs03's aggregate shape over ALL N days (daily
  *     buckets): the O(N-data) contrast row that keeps the pruned-scan
  *     rows honest.
  *
  * Hard gate, not just measurement: the run FAILS if the pruned scan's
  * partitions-read metric exceeds the window's day count + 1 — "pruning
  * survives 1,000 partitions" is asserted by the executed plan's own
  * counters, the same discipline as PlanAuditSpec.
  *
  * Usage: `graft.CalendarBench <dayFileDir> <workDir> [mode]`; prints one
  * JSON line (CLADDER.json combines rungs across N).
  *
  * `mode` (round-13 verdict item 2 — measuring TRUE cold planning):
  *  - `full` (default): ingest + re-run + in-session scans, as before.
  *    The in-session "cold" rows UNDERSTATE the real cold cost — the
  *    ingest's dynamic-overwrite write pre-lists the store into the
  *    JVM-shared FileStatusCache (measured at 4,096 days: in-session
  *    "cold" 0.07 s vs 1.67 s in a fresh JVM), so a long-lived session
  *    never pays the listing this item is about.
  *  - `scan`: store exists (a prior `full` run); ONE genuinely cold
  *    full-listing pruned scan — what a restarted driver pays without a
  *    manifest — then the in-session warm re-run.
  *  - `scan-manifest`: same, planned via [[graft.store.LongStore
  *    .readWindow]] — the restarted driver WITH the manifest; the row
  *    that must stay flat as the calendar grows.
  *  - `full-cadence` (round-14 verdict item 1 — the manifest at REAL
  *    ingest cadence): same measurements as `full`, but the store is
  *    built by N SINGLE-DAY `runBatch` calls (one per day file, staged
  *    one at a time — the reference's one-manual-DAG-per-drop cadence,
  *    ETL.py:60) instead of one N-day batch. Without compaction this
  *    leaves an N-file `_manifest` (and an N-file ledger) whose own cold
  *    read regrows the O(N-batches) listing; with the threshold folds
  *    (`LongStore.compactSmallFiles`) both side tables stay ≤ 17 files —
  *    the JSON records the actual at-rest file counts so the claim is
  *    checkable from the artifact. Follow with fresh-JVM `scan` /
  *    `scan-manifest` runs exactly as for `full`.
  */
object CalendarBench {
  def main(args: Array[String]): Unit = {
    val Array(inputDir, workDir) = args.take(2)
    val mode = args.lift(2).getOrElse("full")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // plain (non-AQE) plans so the FileSourceScanExec under test is
      // directly addressable in the executed plan for metric extraction
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val store = s"$workDir/store"
    val ledger = s"$workDir/ledger"
    val (ingestS, rerunS) =
      if (mode == "full") {
        val (_, iS) = timed {
          GasPipeline.runBatch(spark, inputDir, store, ledger)
        }
        val (rerun, rS) = timed {
          GasPipeline.runBatch(spark, inputDir, store, ledger)
        }
        require(rerun.count() == 0, "idempotent re-run processed files")
        (iS, rS)
      } else if (mode == "full-cadence") {
        // one batch per day file, staged singly — each runBatch sees only
        // the day just dropped, so the ledger/manifest grow one append per
        // DAY, the cadence the compaction threshold is sized against
        val inPath = new org.apache.hadoop.fs.Path(inputDir)
        val fs = inPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val files = fs.globStatus(new org.apache.hadoop.fs.Path(inPath, "*.csv"))
          .map(_.getPath).sortBy(_.getName)
        val staging = new java.io.File(s"$workDir/staging")
        staging.mkdirs()
        val (_, iS) = timed {
          files.foreach { f =>
            Option(staging.listFiles()).getOrElse(Array.empty)
              .foreach { old => old.delete(); () }
            // REPLACE_EXISTING (r15 ADVICE): delete() failures above are
            // best-effort; without the option one undeletable leftover
            // aborts the whole cadence run with FileAlreadyExists
            java.nio.file.Files.copy(
              java.nio.file.Paths.get(f.toUri),
              staging.toPath.resolve(f.getName),
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
            val processed =
              GasPipeline.runBatch(spark, staging.getPath, store, ledger)
            require(processed.count() == 1,
              s"cadence batch for ${f.getName} processed != 1 file")
          }
        }
        // scheduler-tick no-op over the WHOLE calendar dir (every file
        // already in the now-compacted ledger)
        val (rerun, rS) = timed {
          GasPipeline.runBatch(spark, inputDir, store, ledger)
        }
        require(rerun.count() == 0, "idempotent re-run processed files")
        (iS, rS)
      } else {
        require(new java.io.File(store).isDirectory,
          s"mode=$mode needs an existing store (run mode=full first): $store")
        (0.0, 0.0)
      }

    val nDays = {
      val p = new org.apache.hadoop.fs.Path(inputDir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.globStatus(new org.apache.hadoop.fs.Path(p, "*.csv")).length
    }
    // a 2-day window in the middle of the calendar
    val mid = java.time.LocalDate.of(2016, 10, 7).plusDays(nDays / 2L)
    val start = s"$mid 06:00:00"
    val stop = s"${mid.plusDays(1)} 18:00:00"

    /** Execute `df`'s OWN plan (so its scan-node metrics populate) and
      * return (seconds, scan metrics name→value). */
    def runAndScanMetrics(df: DataFrame): (Double, Map[String, Long]) = {
      val qe = df.queryExecution
      val (_, secs) = timed { qe.toRdd.foreach(_ => ()) }
      val metrics = qe.executedPlan.collectLeaves().collectFirst {
        case f: FileSourceScanExec =>
          f.metrics.map { case (k, m) => k -> m.value }.toMap
      }.getOrElse(Map.empty[String, Long])
      (secs, metrics)
    }

    def prunedQuery(long: DataFrame): DataFrame =
      GasQueries.timeRange(long, start, stop)
        .filter(org.apache.spark.sql.functions.col("_field") === "CO (ppm)")

    def manifestRead(): DataFrame =
      graft.store.LongStore.readWindow(spark, store,
        mid.minusDays(1).toString, mid.plusDays(1).toString)

    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def mj(m: Map[String, Long]): String = m.toSeq.sorted
      .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")

    // scan-only modes: this JVM has touched NOTHING under the store path,
    // so the first scan pays the genuine restarted-driver planning cost
    if (mode == "scan" || mode == "scan-manifest") {
      val rd: () => DataFrame =
        if (mode == "scan-manifest") () => manifestRead()
        else () => spark.read.parquet(store)
      val (coldS, coldM) = runAndScanMetrics(prunedQuery(rd()))
      val (warmS, _) = runAndScanMetrics(prunedQuery(rd()))
      val partsRead = coldM.getOrElse("numPartitions", -1L)
      require(partsRead >= 0 && partsRead <= 3,
        s"pruning FAILED at $nDays days ($mode): read $partsRead partitions")
      println(s"""{"metric":"calendar_scan","mode":"$mode","days":$nDays,""" +
        s""""cold_s":${num(coldS)},"warm_s":${num(warmS)},""" +
        s""""scan_metrics":${mj(coldM)}}""")
      spark.stop()
      return
    }

    // MANIFEST cold scan FIRST (round-13 verdict item 2), before anything
    // touches the store path: `LongStore.readWindow` resolves the window's
    // leaf dirs from the `_manifest` table, so the reader lists O(window)
    // dirs — this row must stay ~flat as the calendar grows, and running
    // it before the full-listing rows keeps the shared FileStatusCache
    // from subsidizing it (the manifest path would look free otherwise).
    val (manColdS, manColdM) = runAndScanMetrics(prunedQuery(manifestRead()))
    val (manWarmS, _) = runAndScanMetrics(prunedQuery(manifestRead()))
    // cold: fresh read = the one-time O(N) listing + pruned scan
    val (coldS, coldM) = runAndScanMetrics(prunedQuery(spark.read.parquet(store)))
    // warm: re-planned in-session = steady-state serving cost
    val (warmS, warmM) = runAndScanMetrics(prunedQuery(spark.read.parquet(store)))
    // manifest gate: same rows as the pruned full-store scan, and its scan
    // must touch only the window's partitions
    val manParts = manColdM.getOrElse("numPartitions", -1L)
    require(manParts >= 0 && manParts <= 3,
      s"manifest scan read $manParts partitions at $nDays days")
    val manRows = prunedQuery(manifestRead()).count()
    val fullRows = prunedQuery(spark.read.parquet(store)).count()
    require(manRows == fullRows,
      s"manifest scan rows $manRows != full-listing scan rows $fullRows")

    // the prune gate: the executed scan must touch only the window's days
    // (timeRange widens one day back for the _time/_date store invariant,
    // so a 2-calendar-day window may touch 3 partitions; _src sub-dirs
    // multiply files, not _date partitions — 'numPartitions' counts leaf
    // (date,src) dirs, one per day file in this fixture)
    val partsRead = coldM.getOrElse("numPartitions", -1L)
    require(partsRead >= 0, s"scan metrics missing numPartitions: $coldM")
    require(partsRead <= 3,
      s"partition pruning FAILED at $nDays days: scan read $partsRead partitions")

    val (fullAggS, _) = runAndScanMetrics(
      GasQueries.aggregateWindow(
        spark.read.parquet(store)
          .filter(org.apache.spark.sql.functions.col("_field") === "CO (ppm)"),
        "1 day"))

    // at-rest side-table file counts: the cadence claim ("compaction keeps
    // the manifest/ledger bounded at one append per day") is checkable
    // from the artifact, not just asserted
    def partCount(dir: String): Int = {
      val f = new java.io.File(dir)
      Option(f.listFiles()).getOrElse(Array.empty)
        .count(_.getName.startsWith("part-"))
    }

    val line =
      s"""{"metric":"calendar","mode":"$mode","days":$nDays,"ingest_s":${num(ingestS)},""" +
      s""""noop_rerun_s":${num(rerunS)},"manifest_scan_cold_s":${num(manColdS)},""" +
      s""""manifest_scan_warm_s":${num(manWarmS)},"pruned_scan_cold_s":${num(coldS)},""" +
      s""""pruned_scan_warm_s":${num(warmS)},"full_agg_s":${num(fullAggS)},""" +
      s""""manifest_files":${partCount(s"$store/_manifest")},""" +
      s""""ledger_files":${partCount(ledger)},""" +
      s""""scan_metrics_manifest":${mj(manColdM)},""" +
      s""""scan_metrics_cold":${mj(coldM)},"scan_metrics_warm":${mj(warmM)}}"""
    println(line)
    spark.stop()
  }
}
