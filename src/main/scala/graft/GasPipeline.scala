package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ingest.GasIngest
import graft.store.LongStore
import graft.transform.GasTransform

/** The whole reference ETL (Airflow DAG → Dask → parquet → InfluxDB,
  * SURVEY.md §3.1) collapsed into one Spark job:
  *
  *   discover CSVs → anti-join ledger → 24 h filter + timestamp synthesis →
  *   unpivot → date-partitioned parquet store → ledger append.
  *
  * Ordering gives at-least-once with idempotent loads (= exactly-once
  * observable state): the store write is an idempotent per-day-partition
  * overwrite, and the ledger is appended only after a successful write, so
  * a crash in between merely re-processes the same files into the same
  * partitions (SURVEY.md §7.4). The streaming variant in graft.streaming
  * gets the ledger for free from the checkpoint.
  */
object GasPipeline {

  /** One batch run (the equivalent of one manual DAG trigger). Returns the
    * frame of newly processed file names (empty ⇒ nothing new, the
    * reference's "skip" branch, ETL.py:96-98).
    *
    * The anti-joined survivors are persisted so the whole batch reads the
    * input CSVs exactly once: without the cache, the emptiness probe, the
    * store write and the ledger append would each re-scan the day's input
    * (3-4 full reads at 100 TB ingest). The returned file list is collected
    * once from the cache (one short row per new file) and handed back as a
    * local frame, so consuming it never re-triggers the scan either. */
  def runBatch(spark: SparkSession, inputDir: String, storePath: String,
      ledgerPath: String): DataFrame =
    runBatch(spark, inputDir, storePath, ledgerPath, snapshot = false)

  /** `snapshot = true` routes the store write through the generation
    * commit log ([[LongStore.writeSnapshot]]) instead of dynamic
    * partition overwrite + `_manifest`: same rows, same idempotent
    * replay, but re-ingesting a day never mutates committed files, so a
    * reader covering that day ([[LongStore.readCommitted]]) gets true
    * snapshot isolation — the contract the plain layout only gives
    * disjoint windows (IngestStress). The ledger ordering is unchanged:
    * commit log before ledger mark, so a crash between replays into a
    * fresh generation and readers never see a torn batch. */
  def runBatch(spark: SparkSession, inputDir: String, storePath: String,
      ledgerPath: String, snapshot: Boolean): DataFrame = {
    val raw = GasIngest.readDayFiles(spark, inputDir)
    val ledger = GasIngest.readLedger(spark, ledgerPath)
    val fresh = GasIngest.unseenOnly(raw, ledger).persist()
    try {
      val names = fresh.select("file_name").distinct()
        .collect().map(_.getString(0)).sorted
      if (names.nonEmpty) {
        val transformed = GasTransform(fresh)
        val long =
          LongStore.unpivot(transformed.withColumnRenamed("file_name", "_src"))
        // Writer parallelism scaled to the day-file size (the round-11
        // single-writer funnel finding — see LongStore.writersFor).
        val writers = LongStore.writersFor(spark, inputDir)
        if (snapshot) {
          // generation write + commit log in one call; `_commits` plays
          // the manifest's planning role AND the snapshot-pinning role
          LongStore.writeSnapshot(long, storePath, names.toIndexedSeq,
            writersPerPartition = writers)
          ()
        } else {
          LongStore.write(long, storePath, writersPerPartition = writers)
          // partition manifest BEFORE the ledger mark (crash between the
          // two re-appends the same rows on replay; readWindow
          // deduplicates) — entries come from the batch's file names,
          // zero data reads
          LongStore.appendManifest(spark, storePath, names.toIndexedSeq)
        }
        GasIngest.appendToLedger(fresh, ledgerPath)
      }
      import spark.implicits._
      names.toSeq.toDF("file_name")
    } finally fresh.unpersist()
  }

  /** CLI twin of the reference DAG trigger — the whole 7-step Airflow DAG
    * as one command a user runs end-to-end:
    *
    * {{{
    * sbt "runMain graft.GasPipeline <inputDir> <storeDir> [ledgerDir]"
    * }}}
    *
    * `ledgerDir` defaults to `<storeDir>/_ledger`. Re-running with the same
    * arguments is a no-op (the ledger anti-join skips everything already
    * loaded — the reference's "skip" branch). Exit code 0 either way;
    * the processed-file count goes to stdout. */
  /** Testable core of [[main]]: argument handling + one batch run, on a
    * caller-owned session. The underscore-prefixed default ledger dir is
    * deliberate: parquet readers treat `_`-prefixed paths as hidden, so a
    * ledger living inside the store never pollutes a store scan. Returns
    * the one-line human summary [[main]] prints. */
  def cli(spark: SparkSession, args: Array[String]): String = {
    require(args.length >= 2,
      "usage: graft.GasPipeline <inputDir> <storeDir> [ledgerDir]")
    val (inputDir, storeDir) = (args(0), args(1))
    val ledgerDir = if (args.length > 2) args(2) else s"$storeDir/_ledger"
    val processed = runBatch(spark, inputDir, storeDir, ledgerDir)
    val names = processed.collect().map(_.getString(0))
    s"[gas-pipeline] processed ${names.length} new file(s)" +
      (if (names.isEmpty) " — store is up to date"
       else names.mkString(": ", ", ", ""))
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try println(cli(spark, args))
    finally spark.stop()
  }
}
