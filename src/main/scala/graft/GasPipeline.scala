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
      ledgerPath: String): DataFrame = {
    val raw = GasIngest.readDayFiles(spark, inputDir)
    val ledger = GasIngest.readLedger(spark, ledgerPath)
    val fresh = GasIngest.unseenOnly(raw, ledger).persist()
    try {
      val names = fresh.select("file_name").distinct()
        .collect().map(_.getString(0)).sorted
      if (names.nonEmpty) {
        val transformed = GasTransform(fresh)
        LongStore.write(
          LongStore.unpivot(transformed.withColumnRenamed("file_name", "_src")),
          storePath)
        GasIngest.appendToLedger(fresh, ledgerPath)
      }
      import spark.implicits._
      names.toSeq.toDF("file_name")
    } finally fresh.unpersist()
  }
}
