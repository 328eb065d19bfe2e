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
    * reference's "skip" branch, ETL.py:96-98). */
  def runBatch(spark: SparkSession, inputDir: String, storePath: String,
      ledgerPath: String): DataFrame = {
    val raw = GasIngest.readDayFiles(spark, inputDir)
    val ledger = GasIngest.readLedger(spark, ledgerPath)
    val fresh = GasIngest.unseenOnly(raw, ledger)

    val newFiles = fresh.select("file_name").distinct()
    if (newFiles.limit(1).count() > 0) {
      val transformed = GasTransform(fresh)
      LongStore.write(LongStore.unpivot(transformed.drop("file_name")), storePath)
      GasIngest.appendToLedger(fresh, ledgerPath)
    }
    newFiles
  }
}
