package graft.schema

import org.apache.spark.sql.types._

/** Schemas for the reference's gas-sensor data model (SURVEY.md §1).
  *
  * The wide CSV schema is the 20 documented columns (reference README.md:44);
  * the reference infers types then force-casts every non-time column to
  * float64 (transform.py:40-46) — we pin the schema at read instead, which
  * both removes the inference scan and guarantees stable types at 100 TB.
  */
object GasSchema {

  /** `Time (s)` carries fractional seconds (3.5 Hz sampling, README.md:46). */
  val timeCol = "Time (s)"

  val sensorCols: Seq[String] =
    Seq("CO (ppm)", "Humidity (%r.h.)", "Temperature (C)",
      "Flow rate (mL/min)", "Heater voltage (V)") ++
      (1 to 14).map(i => s"R$i (MOhm)")

  /** Wide day-file schema: 20 doubles (transform.py:40-46). */
  val gasSchema: StructType =
    StructType((timeCol +: sensorCols).map(c => StructField(c, DoubleType)))

  /** Canonical long/point store schema — the InfluxDB measurement/field/time
    * model the Flux queries run against (transform.py:72-73, README.md:226),
    * with real TimestampType instead of RFC3339 strings. */
  val longSchema: StructType = StructType(Seq(
    StructField("_time", TimestampType),
    StructField("_measurement", StringType),
    StructField("_field", StringType),
    StructField("_value", DoubleType)))

  /** Ledger relation: the reference's Postgres `gas_name(file_name text)`
    * exactly-once table (reference README.md:86-87, ETL.py:37-50). */
  val ledgerSchema: StructType = StructType(Seq(
    StructField("file_name", StringType),
    StructField("processed_at", TimestampType)))
}
