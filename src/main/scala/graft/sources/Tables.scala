package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver's testdata tables (`/root/testdata/sf*`, see
  * TESTDATA.md / FIXTURES.md §B).
  *
  * All reads are plain parquet scans so Catalyst pushes filters and prunes
  * columns into the scan itself (`PushedFilters` / `ReadSchema` in
  * `.explain("formatted")`). Callers filter/select on the returned frame and
  * rely on pushdown; nothing is cached or collected here.
  *
  * `events.ts` has shipped in two physical forms across testdata
  * generations: INT64 TIMESTAMP(NANOS) (which Spark's vectorized reader only
  * maps via legacy `nanosAsLong` + a ns→µs integer divide) and plain
  * TIMESTAMP(MICROS) (read natively, as TIMESTAMP_NTZ when the writer left
  * isAdjustedToUTC unset). The loader branches on the actual read schema so
  * both generations normalize to the same session-TZ(UTC) TimestampType
  * column; DuckDB truncates/reads identically, so oracle comparisons agree.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    name match {
      case "events" =>
        // nanosAsLong is session-level (no per-read option exists for it);
        // set it once and only from one thread so concurrent readers never
        // race on session conf.
        if (spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true")
          synchronized {
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          }
        val raw = spark.read.parquet(s"$sfDir/events.parquet")
        raw.schema("ts").dataType match {
          case org.apache.spark.sql.types.LongType =>
            raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
          case org.apache.spark.sql.types.TimestampType => raw
          case _ => // TIMESTAMP_NTZ: session TZ is UTC, cast is value-identity
            raw.withColumn(
              "ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
        }
      case n =>
        spark.read.parquet(s"$sfDir/$n.parquet")
    }
}
