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
  * `events.ts` is physically INT64 TIMESTAMP(NANOS) parquet, which Spark's
  * vectorized reader does not map to TimestampType. We read it as a long
  * (legacy `nanosAsLong`) and integer-divide to microseconds. DuckDB applies
  * the same ns→µs truncation when it casts, so oracle comparisons agree.
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
        spark.read
          .parquet(s"$sfDir/events.parquet")
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case n =>
        spark.read.parquet(s"$sfDir/$n.parquet")
    }
}
