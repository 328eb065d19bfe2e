package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.GasStream

/** Watermarked tumbling-window downsampling over a live stream — the
  * continuous form of Q4 with late-data handling (SURVEY.md §2.9). */
class StreamingDownsampleSpec extends SparkSpec {
  import spark.implicits._

  test("watermarked 1-minute windows emit finalized buckets; late rows beyond watermark drop") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val long = input.toDF().toDF("_time", "_field", "_value")

    val agg = GasStream.downsampleStream(long, "1 minute", "2 minutes")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("down").start()

    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // batch 1: two buckets for field A
    input.addData(
      (ts("2016-10-07 00:00:10"), "A", 10.0),
      (ts("2016-10-07 00:00:50"), "A", 20.0),
      (ts("2016-10-07 00:01:30"), "A", 30.0))
    q.processAllAvailable()
    // batch 2: advance watermark far past the first buckets → they finalize
    input.addData((ts("2016-10-07 00:10:00"), "A", 1.0))
    q.processAllAvailable()
    // batch 3: a late row for an already-finalized bucket must be dropped
    input.addData((ts("2016-10-07 00:00:30"), "A", 999.0))
    q.processAllAvailable()
    input.addData((ts("2016-10-07 00:20:00"), "A", 2.0))
    q.processAllAvailable()

    val out = spark.sql(
      "SELECT _bucket, mean_value, n_points FROM down ORDER BY _bucket")
      .collect().map(r => (r.getTimestamp(0).toString, r.getDouble(1), r.getLong(2)))
    q.stop()

    // finalized first-minute bucket has mean 15 over 2 points — the late
    // 999.0 never contributed; second bucket mean 30 over 1 point
    assert(out.contains(("2016-10-07 00:00:00.0", 15.0, 2L)))
    assert(out.contains(("2016-10-07 00:01:00.0", 30.0, 1L)))
    assert(!out.exists(_._2 > 100)) // late row dropped everywhere
  }
}
