package graft

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import graft.streaming.GasStream

/** Streaming replay of the demo scenario (SURVEY.md §5 item 4): the
  * checkpoint acts as the ledger — re-running the AvailableNow query
  * processes only unseen files. */
class GasStreamSpec extends SparkSpec {

  private def resource(name: String): Path =
    Paths.get(getClass.getResource(s"/gas/$name").getPath)

  test("AvailableNow pipeline: checkpoint = ledger; incremental file pickup") {
    val work = Files.createTempDirectory("graft-stream")
    val input = Files.createDirectory(work.resolve("input"))
    val store = work.resolve("store").toString
    val ckpt = work.resolve("ckpt").toString

    Files.copy(resource("20161007_210049.csv"),
      input.resolve("20161007_210049.csv"), StandardCopyOption.REPLACE_EXISTING)

    val q1 = GasStream.pipeline(spark, input.toString, store, ckpt)
    q1.awaitTermination()
    assert(spark.read.parquet(store).count() == 8 * 19)

    // re-run with same checkpoint and no new files → no new data
    val q2 = GasStream.pipeline(spark, input.toString, store, ckpt)
    q2.awaitTermination()
    assert(spark.read.parquet(store).count() == 8 * 19)

    // add a file → only it is processed
    Files.copy(resource("20161008_120000.csv"),
      input.resolve("20161008_120000.csv"), StandardCopyOption.REPLACE_EXISTING)
    val q3 = GasStream.pipeline(spark, input.toString, store, ckpt)
    q3.awaitTermination()
    assert(spark.read.parquet(store).count() == 8 * 19 + 6 * 19)

    // the sink appends the partition manifest per micro-batch (round-14
    // verdict item 2): a STREAM-built store plans window queries through
    // readWindow exactly like a batch-built one — same rows, no throw on
    // a missing _manifest path
    import org.apache.spark.sql.functions.col
    val win = graft.store.LongStore
      .readWindow(spark, store, "2016-10-07", "2016-10-08")
      .select(col("_time"), col("_field"), col("_value")).collect().toSet
    val full = spark.read.parquet(store)
      .select(col("_time"), col("_field"), col("_value")).collect().toSet
    assert(win == full,
      "manifest-planned read of the stream-built store diverged from full listing")
  }

  test("upsert state versioning: replayed batch re-merges against pre-batch state") {
    import org.apache.spark.sql.functions._
    val work = Files.createTempDirectory("graft-upsert-replay")
    val state = work.resolve("state").toString
    def batchDf(rows: (String, Long, Double)*) =
      spark.createDataFrame(rows).toDF("_field", "_time", "_value")
    def stateRows() = spark.read
      .parquet(GasStream.latestUpsertState(state))
      .orderBy(col("_field")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq

    val b0 = batchDf(("co", 10L, 1.0), ("co", 20L, 2.0), ("no2", 5L, 9.0))
    val b1 = batchDf(("co", 15L, 3.0), ("no2", 50L, 4.0))
    GasStream.upsertMergeBatch(b0, state, 0L)
    GasStream.upsertMergeBatch(b1, state, 1L)
    val expected = Seq(("co", 20L, 2.0), ("no2", 50L, 4.0))
    assert(stateRows() == expected)

    // at-least-once replay of batch 1 (crash after commit, retry): the
    // replay reads v0 — the pre-batch state — and recommits the same v1
    GasStream.upsertMergeBatch(b1, state, 1L)
    assert(stateRows() == expected)

    // crash MID-batch: a half-written v2 (no _SUCCESS) is invisible to
    // readers and discarded by the retry, which still reads v1
    val half = new java.io.File(state, "v2")
    half.mkdirs()
    Files.write(half.toPath.resolve("part-garbage.parquet"), Array[Byte](1, 2))
    assert(stateRows() == expected) // latest committed is still v1
    GasStream.upsertMergeBatch(batchDf(("co", 99L, 7.0)), state, 2L)
    assert(stateRows() == Seq(("co", 99L, 7.0), ("no2", 50L, 4.0)))

    // GC bounds the directory: at most the read-source + newest versions
    val vs = new java.io.File(state).listFiles().map(_.getName).sorted.toSeq
    assert(vs == Seq("v1", "v2"))
  }
}
