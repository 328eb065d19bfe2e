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
  }
}
