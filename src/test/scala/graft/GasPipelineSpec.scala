package graft

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Replays the reference's demo scenario (README.md:253-261): drop files →
  * processed; re-trigger → skipped; add new file → only it is processed.
  * This pins the ledger's exactly-once semantics (SURVEY.md §5 item 2). */
class GasPipelineSpec extends SparkSpec {

  private def resource(name: String): Path =
    Paths.get(getClass.getResource(s"/gas/$name").getPath)

  test("ledger idempotency: second run is a no-op; new file processed alone") {
    val work = Files.createTempDirectory("graft-pipe")
    val input = Files.createDirectory(work.resolve("input"))
    val store = work.resolve("store").toString
    val ledger = work.resolve("ledger").toString

    Files.copy(resource("20161007_210049.csv"),
      input.resolve("20161007_210049.csv"), StandardCopyOption.REPLACE_EXISTING)

    // run 1: one file, processed
    val r1 = GasPipeline.runBatch(spark, input.toString, store, ledger)
    assert(r1.collect().map(_.getString(0)).toSeq == Seq("20161007_210049.csv"))
    val n1 = spark.read.parquet(store).count()
    assert(n1 == 8 * 19) // 8 kept rows × 19 fields

    // run 2: same directory → skip branch, store untouched
    val r2 = GasPipeline.runBatch(spark, input.toString, store, ledger)
    assert(r2.count() == 0)
    assert(spark.read.parquet(store).count() == n1)

    // run 3: add a second file → only it is processed; store gains its day
    Files.copy(resource("20161008_120000.csv"),
      input.resolve("20161008_120000.csv"), StandardCopyOption.REPLACE_EXISTING)
    val r3 = GasPipeline.runBatch(spark, input.toString, store, ledger)
    assert(r3.collect().map(_.getString(0)).toSeq == Seq("20161008_120000.csv"))
    assert(spark.read.parquet(store).count() == n1 + 6 * 19)
  }
}
