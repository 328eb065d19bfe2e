package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._

import graft.store.LongStore

/** PARTITION MANIFEST AT CADENCE (round-14 verdict item 1): the reference
  * ingests ONE batch per day, so `appendManifest`'s one-tiny-file-per-batch
  * append would regrow an O(N-batches) cold listing inside the very index
  * that exists to remove it. This spec pins the compaction answer at the
  * real cadence — N single-day `runBatch` calls — plus the two ADVICE
  * robustness holes: phantom entries (a manifest row whose partition was
  * never written) and replay duplicates (the crash-replay contract).
  */
class ManifestSpec extends SparkSpec {

  /** Minimal day file in the reference envelope: the pinned 20-column
    * header, `rows` samples at 1 s spacing, values derived from the day
    * index so every day's data is distinct. */
  private def writeDayFile(dir: Path, day: java.time.LocalDate, rows: Int,
      seed: Int): String = {
    val header = "Time (s),CO (ppm),Humidity (%r.h.),Temperature (C)," +
      "Flow rate (mL/min),Heater voltage (V)," +
      (1 to 14).map(i => s"R$i (MOhm)").mkString(",")
    val name = day.format(java.time.format.DateTimeFormatter.BASIC_ISO_DATE) +
      "_210000.csv"
    val body = (0 until rows).map { r =>
      (Seq(r.toDouble) ++ (1 to 19).map(c => (seed * 100 + r * 10 + c) / 7.0))
        .map(v => f"$v%.4f").mkString(",")
    }.mkString("\n")
    Files.write(dir.resolve(name), s"$header\n$body\n".getBytes("UTF-8"))
    name
  }

  test("per-day cadence: N single-day batches keep the manifest small and readWindow exact") {
    val work = Files.createTempDirectory("graft-manifest-cadence")
    val input = Files.createDirectory(work.resolve("input"))
    val store = work.resolve("store").toString
    val ledger = work.resolve("ledger").toString
    val nDays = 40
    val start = java.time.LocalDate.of(2016, 10, 7)

    // one batch per day — the reference's actual ingest cadence; the
    // ledger anti-join scopes each batch to the day just dropped
    (0 until nDays).foreach { d =>
      writeDayFile(input, start.plusDays(d.toLong), rows = 3, seed = d)
      val processed = GasPipeline.runBatch(spark, input.toString, store, ledger)
      assert(processed.count() == 1, s"batch $d should process exactly its day")
    }

    // compaction bound: one append per batch, folded past the threshold —
    // the at-rest file count is <= threshold + 1, never O(N-batches)
    val manifestParts = new java.io.File(s"$store/_manifest")
      .listFiles().count(_.getName.startsWith("part-"))
    assert(manifestParts <= 17,
      s"manifest grew to $manifestParts files over $nDays per-day batches")

    // the ledger has the identical cadence hole and the identical fold:
    // its per-tick read must stay bounded however many batches have run
    val ledgerParts = new java.io.File(ledger)
      .listFiles().count(_.getName.startsWith("part-"))
    assert(ledgerParts <= 17,
      s"ledger grew to $ledgerParts files over $nDays per-day batches")

    // the manifest still covers every batch: a full-range readWindow must
    // equal the full-listing store read row-for-row
    val full = spark.read.parquet(store)
      .select("_time", "_field", "_value").collect().toSet
    val win = LongStore.readWindow(spark, store,
        start.toString, start.plusDays(nDays.toLong).toString)
      .select("_time", "_field", "_value").collect().toSet
    assert(win == full, "manifest-planned read diverged from full listing")

    // and an interior 2-day window resolves only its own days
    val sub = LongStore.readWindow(spark, store,
        start.plusDays(10L).toString, start.plusDays(11L).toString)
    assert(sub.select("_date").distinct().count() == 2)
  }

  test("phantom manifest entry (zero-row source file) cannot poison window reads") {
    val work = Files.createTempDirectory("graft-manifest-phantom")
    val input = Files.createDirectory(work.resolve("input"))
    val store = work.resolve("store").toString
    writeDayFile(input, java.time.LocalDate.of(2016, 10, 7), rows = 4, seed = 1)
    GasPipeline.runBatch(spark, input.toString, store, work.resolve("l").toString)

    val before = LongStore.readWindow(spark, store, "2016-10-07", "2016-10-09")
      .collect().toSet

    // a source file that contributed zero store rows (all rows filtered)
    // records a manifest entry but writes no _date=/_src= directory
    LongStore.appendManifest(spark, store, Seq("20161008_999999.csv"))
    val after = LongStore.readWindow(spark, store, "2016-10-07", "2016-10-09")
      .collect().toSet
    assert(after == before, "phantom entry changed (or broke) the window read")
  }

  test("replay duplicates and repeated compaction are absorbed") {
    val work = Files.createTempDirectory("graft-manifest-replay")
    val input = Files.createDirectory(work.resolve("input"))
    val store = work.resolve("store").toString
    val name = writeDayFile(input, java.time.LocalDate.of(2016, 10, 7),
      rows = 4, seed = 2)
    GasPipeline.runBatch(spark, input.toString, store, work.resolve("l").toString)

    val clean = LongStore.readWindow(spark, store, "2016-10-07", "2016-10-07")
      .collect().toSeq.sortBy(_.toString)

    // crash-replay: the same batch re-appends its manifest rows; the
    // distinct() in readWindow (and in compaction) must absorb them
    LongStore.appendManifest(spark, store, Seq(name))
    LongStore.appendManifest(spark, store, Seq(name))
    val dup = LongStore.readWindow(spark, store, "2016-10-07", "2016-10-07")
      .collect().toSeq.sortBy(_.toString)
    assert(dup == clean, "replayed manifest appends duplicated window rows")

    // force compaction repeatedly (threshold 0 = always): entry set is
    // stable and the directory folds to a single part file
    LongStore.compactManifest(spark, store, 0)
    LongStore.compactManifest(spark, store, 0)
    val compacted = LongStore.readWindow(spark, store, "2016-10-07", "2016-10-07")
      .collect().toSeq.sortBy(_.toString)
    assert(compacted == clean)
    val parts = new java.io.File(s"$store/_manifest")
      .listFiles().count(_.getName.startsWith("part-"))
    assert(parts == 1, s"compaction left $parts part files")
  }
}
