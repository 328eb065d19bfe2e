package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.GasQueries
import graft.store.LongStore

/** CONCURRENT INGEST + QUERY (round-14 verdict item 5): `ConcurrencyStress`
  * proves concurrent READERS bit-identical; the actual production topology
  * is a store being written (store partitions + ledger + manifest append +
  * manifest/ledger compaction) WHILE dashboards read it. This main pins the
  * snapshot semantics that topology gets from plain parquet + dynamic
  * partition overwrite:
  *
  *  - DISJOINT-window readers (the dashboard case: querying settled days
  *    while today's batch lands) — HARD GATE: every read during ingest
  *    must checksum-equal the quiesced run. New-day writes only add
  *    directories the reader never lists; re-ingest rounds rewrite only
  *    tail-day partitions, so settled-window results cannot move.
  *  - MANIFEST-planned disjoint readers — same gate, and deliberately
  *    raced against manifest append + threshold compaction (the writer
  *    re-appends every round): `readWindow`'s bounded FileNotFound retry
  *    (LongStore.scala) is what makes the planning read safe while
  *    compaction's add-before-delete churns the `_manifest` file set.
  *  - OVERLAPPING readers (a query covering the very day being
  *    re-ingested) — OBSERVED, not gated: dynamic overwrite commits
  *    delete-then-rename per partition, so a reader planned mid-commit
  *    can see the old files (match), a partially-swapped partition
  *    (mismatch/short read), or a deleted file (error). The JSON records
  *    the outcome census; the documented production rule is that
  *    same-partition repair under live readers needs a table format
  *    (Delta/Iceberg snapshot isolation) or a read quiesce — plain
  *    parquet only guarantees the disjoint-window contract above.
  *
  * Usage: `graft.IngestStress <dayFileDir> <workDir> [writerRounds=6]`
  * (day files = the calendar/stress gas fixtures; re-ingest rounds use a
  * fresh ledger each so runBatch re-processes the same tail days into the
  * same partitions — the idempotent-overwrite path under load).
  */
object IngestStress {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: IngestStress <dayFileDir> <workDir> [rounds]")
    val (inputDir, workDir) = (args(0), args(1))
    val rounds = args.lift(2).map(_.toInt).getOrElse(6)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val store = s"$workDir/store"
    val inPath = new org.apache.hadoop.fs.Path(inputDir)
    val fs = inPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.globStatus(new org.apache.hadoop.fs.Path(inPath, "*.csv"))
      .map(_.getPath).sortBy(_.getName)
    require(files.length >= 5, s"need >= 5 day files, got ${files.length}")
    val tail = files.takeRight(3)

    def day(p: org.apache.hadoop.fs.Path): java.time.LocalDate =
      java.time.LocalDate.parse("\\d{8}".r.findFirstIn(p.getName).get,
        java.time.format.DateTimeFormatter.BASIC_ISO_DATE)
    val d0 = day(files.head)
    val tailDay = day(tail.head)

    val staging = new java.io.File(s"$workDir/staging")
    staging.mkdirs()
    def stage(fps: Seq[org.apache.hadoop.fs.Path]): Unit = {
      Option(staging.listFiles()).getOrElse(Array.empty)
        .foreach { f => f.delete(); () }
      fps.foreach { f =>
        java.nio.file.Files.copy(java.nio.file.Paths.get(f.toUri),
          staging.toPath.resolve(f.getName))
        ()
      }
    }

    // ---- initial store: one batch per day (the cadence path) ----------
    files.foreach { f =>
      stage(Seq(f))
      GasPipeline.runBatch(spark, staging.getPath, store, s"$workDir/ledger")
    }

    // ---- the reader battery -------------------------------------------
    def checksum(df: DataFrame): (String, Long, Long) = {
      val cols = df.columns.sorted.map(c => col(s"`$c`"))
      val r = df.select(xxhash64(to_json(struct(cols: _*))).as("h"))
        .agg(sum(col("h").cast("decimal(38,0)")).as("checksum"),
          expr("bit_xor(h)").as("xorsum"), count(lit(1)).as("rows"))
        .collect()(0)
      (String.valueOf(r.get(0)), r.getLong(1), r.getLong(2))
    }
    val proj = Seq(unix_micros(col("_time")).as("t_us"), col("_field"),
      col("_value"))
    // disjoint window: the store's first two days — settled history
    val readers: Seq[(String, () => DataFrame)] = Seq(
      "disjoint_time_range" -> (() =>
        GasQueries.timeRange(spark.read.parquet(store),
            s"$d0 00:00:00", s"${d0.plusDays(1)} 23:59:59")
          .select(proj: _*)),
      "disjoint_manifest_window" -> (() =>
        GasQueries.timeRange(
            LongStore.readWindow(spark, store, d0.minusDays(1).toString,
              d0.plusDays(1).toString),
            s"$d0 00:00:00", s"${d0.plusDays(1)} 23:59:59")
          .select(proj: _*)),
      "disjoint_day_mean" -> (() =>
        GasQueries.fieldDayMean(spark.read.parquet(store), "CO (ppm)",
          d0.toString, "1 hour")))
    val overlap: () => DataFrame = () =>
      GasQueries.timeRange(spark.read.parquet(store),
          s"$tailDay 00:00:00", s"$tailDay 23:59:59")
        .select(proj: _*)

    // ---- quiesced reference -------------------------------------------
    val quiesced = readers.map { case (n, q) => n -> checksum(q()) }.toMap
    val overlapQuiesced = checksum(overlap())

    // ---- concurrent pass ----------------------------------------------
    val done = new java.util.concurrent.atomic.AtomicBoolean(false)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(readers.size + 2)
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val t0 = System.nanoTime()
    val (readerStats, overlapStats, writerS) =
      try {
        implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
        val writer = Future {
          val w0 = System.nanoTime()
          (1 to rounds).foreach { r =>
            stage(tail.toIndexedSeq)
            // fresh ledger per round: the same tail days re-process into
            // the same partitions (idempotent overwrite) and the manifest
            // re-appends + re-compacts — the churn the readers race
            GasPipeline.runBatch(spark, staging.getPath, store,
              s"$workDir/ledger_r$r")
          }
          done.set(true)
          (System.nanoTime() - w0) / 1e9
        }
        val loops = readers.map { case (name, q) =>
          Future {
            var (ok, bad, err) = (0, 0, 0)
            while (!done.get()) {
              try {
                if (checksum(q()) == quiesced(name)) ok += 1 else bad += 1
              } catch { case _: Exception => err += 1 }
            }
            (name, ok, bad, err)
          }
        }
        val overlapLoop = Future {
          var (ok, bad, err) = (0, 0, 0)
          while (!done.get()) {
            try {
              if (checksum(overlap()) == overlapQuiesced) ok += 1 else bad += 1
            } catch { case _: Exception => err += 1 }
          }
          (ok, bad, err)
        }
        val w = Await.result(writer, Duration.Inf)
        (loops.map(Await.result(_, Duration.Inf)),
          Await.result(overlapLoop, Duration.Inf), w)
      } finally pool.shutdown()
    val wall = (System.nanoTime() - t0) / 1e9

    // ---- gates ---------------------------------------------------------
    readerStats.foreach { case (n, ok, bad, err) =>
      require(bad == 0 && err == 0,
        s"DISJOINT READER DIVERGED under ingest: $n ok=$ok bad=$bad err=$err")
      require(ok > 0, s"reader $n never completed a pass — rung too short")
    }

    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val rj = readerStats.map { case (n, ok, bad, err) =>
      s""""$n":{"ok":$ok,"mismatch":$bad,"error":$err}"""
    }.mkString(",")
    val (oOk, oBad, oErr) = overlapStats
    println(s"""{"metric":"ingest_stress","days":${files.length},""" +
      s""""writer_rounds":$rounds,"writer_s":${num(writerS)},""" +
      s""""wall_s":${num(wall)},"disjoint_readers":{$rj},""" +
      s""""overlap_reader":{"ok":$oOk,"mismatch":$oBad,"error":$oErr},""" +
      s""""gate":"disjoint readers checksum-identical under ${rounds} """ +
      s"""re-ingest rounds"}""")
    spark.stop()
  }
}
