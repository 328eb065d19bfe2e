package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line {"metric":...,"queries":{...}}.
  *
  * Each query is materialized with a `noop`-format write so the full plan
  * executes (a bare `.count()` would let Catalyst prune most of the work).
  * One warm-up action runs first so JVM/codegen warm-up isn't billed to the
  * first query.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm-up: JVM + codegen + parquet footer caches
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()

    // optional arg: only run queries whose name starts with the prefix
    val selected = args.headOption match {
      case Some(prefix) => SparkEntry.queries.filter(_._1.startsWith(prefix))
      case None => SparkEntry.queries
    }
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            false
        }
      val secs = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] $name: $secs%.3f s")
      (name, secs, ok)
    }
    // a failed query is reported as -1, never as a (fast) success time
    val qs = results
      .map { case (k, v, ok) => "\"" + k + "\":" + (if (ok) f"$v%.3f" else "-1") }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    // the headline total counts successful queries only, matching the
    // per-query entries (a fast crash must not deflate the total)
    val total = results.collect { case (_, v, true) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
