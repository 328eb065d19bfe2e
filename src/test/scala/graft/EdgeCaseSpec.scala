package graft

import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin
import graft.queries.GasQueries

/** Edge cases of library-facing operators that no oracle query reaches. */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  test("timeRange without a _date column falls back to the plain time filter") {
    val long = Seq(
      ("2016-10-07 00:00:01", "A", 1.0),
      ("2016-10-07 12:00:00", "A", 2.0),
      ("2016-10-08 00:00:00", "A", 3.0))
      .toDF("t", "_field", "_value")
      .withColumn("_time", col("t").cast("timestamp")).drop("t")
    val got = GasQueries.timeRange(long, "2016-10-07 01:00:00", "2016-10-08 00:00:00")
      .select("_value").collect().map(_.getDouble(0)).toSet
    assert(got == Set(2.0))
  }

  test("ts13 increase applies the Influx counter-reset rule") {
    // counter goes 10 → 12 → 5 → 6: the 12→5 step is a reset, so the Influx
    // rule credits the whole new value (5) as growth, never a negative step
    val dir = java.nio.file.Files.createTempDirectory("graft-ts13")
    graft.util.TempDirs.deleteOnExit(dir)
    Seq(
      (1L, 1000000000L, 7L, "counter", 10.0, "{}"),
      (2L, 2000000000L, 7L, "counter", 12.0, "{}"),
      (3L, 3000000000L, 7L, "counter", 5.0, "{}"),
      (4L, 4000000000L, 7L, "counter", 6.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("ts13_increase")(spark, dir.toString)
      .select("event_id", "increase").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == Map(1L -> 0.0, 2L -> 2.0, 3L -> 7.0, 4L -> 8.0))
  }

  test("as-of join with an empty right side yields all-null carried columns") {
    val left = Seq((1L, 10L, "a"), (2L, 20L, "b")).toDF("k", "t", "lv")
    val right = Seq.empty[(Long, Long, String)].toDF("k", "t", "rv")
    val got = AsOfJoin.joinAsOf(left, right, "k", "t", "t", Seq("rv"))
      .select("k", "asof_rv").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(got == Set((1L, None), (2L, None)))
  }

  test("ts21 closed-form EMA matches the sequential recursive definition") {
    // the data-parallel closed form must agree with the textbook recursion
    // y_1 = x_1; y_i = k·x_i + (1-k)·y_{i-1} — recompute the recursion on
    // the driver from the same daily means and compare to within the
    // query's 6-dp output rounding
    val got = SparkEntry.queries("ts21_ema")(spark, sf)
      .select("event_type", "i", "ema").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val daily = graft.sources.Tables.table(spark, sf, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(round(graft.queries.avgExact(col("value")), 6).as("x"))
      .orderBy(col("event_type"), col("day"))
      .select("event_type", "x").collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val k = 0.2
    for ((et, xs) <- daily) {
      val emas = xs.tail.scanLeft(xs.head)((prev, x) => k * x + (1 - k) * prev)
      for ((y, idx) <- emas.zipWithIndex)
        assert(math.abs(got((et, idx + 1L)) - y) < 1e-5,
          s"$et i=${idx + 1}: closed form ${got((et, idx + 1L))} vs recursive $y")
    }
  }

  test("recursive CTE depth: 150-level chain fails at the default limit, succeeds when raised") {
    // q43's digit-trim walk is bounded by key width (≲7 levels at any
    // scale factor), but a REAL BOM/org hierarchy isn't: Spark 4 guards
    // recursive CTEs with spark.sql.cteRecursionLevelLimit (default 100)
    // and FAILS the query at the limit rather than silently truncating.
    // Pin both behaviors on a 150-link parent chain so a deep hierarchy
    // is an explicit conf decision. (DuckDB, the oracle engine, has no
    // default level cap — it iterates to exhaustion — so only the Spark
    // side needs the pin.)
    val limitKey = "spark.sql.cteRecursionLevelLimit"
    assert(spark.conf.get(limitKey).toInt == 100,
      "Spark's default recursion level limit moved — update q43's docs")
    val n = 150
    spark.range(0, n + 1)
      .selectExpr("id", "CASE WHEN id > 0 THEN id - 1 END AS parent")
      .createOrReplaceTempView("chain")
    val walkSql =
      s"""WITH RECURSIVE up(node, depth) AS (
         |  SELECT CAST($n AS BIGINT), CAST(0 AS BIGINT)
         |  UNION ALL
         |  SELECT c.parent, u.depth + 1
         |  FROM up u JOIN chain c ON c.id = u.node
         |  WHERE c.parent IS NOT NULL)
         |SELECT MAX(depth) AS d FROM up""".stripMargin
    val err = intercept[Exception] { spark.sql(walkSql).collect() }
    assert(err.getMessage.toLowerCase.contains("recursion"),
      s"expected the recursion-limit error, got: ${err.getMessage.take(200)}")
    val prev = spark.conf.get(limitKey)
    spark.conf.set(limitKey, "200")
    try {
      val d = spark.sql(walkSql).collect().head.getLong(0)
      assert(d == n.toLong, s"walked $d levels, expected $n")
    } finally spark.conf.set(limitKey, prev)
  }
}
