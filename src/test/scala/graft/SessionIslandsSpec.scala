package graft

import org.apache.spark.sql.functions._

/** Semantics of ts47's gaps-and-islands sessionization and ts48's
  * seasonal-baseline kernel, pinned on handcrafted fixtures (the sf
  * oracles verify engine-vs-DuckDB; these verify the MATH). */
class SessionIslandsSpec extends SparkSpec {

  test("ts47: islands split exactly at >30 min, boundary gap kept") {
    import spark.implicits._
    // user 1: gaps of exactly 1800s (kept in-session: rule is >30 min),
    // then 1801s (split). user 2: single event.
    val us = 1800L * 1000000L
    val rows = Seq(
      (1L, 10L, 0L), (1L, 11L, us), // gap == 30 min → same island
      (1L, 12L, 2 * us + 1000000L), // gap == 30 min + 1 s → new island
      (2L, 20L, 5L)
    ).toDF("user_id", "event_id", "us")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"us", $"event_id")
    val sess = rows
      .withColumn("prev", lag($"us", 1).over(w))
      .withColumn("brk", when($"prev".isNull
        || $"us" - $"prev" > 1800L * 1000000L, 1L).otherwise(0L))
      .withColumn("sid", sum($"brk").over(w.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy($"user_id", $"sid")
      .agg(count(lit(1)).as("n"), min($"us").as("s"), max($"us").as("e"))
      .orderBy($"user_id", $"sid")
      .collect()
    assert(sess.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 1L, 2L), (1L, 2L, 1L), (2L, 1L, 1L)))
  }

  test("ts47 over sf0.001: session count + island invariants") {
    val df = SparkEntry.queries("ts47_user_sessions")(spark, sf).cache()
    try {
      // every session's duration is non-negative and n_events >= 1
      assert(df.filter(col("dur_us") < 0 || col("n_events") < 1).count() == 0)
      // session_seq is dense from 1 per user
      val bad = df.groupBy("user_id")
        .agg(count(lit(1)).as("n"), max("session_seq").as("mx"),
          min("session_seq").as("mn"))
        .filter(col("mn") =!= 1 || col("mx") =!= col("n"))
      assert(bad.count() == 0)
      // total events across sessions == total events in the table
      val tot = df.agg(sum("n_events")).head.getLong(0)
      val evn = graft.sources.Tables.table(spark, sf, "events").count()
      assert(tot == evn)
    } finally df.unpersist()
  }

  test("ts48 kernel: half-up micro means and MASE ratio on a known series") {
    import spark.implicits._
    // two hours lag-1 apart with means 1.5 and 2.5 (exact micro units):
    // |d| = 1.0 → s1_us = 1_000_000
    val hourly = Seq((0L, 1500000L), (1L, 2500000L))
      .toDF("hr", "hm_us")
    val lag1 = hourly.select($"hr" + 1 as "hr", $"hm_us" as "p")
    val got = hourly.join(lag1, "hr")
      .agg(sum(abs($"hm_us" - $"p")).as("s"), count(lit(1)).as("n"))
      .head
    assert(got.getLong(0) == 1000000L && got.getLong(1) == 1L)
  }

  test("tx37 PMI kernel: ln of exact integer-ratio quotient") {
    // c_ab=5, N=100, c_a=10, c_b=10 → pmi = ln(5) ≈ 1.609438
    val pmi = spark.sql(
      "SELECT round(ln(cast(5 * 100 as double) / cast(10 * 10 as double)), 6) AS p")
      .head.getDouble(0)
    assert(pmi == 1.609438)
  }

  test("tx37 over sf0.001: every reported bigram has c_ab >= 5 and rows <= 50") {
    val df = SparkEntry.queries("tx37_pmi_bigrams")(spark, sf)
    val rows = df.collect()
    assert(rows.length <= 50 && rows.forall(_.getAs[Long]("c_ab") >= 5L))
  }
}
