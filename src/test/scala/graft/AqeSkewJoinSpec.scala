package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.SaltedJoin

/** AQE-native skew handling next to the manual SaltedJoin (SURVEY.md §4).
  *
  * Spark's adaptive skew-join rule detects an oversized shuffle partition at
  * runtime and splits it into chunks, each joined against a duplicated read
  * of the matching partition on the other side — the automatic counterpart
  * of SaltedJoin's explicit (key, salt) spreading. This suite pins, on one
  * deliberately skewed fixture:
  *
  *  1. the rule actually FIRES (final adaptive plan shows the skew split)
  *     when enabled with thresholds scaled to the fixture;
  *  2. it does NOT fire when disabled (the A/B that makes 1 meaningful);
  *  3. AQE-split, manually-salted, and plain joins return identical rows.
  *
  * When does the manual salt still win? (also PLANS.md "Skew":)
  *  - skewed AGGREGATION: AQE splits join partitions only — a hot groupBy
  *    key still lands on one reducer; pre-aggregating on (key, salt) then
  *    re-aggregating on key is the only spread;
  *  - persisted layouts: AQE acts per-query at runtime; a write bucketed or
  *    range-partitioned by a hot key bakes the straggler into the files —
  *    a content-derived salt column can be part of the layout;
  *  - a priori pathological keys: AQE must first materialize the oversized
  *    shuffle block (disk pressure on one node) before splitting; salting
  *    spreads at map time and never creates the hot block at all.
  */
class AqeSkewJoinSpec extends SparkSpec {

  /** ~100k rows on key 0, a sprinkle on keys 1-49: one shuffle partition
    * dwarfs the median, which is exactly what the AQE rule keys on. */
  private def skewedFact(s: org.apache.spark.sql.SparkSession): DataFrame =
    s.range(0, 120000).select(
      when(col("id") < 100000, 0L).otherwise(pmod(col("id"), lit(50))).as("k"),
      pmod(col("id") * 7, lit(1000)).cast("double").as("v"))

  private def dim(s: org.apache.spark.sql.SparkSession): DataFrame =
    s.range(0, 50).select(col("id").as("k"),
      concat(lit("grp_"), pmod(col("id"), lit(5))).as("grp"))

  /** Final adaptive plan (everything before the echoed initial plan). */
  private def finalPlan(df: DataFrame): String = {
    df.collect() // AQE re-plans at runtime; the final plan exists only after execution
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  private def newSkewSession(skewJoinEnabled: Boolean) = {
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", skewJoinEnabled.toString)
    s.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    // production defaults are 256 MB / 5x-median; scale to the fixture the
    // same way a 100 TB job would scale them to its partition budget
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
    s
  }

  private def joined(s: org.apache.spark.sql.SparkSession): DataFrame =
    skewedFact(s).join(dim(s), "k")

  test("AQE splits the skewed join partition when enabled, not when disabled") {
    val on = finalPlan(joined(newSkewSession(skewJoinEnabled = true)))
    assert(on.contains("skew"),
      s"expected a skew-split SMJ in the final adaptive plan:\n$on")

    val off = finalPlan(joined(newSkewSession(skewJoinEnabled = false)))
    assert(!off.contains("skew"),
      s"skew split should not appear with skewJoin disabled:\n$off")
  }

  test("AQE-split, salted, and plain joins agree row-for-row") {
    val s = newSkewSession(skewJoinEnabled = true)
    def summarize(df: DataFrame): Seq[(String, Long, Double)] = {
      import s.implicits._
      df.groupBy("grp")
        .agg(count(lit(1)).as("n"), queries.sumExact(col("v")).as("sv"))
        .as[(String, Long, Double)].collect().toSeq.sortBy(_._1)
    }
    val aqe    = summarize(joined(s))
    val salted = summarize(SaltedJoin.join(skewedFact(s), dim(s), "k", salts = 8))
    val plain  = summarize(skewedFact(spark).join(dim(spark), "k"))
    assert(aqe == plain, "AQE skew-split changed the join result")
    assert(salted == plain, "salting changed the join result")
  }
}
