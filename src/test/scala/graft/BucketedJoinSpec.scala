package graft

import java.nio.file.Files

import graft.sources.Tables
import graft.store.BucketedStore

/** Bucketing pays the join shuffle once at write time: a repeated equi-join
  * on the bucket key must plan with ZERO exchanges (SURVEY.md §4). */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed tables co-locate the join: no exchange on either side") {
    val tmp = Files.createTempDirectory("graft-bucketed")
    val li = Tables.table(spark, sf, "lineitem")
      .select("l_orderkey", "l_extendedprice")
    val o = Tables.table(spark, sf, "orders")
      .select("o_orderkey", "o_orderpriority")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    BucketedStore.write(li, "graft_b_lineitem", s"$tmp/li", "l_orderkey", 4)
    BucketedStore.write(o, "graft_b_orders", s"$tmp/o", "l_orderkey", 4)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      val joined = spark.table("graft_b_lineitem")
        .join(spark.table("graft_b_orders"), "l_orderkey")
      val n = joined.count()
      assert(n == li.count()) // every lineitem has its order

      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(p.contains("SortMergeJoin"), s"expected a sort-merge join:\n$p")
      assert(!p.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles — co-location broken:\n$p")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_b_lineitem")
      spark.sql("DROP TABLE IF EXISTS graft_b_orders")
    }
  }
}
