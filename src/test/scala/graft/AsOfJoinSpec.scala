package graft

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("as-of join: latest right row at-or-before each left row, per key") {
    val left = Seq(
      (1L, 10L, "l-a"), (1L, 20L, "l-b"), (1L, 5L, "l-c"),
      (2L, 50L, "l-d"), (3L, 7L, "l-e"))
      .toDF("k", "t", "lv")
    val right = Seq(
      (1L, 10L, "r-x"), (1L, 15L, "r-y"),
      (2L, 49L, "r-z"), (2L, 50L, "r-w"))
      .toDF("k", "t", "rv")

    val got = AsOfJoin.joinAsOf(left, right, "k", "t", "t", Seq("rv"))
      .select("k", "t", "lv", "asof_rv")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        Option(r.getString(3)))).toSet

    assert(got == Set(
      (1L, 10L, "l-a", Some("r-x")),  // inclusive: equal ts matches
      (1L, 20L, "l-b", Some("r-y")),  // latest preceding wins
      (1L, 5L, "l-c", None),          // nothing before → null
      (2L, 50L, "l-d", Some("r-w")),  // ties on right: latest at ts
      (3L, 7L, "l-e", None)))         // key with no right rows
  }

  test("as-of join: a right row with a NULL payload attaches the NULL") {
    // DuckDB/kdb ASOF semantics: the MATCHED row's value is carried even if
    // it is NULL — the fill must not reach back to an older non-null row.
    val left = Seq((1L, 20L, "l-a")).toDF("k", "t", "lv")
    val right = Seq(
      (1L, 5L, Some("r-old")), (1L, 10L, None: Option[String]))
      .toDF("k", "t", "rv")

    val got = AsOfJoin.joinAsOf(left, right, "k", "t", "t", Seq("rv"))
      .select("k", "t", "lv", "asof_rv")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        Option(r.getString(3)))).toSet

    assert(got == Set((1L, 20L, "l-a", None)))
  }

  test("as-of join: colliding output name is rejected") {
    val df = Seq((1L, 1L, "x")).toDF("k", "t", "lv")
    intercept[IllegalArgumentException] {
      // prefix "l" + right column "v" == left column "lv"
      AsOfJoin.joinAsOf(df, df.withColumnRenamed("lv", "v"), "k", "t", "t",
        Seq("v"), prefix = "l")
    }
  }
}
