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

  test("nearest as-of: closest |Δt| on either side; exact-distance tie goes backward") {
    val left = Seq(
      (1L, 10L, "a"), // equidistant: right at 7 and 13 → backward (7)
      (1L, 14L, "b"), // 13 is closer than 7 → forward-of-nothing, nearest 13
      (1L, 6L, "c"),  // 7 is the only near one (forward match)
      (2L, 100L, "d"), // key with no right rows → null
      (3L, 20L, "e")) // exact timestamp match → that row, distance 0
      .toDF("k", "t", "lv")
    val right = Seq(
      (1L, 7L, "r7"), (1L, 13L, "r13"),
      (3L, 20L, "r20"), (3L, 21L, "r21"))
      .toDF("k", "t", "rv")

    val got = AsOfJoin.joinAsOfNearest(left, right, "k", "t", "t", Seq("rv"))
      .select("k", "t", "lv", "asof_rv", "asof_match_ts")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        Option(r.getString(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSet

    assert(got == Set(
      (1L, 10L, "a", Some("r7"), Some(7L)),
      (1L, 14L, "b", Some("r13"), Some(13L)),
      (1L, 6L, "c", Some("r7"), Some(7L)),
      (2L, 100L, "d", None, None),
      (3L, 20L, "e", Some("r20"), Some(20L))))
  }

  test("nearest as-of: equivalent to a brute-force argmin on a random corpus") {
    // property-style cross-check: 200 left rows × 60 right rows over 5 keys
    // (deterministic LCG), operator output == per-row brute-force pick with
    // the backward tie rule
    def lcg(seed: Long): Iterator[Long] =
      Iterator.iterate(seed)(x => (x * 6364136223846793005L + 1442695040888963407L))
    val ls = lcg(1).take(200).zipWithIndex
      .map { case (x, i) => (math.floorMod(x, 5).toLong, math.floorMod(x >> 8, 1000).toLong, i.toLong) }.toSeq
    val rs = lcg(2).take(60).zipWithIndex
      .map { case (x, i) => (math.floorMod(x, 5).toLong, math.floorMod(x >> 8, 1000).toLong, i.toLong + 1000L) }.toSeq
      // the operator contract: unique (key, ts) on the right
      .groupBy(t => (t._1, t._2)).map(_._2.minBy(_._3)).toSeq
    val left = ls.toDF("k", "t", "lid")
    val right = rs.toDF("k", "t", "rid")

    val got = AsOfJoin.joinAsOfNearest(left, right, "k", "t", "t", Seq("rid"))
      .select("lid", "asof_rid")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

    ls.foreach { case (k, t, lid) =>
      val cands = rs.filter(_._1 == k)
      val want =
        if (cands.isEmpty) None
        else Some(cands.minBy(c => (math.abs(c._2 - t), c._2))._3)
      assert(got(lid) == want, s"lid=$lid k=$k t=$t")
    }
  }
}
