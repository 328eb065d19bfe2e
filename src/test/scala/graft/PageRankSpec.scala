package graft

import graft.operators.PageRank

/** Pins the integer PageRank kernel: hub dominance on a star, symmetry on
  * regular graphs, determinism across runs, and the floor-division mass
  * bound (total mass never exceeds the invariant N·scale). */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], iters: Int = 3): Map[Long, (Long, Long)] =
    PageRank.integerRanks(edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("star graph: the hub outranks every leaf, leaves tie exactly") {
    val r = ranks((1L to 5L).map(i => (0L, i)))
    assert(r(0L)._1 == 5 && r(1L)._1 == 1)
    val leafRanks = (1L to 5L).map(i => r(i)._2).distinct
    assert(leafRanks.size == 1, "symmetric leaves must tie bit-exactly")
    assert(r(0L)._2 > leafRanks.head)
  }

  test("regular graphs rank every vertex identically") {
    // a 4-cycle: every vertex degree 2, perfectly symmetric
    val r = ranks(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L)))
    assert(r.values.map(_._2).toSeq.distinct.size == 1)
    // and the symmetric value is the fixed point: base + 0.85·scale
    assert(r(0L)._2 == 150000000000L + 85L * 1000000000000L / 100L)
  }

  test("integer arithmetic is deterministic and mass-bounded") {
    val edges = for (i <- 0L until 40L; j <- Seq((i * 7 + 3) % 40, (i * 11 + 5) % 40)
      if j != i) yield (i, j)
    val a = ranks(edges.distinct)
    val b = ranks(edges.distinct)
    assert(a == b, "re-running must be bit-identical")
    val total = a.values.map(_._2).sum
    val n = a.size.toLong
    // floor divisions only ever LOSE mass vs the rational fixed point
    assert(total <= n * 1000000000000L)
    assert(total > n * 1000000000000L / 2)
  }
}
