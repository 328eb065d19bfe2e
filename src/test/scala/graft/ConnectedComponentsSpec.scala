package graft

import graft.operators.ConnectedComponents

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def labelsOf(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.minLabel(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("a chain A~B~C collapses to one component even with no direct A~C edge") {
    // the exact shape tx11's single-hop pass gets wrong: 3 shares a pair
    // only with 2, yet must inherit canonical id 1 transitively
    assert(labelsOf(Seq((1L, 2L), (2L, 3L))) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("long chain needs multiple propagation rounds to converge") {
    // a 7-vertex path: min label travels 6 hops, exercising the fixpoint
    // loop well past one iteration (and the edge direction is mixed)
    val chain = Seq((10L, 11L), (12L, 11L), (12L, 13L), (14L, 13L),
      (14L, 15L), (16L, 15L))
    assert(labelsOf(chain) == (10L to 16L).map(_ -> 10L).toMap)
  }

  test("separate components keep separate canonical ids") {
    val got = labelsOf(Seq((1L, 2L), (2L, 3L), (7L, 9L), (9L, 8L), (5L, 5L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      7L -> 7L, 8L -> 7L, 9L -> 7L, 5L -> 5L))
  }

  test("empty edge list yields an empty labelling") {
    assert(labelsOf(Seq.empty) == Map.empty)
  }

  test("iteration cap exit is reported as non-convergence, fixpoint as convergence") {
    // a 12-vertex path needs ~11 propagation rounds; maxIters=3 must exit
    // via the cap and SAY so (partial labels would otherwise silently
    // under-merge a dedup built on them)
    val path = (1L to 11L).map(i => (i, i + 1))
    val capped = ConnectedComponents
      .minLabelWithStats(path.toDF("src", "dst"), maxIters = 3)
    assert(!capped.converged && capped.iterations == 3)

    val full = ConnectedComponents.minLabelWithStats(path.toDF("src", "dst"))
    assert(full.converged)
    assert(full.labels.collect().map(_.getLong(1)).toSet == Set(1L))
  }
}
