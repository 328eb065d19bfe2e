package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Mmr
import graft.operators.Mmr.Cand

class MmrSpec extends AnyFunSuite {

  // orthogonal unit basis + a near-duplicate of the best candidate
  private def unit(dim: Int, at: Int, v: Double = 1.0): Array[Double] = {
    val a = new Array[Double](dim); a(at) = v; a
  }

  test("first pick is the most relevant; ties go to the lowest id") {
    val cs = Seq(Cand(7L, 0.9, unit(4, 0), 1.0), Cand(3L, 0.9, unit(4, 1), 1.0),
      Cand(9L, 0.5, unit(4, 2), 1.0))
    val out = Mmr.run(cs, 2, 0.7)
    assert(out.head.id == 3L && out.head.mmr == 0.9)
  }

  test("a redundant near-duplicate of the first pick is skipped") {
    // c2 duplicates c1 (cos = 1): its MMR = .7*.89 - .3*1 = .323 loses to
    // the orthogonal c3 at .7*.6 - .3*0 = .42, despite higher relevance
    val cs = Seq(
      Cand(1L, 0.90, unit(4, 0), 1.0),
      Cand(2L, 0.89, unit(4, 0), 1.0), // same direction as 1
      Cand(3L, 0.60, unit(4, 1), 1.0))
    val out = Mmr.run(cs, 2, 0.7)
    assert(out.map(_.id) == Seq(1L, 3L))
    assert(out(1).mmr == 0.42)
  }

  test("diversity penalty is the MAX similarity to ANY selected item") {
    // c4 is orthogonal to pick 1 but duplicates pick 2 — its max-penalty
    // is 1, so .7*.40 − .3*1 = −.02 loses to c3's .7*.10 − 0 = .07
    val cs = Seq(
      Cand(1L, 0.90, unit(4, 0), 1.0),
      Cand(2L, 0.80, unit(4, 1), 1.0),
      Cand(3L, 0.10, unit(4, 2), 1.0),
      Cand(4L, 0.40, unit(4, 1), 1.0)) // same direction as 2
    val out = Mmr.run(cs, 3, 0.7)
    assert(out.map(_.id) == Seq(1L, 2L, 3L))
  }

  test("k larger than the pool returns the whole pool; empty pool is empty") {
    val cs = Seq(Cand(1L, 0.9, unit(2, 0), 1.0), Cand(2L, 0.1, unit(2, 1), 1.0))
    assert(Mmr.run(cs, 5, 0.7).map(_.id) == Seq(1L, 2L))
    assert(Mmr.run(Seq.empty, 5, 0.7).isEmpty)
  }

  test("scores land on the 6-dp grid even at 7th-decimal half-way points") {
    // sim = .9000010, div such that raw score hits x.xxxxxx5 exactly:
    // sim=.900001, div=.100007 → .7*.900001 − .3*.100007 = .6069986 −
    // .0300021 = .5769986 — wait, pick constructed boundary: .7*.5 −
    // .3*.299999 = .35 − .0899997 = .2600003; use direct decimal check
    val cs = Seq(
      Cand(1L, 0.5, unit(2, 0), 1.0),
      Cand(2L, 0.499999, Array(0.299999, math.sqrt(1 - 0.299999 * 0.299999)), 1.0))
    val out = Mmr.run(cs, 2, 0.7)
    // cos(c2, c1) = 0.299999 exactly (rounded); score = 0.7*0.499999 −
    // 0.3*0.299999 = 0.3499993 − 0.0899997 = 0.2599996 (exact decimal)
    assert(out(1).mmr == 0.2599996.round6Like)
  }

  private implicit class R6(private val d: Double) {
    def round6Like: Double =
      java.math.BigDecimal.valueOf(d)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
  }
}
