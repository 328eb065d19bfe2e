package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Lttb

class LttbSpec extends AnyFunSuite {

  private def pts(xs: (Long, Double)*): Array[(Long, Long, Double)] =
    xs.zipWithIndex.map { case ((x, y), i) => (x, i.toLong, y) }.toArray

  test("short series pass through unthinned") {
    val p = pts((0L, 1.0), (1L, 2.0), (2L, 3.0))
    assert(Lttb.downsample(p, 5) ===
      Seq((0L, 0L, 1.0), (1L, 1L, 2.0), (2L, 2L, 3.0)))
  }

  test("a spike survives downsampling — it forms the largest triangle") {
    val p = pts((0L, 0.0), (1L, 0.1), (2L, 10.0), (3L, 0.2), (4L, 0.0))
    val out = Lttb.downsample(p, 1)
    // first, one pick for the single bucket (the spike), last
    assert(out === Seq((0L, 0L, 0.0), (1L, 2L, 10.0), (2L, 4L, 0.0)))
  }

  test("area ties keep the earliest point") {
    // two interior points symmetric around the first/last chord → equal
    // triangle areas; the earlier one must win
    val p = pts((0L, 0.0), (1L, 1.0), (2L, -1.0), (3L, 0.0))
    val out = Lttb.downsample(p, 1)
    assert(out(1) === (1L, 1L, 1.0))
  }

  test("output is first + one per bucket + last, anchored bucket-to-bucket") {
    val n = 200
    val p = pts((0 until n).map(i => (i.toLong, math.sin(i / 7.0))): _*)
    val out = Lttb.downsample(p, 20)
    assert(out.length === 22)
    assert(out.head === (0L, 0L, p(0)._3))
    assert(out.last === (21L, (n - 1).toLong, p(n - 1)._3))
    // picks advance strictly in x (one per index bucket)
    assert(out.map(_._2) === out.map(_._2).sorted)
    assert(out.map(_._2).distinct.length === 22)
  }
}
