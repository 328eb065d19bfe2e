package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Cusum
import graft.operators.Cusum.{Point, State}

class CusumSpec extends AnyFunSuite {

  private def pts(xs: Double*): Array[Point] =
    xs.zipWithIndex.map { case (x, i) => Point(i.toLong, i.toLong, x) }.toArray

  test("flat series at the target mean never accumulates or alarms") {
    val out = Cusum.run(pts(5.0, 5.0, 5.0, 5.0), mu = 5.0, k = 0.5, h = 2.0)
    assert(out.forall(s => s.sp == 0.0 && s.sn == 0.0 && !s.alarm))
  }

  test("a sustained level shift accumulates until it crosses h, then alarms") {
    // x jumps to 6: each step adds (6 - 5 - 0.5) = 0.5 to S+; h = 2
    val out = Cusum.run(pts(5.0, 6.0, 6.0, 6.0, 6.0, 6.0), 5.0, 0.5, 2.0)
    assert(out.map(_.sp) == Seq(0.0, 0.5, 1.0, 1.5, 2.0, 2.5))
    assert(out.map(_.alarm) == Seq(false, false, false, false, false, true))
    assert(out.forall(_.sn == 0.0)) // downward side clamps at zero
  }

  test("after an alarm both sides reset, so a second shift fires again") {
    val xs = Seq(6.0, 6.0, 6.0, 6.0, 6.0, // S+ = .5 1 1.5 2 2.5 → alarm
      5.0,                                // reset base, no re-accumulation
      6.0, 6.0, 6.0, 6.0, 6.0)           // climbs again → second alarm
    val out = Cusum.run(pts(xs: _*), 5.0, 0.5, 2.0)
    assert(out(4).alarm)                  // first alarm
    assert(out(5).sp == 0.0 && !out(5).alarm) // reset applied
    assert(out(10).alarm)                 // second alarm
    assert(out.count(_.alarm) == 2)
  }

  test("downward shifts accumulate on the S- side symmetrically") {
    val out = Cusum.run(pts(5.0, 4.0, 4.0, 4.0, 4.0, 4.0), 5.0, 0.5, 2.0)
    assert(out.map(_.sn) == Seq(0.0, 0.5, 1.0, 1.5, 2.0, 2.5))
    assert(out.last.alarm && out.forall(_.sp == 0.0))
  }

  test("every step lands on the 6-dp grid (oracle-matching rounding)") {
    val out = Cusum.run(pts(1.0000001, 2.0000002, 0.9999999), 1.5, 0.1, 1.0)
    out.foreach { s =>
      assert(s.sp == math.rint(s.sp * 1e6) / 1e6)
      assert(s.sn == math.rint(s.sn * 1e6) / 1e6)
    }
  }
}
