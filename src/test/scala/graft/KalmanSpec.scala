package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Kalman
import graft.operators.Kalman.Point

class KalmanSpec extends AnyFunSuite {

  private def pts(xs: Double*): Array[Point] =
    xs.zipWithIndex.map { case (x, i) => Point(i.toLong, i.toLong, x) }.toArray

  test("first point is taken at face value with P = R, gain 1") {
    val out = Kalman.run(pts(3.5, 3.5), q = 0.01, r = 0.1)
    assert(out.head.xHat == 3.5 && out.head.p == 0.1 && out.head.kGain == 1.0)
  }

  test("constant signal: estimate stays put, variance contracts monotonically") {
    val out = Kalman.run(pts(Seq.fill(20)(7.0): _*), q = 0.01, r = 1.0)
    assert(out.forall(_.xHat == 7.0))
    val ps = out.map(_.p)
    assert(ps.zip(ps.tail).forall { case (a, b) => b <= a },
      s"variance not contracting: $ps")
  }

  test("gain converges to the steady-state Riccati fixed point") {
    // local-level steady state: P⁻ solves P⁻ = (1-K)P⁻ + Q with
    // K = P⁻/(P⁻+R) → K* = (-Q + sqrt(Q² + 4QR)) / 2R
    val (q, r) = (0.1, 1.0)
    val kStar = (-q + math.sqrt(q * q + 4 * q * r)) / (2 * r)
    val out = Kalman.run(pts(Seq.fill(200)(5.0): _*), q, r)
    assert(math.abs(out.last.kGain - kStar) < 1e-4,
      s"gain ${out.last.kGain} vs Riccati $kStar")
  }

  test("step response: estimate moves toward a level shift, lags one step") {
    val out = Kalman.run(pts(0.0, 0.0, 0.0, 10.0, 10.0, 10.0, 10.0), 0.1, 1.0)
    val afterShift = out.drop(3).map(_.xHat)
    assert(afterShift.zip(afterShift.tail).forall { case (a, b) => b > a })
    assert(afterShift.head > 0.0 && afterShift.head < 10.0)
    assert(out.last.xHat > 7.0, s"too sluggish: ${out.last.xHat}")
  }

  test("noisy signal is smoothed: filtered variance below raw variance") {
    val rng = new scala.util.Random(42)
    val xs = Seq.fill(500)(10.0 + rng.nextGaussian())
    val out = Kalman.run(pts(xs: _*), q = 0.001, r = 1.0)
    def variance(v: Seq[Double]): Double = {
      val m = v.sum / v.size
      v.map(x => (x - m) * (x - m)).sum / v.size
    }
    assert(variance(out.map(_.xHat)) < 0.3 * variance(xs),
      "filter did not attenuate observation noise")
  }

  test("every emitted double sits on the 6-dp grid") {
    val out = Kalman.run(pts(1.234567891, 2.99999949, 0.1), 0.123456, 0.654321)
    def on6(x: Double) = BigDecimal(x).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble == x
    assert(out.forall(s => on6(s.xHat) && on6(s.p) && on6(s.kGain)))
  }
}
