package graft.operators

/** 1-D local-level Kalman filter (Harvey's "structural time series" random
  * walk + observation noise model) — the optimal online denoiser that EMA
  * (ts21) only approximates: the smoothing weight is not a fixed α but the
  * Kalman GAIN, re-derived each step from the running state variance, so the
  * filter trusts early observations more (variance still high) and converges
  * to a steady-state gain as evidence accumulates.
  *
  * Model:  state   xₜ = xₜ₋₁ + wₜ,  wₜ ~ N(0, Q)
  *         observe zₜ = xₜ   + vₜ,  vₜ ~ N(0, R)
  *
  * Recursion (predict → gain → update), every assignment rounded to 6 dp
  * (`round6` = SQL `round(x, 6)`) so the per-step doubles are
  * byte-identical between this kernel and the DuckDB `WITH RECURSIVE`
  * oracle replay:
  *
  *   P⁻ = round6(P + Q)
  *   K  = round6(P⁻ / (P⁻ + R))
  *   x  = round6(x + round6(K · round6(z − x)))
  *   P  = round6((1 − K) · P⁻)
  *
  * Init on the first point: x₁ = z₁, P₁ = R (the standard diffuse-ish
  * choice: first observation taken at face value with observation-noise
  * uncertainty). Like [[Cusum]], the recursion has no closed form, so it
  * runs as a per-series sequential kernel inside `flatMapGroups` —
  * data-parallel across series keys; state is TWO doubles, so the streaming
  * twin is a trivial keyed-state job.
  *
  * Reference-scope note: the reference pipeline (transform.py) ships raw
  * sensor channels to Grafana unsmoothed; this is the denoising layer a
  * production monitor puts in front of ts26's CUSUM detector.
  */
object Kalman {

  final case class Point(tsUs: Long, id: Long, z: Double)

  /** One filtered reading: estimate, variance, and the gain that produced
    * it (the gain column makes the "adaptive α" behavior auditable). */
  final case class State(tsUs: Long, id: Long, z: Double,
      xHat: Double, p: Double, kGain: Double)

  private[graft] def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** One predict→gain→update step: (x, P) before the observation →
    * (x, P, K) after it. Shared by [[run]] and any streaming twin. */
  def step(x0: Double, p0: Double, z: Double, q: Double,
      r: Double): (Double, Double, Double) = {
    val pPred = round6(p0 + q)
    val k = round6(pPred / (pPred + r))
    val x = round6(x0 + round6(k * round6(z - x0)))
    val p = round6((1.0 - k) * pPred)
    (x, p, k)
  }

  /** Run the filter over one series. `pts` must be sorted by (tsUs, id);
    * Q and R are the (already-rounded) per-series parameters. */
  def run(pts: Array[Point], q: Double, r: Double): Seq[State] = {
    if (pts.isEmpty) return Seq.empty
    val out = Vector.newBuilder[State]
    var x = round6(pts(0).z)
    var p = round6(r)
    out += State(pts(0).tsUs, pts(0).id, pts(0).z, x, p, 1.0)
    var i = 1
    while (i < pts.length) {
      val pt = pts(i)
      val (x1, p1, k) = step(x, p, pt.z, q, r)
      x = x1; p = p1
      out += State(pt.tsUs, pt.id, pt.z, x, p, k)
      i += 1
    }
    out.result()
  }
}
