package graft.operators

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

/** Largest-Triangle-Three-Buckets downsampling — the visualization
  * downsampler (Steinarsson 2013) Grafana/InfluxDB ship for "draw this
  * 2M-point series with 20 points without losing its shape": keep the
  * first and last points, split the interior into fixed index buckets, and
  * from each bucket keep the point forming the largest triangle with the
  * previously kept point and the NEXT bucket's centroid.
  *
  * The selection is inherently sequential WITHIN a series (each pick
  * depends on the previous one) — the same shape as the streaming EMA
  * recursion — so the engine runs it as per-series imperative code inside
  * `flatMapGroups`: data-parallel across series keys, sequential per
  * series. Per-series memory is the series length; for series too long for
  * one executor the standard move is two-level LTTB (chunk → LTTB each
  * chunk → LTTB the concatenation), which composes from this same kernel.
  *
  * Cross-engine determinism (the DuckDB oracle replays the recursion with
  * `WITH RECURSIVE`): centroid sums are exact (BigInt for the µs x-axis,
  * 6-dp decimal for y — matching SUM(CAST(y AS DECIMAL(18,6)))), divided
  * as doubles; the triangle-area expression is one fixed IEEE tree; area
  * ties keep the earliest point.
  */
object Lttb {

  private def dec6(y: Double): JBigDecimal =
    new JBigDecimal(y).setScale(6, RoundingMode.HALF_UP)

  /** `pts` = (x µs, tiebreak id, y) sorted by (x, id). Returns
    * (k, x, y): k=0 the first point, k=1..buckets one pick per bucket,
    * k=buckets+1 the last point. Series with no interior to thin
    * (n ≤ buckets+2) pass through with k = position. */
  private[graft] def downsample(pts: Array[(Long, Long, Double)],
      buckets: Int): Seq[(Long, Long, Double)] = {
    val n = pts.length
    if (n <= buckets + 2)
      return pts.indices.map(i => (i.toLong, pts(i)._1, pts(i)._3))
    // 1-based interior index i in 2..n-1 → bucket ((i-2)·B) / (n-2)
    def bucketOf(i: Int): Int = (((i - 2).toLong * buckets) / (n - 2)).toInt
    val sumX = Array.fill(buckets)(BigInt(0))
    val sumY = Array.fill(buckets)(JBigDecimal.ZERO)
    val cnt = Array.fill(buckets)(0L)
    var i = 2
    while (i <= n - 1) {
      val b = bucketOf(i)
      sumX(b) += pts(i - 1)._1
      sumY(b) = sumY(b).add(dec6(pts(i - 1)._3))
      cnt(b) += 1
      i += 1
    }
    // anchor for bucket k = next bucket's centroid, or the last point
    def anchor(k: Int): (Double, Double) =
      if (k + 1 < buckets)
        (sumX(k + 1).toDouble / cnt(k + 1), sumY(k + 1).doubleValue / cnt(k + 1))
      else (pts(n - 1)._1.toDouble, pts(n - 1)._3)
    val out = Seq.newBuilder[(Long, Long, Double)]
    out += ((0L, pts(0)._1, pts(0)._3))
    var selX = pts(0)._1.toDouble
    var selY = pts(0)._3
    var k = 0
    var idx = 2
    while (k < buckets) {
      val (cx, cy) = anchor(k)
      var bestArea = -1.0
      var bestX = 0L
      var bestY = 0.0
      while (idx <= n - 1 && bucketOf(idx) == k) {
        val px = pts(idx - 1)._1.toDouble
        val py = pts(idx - 1)._3
        val area =
          math.abs((selX - cx) * (py - selY) - (selX - px) * (cy - selY))
        if (area > bestArea) { // strictly greater: ties keep the earliest
          bestArea = area; bestX = pts(idx - 1)._1; bestY = py
        }
        idx += 1
      }
      out += (((k + 1).toLong, bestX, bestY))
      selX = bestX.toDouble
      selY = bestY
      k += 1
    }
    out += (((buckets + 1).toLong, pts(n - 1)._1, pts(n - 1)._3))
    out.result()
  }
}
