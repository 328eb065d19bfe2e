package graft.operators

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

/** Maximal Marginal Relevance (Carbonell & Goldstein 1998) — the greedy
  * diversified top-k re-ranker a retrieval/training-data pipeline uses to
  * keep the k results RELEVANT but not redundant: after seeding with the
  * most similar candidate, each next pick maximizes
  *
  *   MMR(c) = λ·sim(q, c) − (1−λ)·max_{s ∈ selected} sim(c, s)
  *
  * The selection is inherently sequential (each pick changes the diversity
  * penalty of every remaining candidate), so it runs as a PER-QUERY kernel
  * inside `flatMapGroups` over a small candidate set (top-20 from the
  * distributed scorer) — the same parallel-across-keys / sequential-within
  * shape as [[Lttb]] and [[Cusum]]. Per-query state is O(candidates²) at
  * most, independent of corpus size.
  *
  * Cross-engine determinism: candidate relevances arrive already rounded
  * to 6 dp, pairwise sims and MMR scores are rounded to 6 dp
  * (`round(x, 6)` semantics), and score ties keep the lowest candidate id
  * — the DuckDB oracle unrolls the same greedy steps as chained CTEs.
  */
object Mmr {

  // JBigDecimal.valueOf (toString-shortest), NOT new JBigDecimal(x): SQL
  // round() in both engines rounds the decimal shortest representation,
  // and the exact-binary expansion disagrees with it one ulp below a
  // half-way point (observed: 0.1966655 → 0.196665 vs SQL's 0.196666)
  private def round6(x: Double): Double =
    JBigDecimal.valueOf(x).setScale(6, RoundingMode.HALF_UP).doubleValue

  /** One candidate: id, rounded relevance to the query, embedding, norm. */
  final case class Cand(id: Long, sim: Double, emb: Array[Double], norm: Double)

  /** One output row: (step 1..k, id, relevance, mmr score).
    * Step 1's mmr IS its relevance (no diversity penalty yet). */
  final case class Pick(step: Long, id: Long, sim: Double, mmr: Double)

  private def cos(a: Cand, b: Cand): Double = {
    var d = 0.0
    var i = 0
    val x = a.emb
    val y = b.emb
    while (i < x.length) { d += x(i) * y(i); i += 1 }
    round6(d / (a.norm * b.norm))
  }

  /** λ·sim − (1−λ)·div in EXACT DECIMAL: both inputs sit on the 6-dp
    * grid, so the raw score lands exactly ON 7th-decimal half-way points
    * — where IEEE round() is a coin-flip between engines. valueOf
    * recovers the exact grid decimals, the weighted difference is exact,
    * and HALF_UP at scale 6 is then unambiguous on both sides (the
    * oracle computes the same score as DECIMAL arithmetic). */
  private def mmrScore(sim: Double, div: Double, lambda: Double): Double = {
    val lam = JBigDecimal.valueOf(lambda)
    // 1−λ in DECIMAL: the IEEE difference 1.0 - 0.7 is 0.30000000000000004
    val oneMinus = JBigDecimal.ONE.subtract(lam)
    JBigDecimal.valueOf(sim).multiply(lam)
      .subtract(JBigDecimal.valueOf(div).multiply(oneMinus))
      .setScale(6, RoundingMode.HALF_UP).doubleValue
  }

  /** Greedy-select `k` of `cands` with trade-off `lambda`. */
  def run(cands: Seq[Cand], k: Int, lambda: Double): Seq[Pick] = {
    if (cands.isEmpty) return Seq.empty
    val out = Seq.newBuilder[Pick]
    val remaining = scala.collection.mutable.ArrayBuffer(cands: _*)
    val selected = scala.collection.mutable.ArrayBuffer.empty[Cand]
    val first = remaining.minBy(c => (-c.sim, c.id))
    out += Pick(1L, first.id, first.sim, first.sim)
    selected += first
    remaining -= first
    var step = 2
    while (step <= k && remaining.nonEmpty) {
      val scored = remaining.map { c =>
        val div = selected.iterator.map(s => cos(c, s)).max
        (c, mmrScore(c.sim, div, lambda))
      }
      val (pick, score) = scored.minBy { case (c, m) => (-m, c.id) }
      out += Pick(step.toLong, pick.id, pick.sim, score)
      selected += pick
      remaining -= pick
      step += 1
    }
    out.result()
  }
}
