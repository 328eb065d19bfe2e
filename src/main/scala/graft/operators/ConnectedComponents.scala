package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by iterated min-label propagation, the missing piece
  * between an LSH candidate-pair list and a shippable corpus-dedup verdict:
  * a duplicate CHAIN A~B~C must collapse to one canonical id even when A and
  * C share no LSH band (single-hop min-neighbor passes — tx11 — keep C).
  *
  * Algorithm: every vertex starts labelled with its own id; each iteration
  * every vertex takes the min of its own label and its neighbours' labels;
  * at the fixpoint each component carries its minimum vertex id. Labels only
  * ever decrease, so `sum(label)` strictly decreases while anything changes —
  * one cheap scalar aggregate per iteration is the convergence test (no
  * row-level diff join).
  *
  * Scale shape (100 TB): each iteration is one shuffle of the edge list on
  * `dst` (join against current labels) + one `min` hash-aggregate on `src`
  * (map-side partial) + one shuffle-free-if-co-partitioned label join — all
  * keyed on vertex id, so AQE coalesces and the label frame (|V| rows, two
  * longs) stays tiny relative to the corpus. Iteration count is the duplicate-
  * cluster diameter, 2-3 on real corpora (near-dup groups are band-cliques
  * plus short bridges), bounded by `maxIters`. Each round's result is
  * cached and the previous round unpersisted; at cluster scale add a
  * `localCheckpoint` every ~5 rounds to truncate lineage growth.
  */
object ConnectedComponents {

  /** Labels plus loop telemetry: `converged` is false iff the loop exited
    * via the `maxIters` cap with labels still moving — in which case the
    * labelling is PARTIAL (a component wider than `maxIters` hops is split)
    * and a dedup built on it would silently under-merge. */
  final case class Result(labels: DataFrame, converged: Boolean, iterations: Int)

  /** How often lineage is truncated with an eager `localCheckpoint`: each
    * round's plan references the previous round's, so an unbounded chain
    * makes the optimizer re-walk O(rounds²) plan nodes and (at cluster
    * scale) tow a growing DAG through every task serialization. Five rounds
    * keeps the truncation cost amortized while high-diameter graphs stay
    * plannable. */
  private val CheckpointEvery = 5

  /** @param edges undirected edge list with long columns `src`, `dst`
    * @return one row per vertex appearing in `edges`: (`id`, `label`) where
    *         `label` is the minimum vertex id of the component
    */
  def minLabel(edges: DataFrame, maxIters: Int = 30): DataFrame =
    minLabelWithStats(edges, maxIters).labels

  def minLabelWithStats(edges: DataFrame, maxIters: Int = 30): Result = {
    // the edge list joins against the labels EVERY iteration — cache the
    // directed edges so the (possibly expensive) upstream pipeline producing
    // them (an LSH band join, say) runs exactly once; the symmetrizing
    // union then reads the cache twice per use instead of re-running the
    // pipeline per direction per round
    val directed = edges.select(col("src"), col("dst")).cache()
    val sym = directed
      .union(directed.select(col("dst").as("src"), col("src").as("dst")))
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .cache()
    var converged = labels.isEmpty // also materializes the cache
    var it = 0
    while (!converged && it < maxIters) {
      val nbrMin = sym
        .join(labels.select(col("id").as("dst"), col("label").as("dst_label")), "dst")
        .groupBy(col("src").as("id"))
        .agg(min(col("dst_label")).as("nbr_min"))
      // labels only decrease, so `new < old` is exactly "this row changed":
      // summing the 0/1 indicator is one scalar aggregate per round, bounded
      // by |V| — overflow-proof where a raw sum(label) over ~1e9-magnitude
      // ids could wrap (ANSI: throw) and fake convergence
      val next = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr_min"), col("label"))).as("label"),
          (coalesce(col("nbr_min"), col("label")) < col("label"))
            .cast("long").as("changed"))
      // lineage guard: every CheckpointEvery rounds cut the plan chain with
      // an eager localCheckpoint instead of stacking another cache on a
      // round-deep lineage (high-diameter graphs otherwise grow an
      // O(rounds)-deep plan that every task serialization re-ships)
      val stored =
        if ((it + 1) % CheckpointEvery == 0) next.localCheckpoint(true)
        else next.cache()
      val nChanged = stored.agg(coalesce(sum("changed"), lit(0L)))
        .first().getLong(0)
      labels.unpersist()
      labels = stored.select(col("id"), col("label"))
      converged = nChanged == 0L
      it += 1
    }
    directed.unpersist()
    // one stderr line per run: iteration count == component diameter is the
    // quantity the scale-up experiment tracks (PLANS.md) — a corpus whose
    // duplicate chains lengthen would show up here before it shows up in time
    System.err.println(
      s"[graft] ConnectedComponents.minLabel: converged=$converged after $it rounds")
    if (!converged)
      // loud, not silent: callers building a dedup verdict on a partial
      // labelling would otherwise under-merge with no signal anywhere
      System.err.println(
        s"[graft] ConnectedComponents.minLabel: iteration cap $maxIters hit " +
          "before the label fixpoint — labels are PARTIAL (component " +
          "diameter exceeds maxIters); raise maxIters")
    Result(labels, converged, it)
  }
}
