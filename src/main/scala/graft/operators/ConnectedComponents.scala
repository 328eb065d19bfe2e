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

  /** @param edges undirected edge list with long columns `src`, `dst`
    * @return one row per vertex appearing in `edges`: (`id`, `label`) where
    *         `label` is the minimum vertex id of the component
    */
  def minLabel(edges: DataFrame, maxIters: Int = 30): DataFrame = {
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
    def labelSum(df: DataFrame): Long =
      df.agg(coalesce(sum("label"), lit(0L))).first().getLong(0)
    var prevSum = labelSum(labels) // also materializes the cache
    var converged = labels.isEmpty
    var it = 0
    while (!converged && it < maxIters) {
      val nbrMin = sym
        .join(labels.select(col("id").as("dst"), col("label").as("dst_label")), "dst")
        .groupBy(col("src").as("id"))
        .agg(min(col("dst_label")).as("nbr_min"))
      val next = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr_min"), col("label"))).as("label"))
        .cache()
      // labels only decrease: the sum is strictly smaller iff anything
      // changed, so one scalar aggregate per round decides convergence
      val curSum = labelSum(next)
      labels.unpersist()
      labels = next
      converged = curSum == prevSum
      prevSum = curSum
      it += 1
    }
    directed.unpersist()
    labels
  }
}
