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
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .cache()
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
      val before = labels.agg(coalesce(sum("label"), lit(0L))).first().getLong(0)
      val after = next.agg(coalesce(sum("label"), lit(0L))).first().getLong(0)
      labels.unpersist()
      labels = next
      converged = after == before
      it += 1
    }
    labels
  }
}
