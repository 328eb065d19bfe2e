package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Similarity search over `embeddings.embedding: array<float>` (north-star
  * scope, SURVEY.md §2.12).
  *
  * v01 is the brute-force cosine top-k baseline: the (small) query set is
  * broadcast, so the candidate side streams through map-side only — no
  * shuffle of the big table; cost is O(|queries| × |corpus| × dim). At
  * 100 TB the corpus side stays partition-parallel and the only reduction
  * is the per-query top-k (a tiny shuffle keyed on query id). The scale
  * path beyond brute force is LSH bucketing (see TextOps MinHash for the
  * banding pattern) or IVF: cluster → probe nearest cells only.
  *
  * All arithmetic is double-precision ordered folds; results are rounded to
  * 6 decimals before ranking so Spark and the DuckDB oracle rank ties
  * identically.
  */
object VectorOps {

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "embeddings")
      .withColumn("emb", col("embedding").cast("array<double>"))
      .withColumn("norm", expr("sqrt(aggregate(emb, 0D, (acc, x) -> acc + x * x))"))

  /** Brute-force cosine top-k of `corpus` rows for each `queries` row. */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("vec_id"))
    corpus
      .crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("dot", expr("aggregate(zip_with(qe, emb, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"))
      .withColumn("sim", round(col("dot") / (col("qn") * col("norm")), 6))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col("vec_id").as("c_id"), col("sim"))
      .orderBy(col("q_id"), col("rnk"))
  }

  val queries: Map[String, Q] = Map(
    "v01_cosine_topk" -> ((s, dir) => {
      val e = emb(s, dir)
      val qs = e.filter(expr("vec_id % 100 = 0"))
        .select(col("vec_id").as("q_id"), col("emb").as("qe"), col("norm").as("qn"))
      cosineTopK(e, qs, 5)
    }),

    // per-label centroids: posexplode → (label, dim) mean — one hash agg
    "v02_label_centroids" -> ((s, dir) =>
      emb(s, dir)
        .select(col("label"), posexplode(col("emb")).as(Seq("pos", "val")))
        .groupBy(col("label"), col("pos").cast("long").as("pos"))
        .agg(round(avg(col("val")), 6).as("centroid"), count(lit(1)).as("n"))
        .orderBy(col("label"), col("pos")))
  )

  val oracle: Map[String, String] = Map(
    "v01_cosine_topk" ->
      """WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS emb,
        |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
        |  FROM embeddings),
        |q AS (SELECT vec_id AS q_id, emb AS qe, norm AS qn FROM e WHERE vec_id % 100 = 0),
        |p AS (
        |  SELECT q_id, vec_id,
        |    ROUND(list_dot_product(qe, emb) / (qn * norm), 6) AS sim
        |  FROM e, q WHERE vec_id <> q_id),
        |r AS (
        |  SELECT q_id, vec_id, sim,
        |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rnk
        |  FROM p)
        |SELECT q_id, CAST(rnk AS BIGINT) AS rnk, vec_id AS c_id, sim
        |FROM r WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin,

    "v02_label_centroids" ->
      """SELECT label, CAST(sub - 1 AS BIGINT) AS pos,
        |  ROUND(AVG(val), 6) AS centroid, COUNT(*) AS n
        |FROM (SELECT label, unnest(embedding::DOUBLE[]) AS val,
        |        generate_subscripts(embedding, 1) AS sub FROM embeddings)
        |GROUP BY label, pos ORDER BY label, pos""".stripMargin
  )
}
