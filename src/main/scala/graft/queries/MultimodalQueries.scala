package graft.queries

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.sources.Tables

/** Oracle-checked entries for the multimodal pipeline (graft.multimodal).
  *
  * mm01 exercises the metadata path (binary column + pruned scan); mm02 runs
  * the REAL `Dataset.mapPartitions` decode/feature pipeline end-to-end — the
  * oracle replays the deterministic fake codec in SQL, so the whole typed
  * batch path (binary payload → decode → resize → frame-sample → features)
  * is hash-verified, not just rows-counted.
  */
object MultimodalQueries {

  val queries: Map[String, Q] = Map(
    // metadata-level stats over the binary column, grouped by modality
    "mm01_media_metadata" -> ((s, dir) => {
      val media = Multimodal.mediaFromDocuments(Tables.table(s, dir, "documents"))
      media.groupBy(col("format"))
        .agg(
          count(lit(1)).as("n_media"),
          sum(length(col("payload")).cast("long")).as("total_bytes"),
          (sum(length(col("payload")).cast("long")).cast("double") / count(lit(1))).as("avg_bytes"),
          min(md5(col("payload"))).as("min_md5"))
        .orderBy(col("format"))
    }),

    // full decode → feature-extract pipeline via typed mapPartitions
    "mm02_decoded_features" -> ((s, dir) => {
      Multimodal.documentFeatures(s, fanout(Tables.table(s, dir, "documents")))
        .toDF()
        .select(col("media_id"), col("format"), col("n_bytes"), col("checksum"),
          col("mean_intensity"), col("n_frames").cast("long").as("n_frames"))
        .orderBy(col("media_id"))
    })
  )

  val oracle: Map[String, String] = Map(
    "mm01_media_metadata" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    CASE WHEN doc_id % 3 = 0 THEN 'img'
        |         WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS format,
        |    text FROM documents)
        |SELECT format, COUNT(*) AS n_media,
        |  CAST(SUM(length(text)) AS BIGINT) AS total_bytes,
        |  CAST(SUM(length(text)) AS DOUBLE) / COUNT(*) AS avg_bytes,
        |  MIN(md5(text)) AS min_md5
        |FROM m GROUP BY format ORDER BY format""".stripMargin,

    "mm02_decoded_features" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    CASE WHEN doc_id % 3 = 0 THEN 'img'
        |         WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS format,
        |    text, length(text) AS n
        |  FROM documents),
        |d AS (
        |  SELECT media_id, format, n,
        |    list_transform(range(1, n + 1), i -> xor(ascii(substr(text, i, 1)), 90)) AS decoded,
        |    list_transform(range(1, n + 1, 4), i -> xor(ascii(substr(text, i, 1)), 90)) AS resized
        |  FROM m)
        |SELECT media_id, format, CAST(n AS BIGINT) AS n_bytes,
        |  list_reduce(list_prepend(0::BIGINT, decoded),
        |    (acc, c) -> (acc * 31 + c) % 1000000007) AS checksum,
        |  CAST(list_sum(resized) AS DOUBLE) / len(resized) AS mean_intensity,
        |  CASE WHEN format = 'video'
        |       THEN (CAST(CEIL(n / 64.0) AS BIGINT) + 1) // 2
        |       ELSE 1 END AS n_frames
        |FROM d ORDER BY media_id""".stripMargin
  )
}
