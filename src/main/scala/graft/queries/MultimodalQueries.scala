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

  /** Injected mm02 row covering 2-byte (é, ö), 3-byte (—, ✓, 模) and 4-byte
    * (🙂) UTF-8 code points — shared verbatim by the Spark query and the
    * oracle SQL literal. */
  private val MM02_UTF8_ROW = "héllo wörld — ünïcode ✓ 模型 🙂"

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

    // full decode → feature-extract pipeline via typed mapPartitions.
    // The oracle replays the codec per BYTE (hex-decoding the UTF-8 blob),
    // matching the engine exactly — and one multi-byte UTF-8 row (2/3/4-byte
    // code points) is injected on both sides so the compare would catch any
    // chars-vs-bytes confusion instead of hiding behind an ASCII fixture.
    "mm02_decoded_features" -> ((s, dir) => {
      val base = Tables.table(s, dir, "documents").select(col("doc_id"), col("text"))
      // 1000003: multi-byte UTF-8; 1000004: EMPTY text — exercises the
      // zero-length decode branch (mean_intensity 0.0, 0 frames) that the
      // oracle mirrors with COALESCE/NULLIF instead of a NULL division
      val extra = s.range(1).select(lit(1000003L).as("doc_id"),
        lit(MM02_UTF8_ROW).as("text"))
        .unionByName(s.range(1).select(lit(1000004L).as("doc_id"),
          lit("").as("text")))
      Multimodal.documentFeatures(s, fanout(base.unionByName(extra)))
        .toDF()
        .select(col("media_id"), col("format"), col("n_bytes"), col("checksum"),
          col("mean_intensity"), col("n_frames").cast("long").as("n_frames"))
        .orderBy(col("media_id"))
    }),

    // decode pipeline over TRUE arbitrary binary payloads (0x00, >0x7f):
    // same typed mapPartitions path, payloads synthesized from a seeded
    // byte formula through a real BinaryType column (see
    // Multimodal.syntheticBinaryMedia); the oracle replays the formula.
    "mm03_binary_features" -> ((s, dir) => {
      import s.implicits._
      Multimodal.extractFeatures(
          Multimodal.syntheticBinaryMedia(fanout(Tables.table(s, dir, "documents")))
            .as[Multimodal.MediaRecord])
        .toDF()
        .select(col("media_id"), col("format"), col("n_bytes"), col("checksum"),
          col("mean_intensity"), col("n_frames").cast("long").as("n_frames"))
        .orderBy(col("media_id"))
    })
  )

  val oracle: Map[String, String] = Map(
    // byte-based on both sides: octet_length of the UTF-8 encoding, not
    // character length, so a future non-ASCII fixture can't skew the compare
    // (DuckDB md5(VARCHAR) already hashes the UTF-8 bytes, matching Spark's
    // md5 over the encoded payload).
    "mm01_media_metadata" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    CASE WHEN doc_id % 3 = 0 THEN 'img'
        |         WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS format,
        |    text FROM documents)
        |SELECT format, COUNT(*) AS n_media,
        |  CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
        |  CAST(SUM(octet_length(encode(text))) AS DOUBLE) / COUNT(*) AS avg_bytes,
        |  MIN(md5(text)) AS min_md5
        |FROM m GROUP BY format ORDER BY format""".stripMargin,

    // BYTE-based replay: the payload is the UTF-8 blob, byte i is recovered
    // from the hex dump (two hex digits per byte) — identical to the engine
    // for any text, multi-byte code points included.
    "mm02_decoded_features" ->
      s"""WITH m AS (
        |  SELECT doc_id AS media_id,
        |    CASE WHEN doc_id % 3 = 0 THEN 'img'
        |         WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS format,
        |    hex(encode(text)) AS h, octet_length(encode(text)) AS n
        |  FROM (SELECT doc_id, text FROM documents
        |        UNION ALL SELECT 1000003, '$MM02_UTF8_ROW'
        |        UNION ALL SELECT 1000004, '')),
        |d AS (
        |  SELECT media_id, format, n,
        |    list_transform(range(0, n), i -> xor(
        |      16 * (strpos('0123456789ABCDEF', substr(h, CAST(2*i + 1 AS INT), 1)) - 1)
        |         + strpos('0123456789ABCDEF', substr(h, CAST(2*i + 2 AS INT), 1)) - 1,
        |      90)) AS decoded,
        |    list_transform(range(0, n, 4), i -> xor(
        |      16 * (strpos('0123456789ABCDEF', substr(h, CAST(2*i + 1 AS INT), 1)) - 1)
        |         + strpos('0123456789ABCDEF', substr(h, CAST(2*i + 2 AS INT), 1)) - 1,
        |      90)) AS resized
        |  FROM m)
        |SELECT media_id, format, CAST(n AS BIGINT) AS n_bytes,
        |  list_reduce(list_prepend(0::BIGINT, decoded),
        |    (acc, c) -> (acc * 31 + c) % 1000000007) AS checksum,
        |  COALESCE(CAST(list_sum(resized) AS DOUBLE) / NULLIF(len(resized), 0),
        |           0.0) AS mean_intensity,
        |  CASE WHEN format = 'video'
        |       THEN (CAST(CEIL(n / 64.0) AS BIGINT) + 1) // 2
        |       ELSE 1 END AS n_frames
        |FROM d ORDER BY media_id""".stripMargin,

    "mm03_binary_features" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    CASE WHEN doc_id % 3 = 0 THEN 'img'
        |         WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS format,
        |    64 + doc_id % 128 AS n
        |  FROM documents),
        |d AS (
        |  SELECT media_id, format, n,
        |    list_transform(range(0, n), i -> xor((media_id * 31 + i * 131) % 256, 90)) AS decoded,
        |    list_transform(range(0, n, 4), i -> xor((media_id * 31 + i * 131) % 256, 90)) AS resized
        |  FROM m)
        |SELECT media_id, format, CAST(n AS BIGINT) AS n_bytes,
        |  list_reduce(list_prepend(0::BIGINT, decoded),
        |    (acc, c) -> (acc * 31 + c) % 1000000007) AS checksum,
        |  COALESCE(CAST(list_sum(resized) AS DOUBLE) / NULLIF(len(resized), 0),
        |           0.0) AS mean_intensity,
        |  CASE WHEN format = 'video'
        |       THEN (CAST(CEIL(n / 64.0) AS BIGINT) + 1) // 2
        |       ELSE 1 END AS n_frames
        |FROM d ORDER BY media_id""".stripMargin
  )
}
