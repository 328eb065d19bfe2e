package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for a training-data pipeline (north-star scope):
  * image/audio/video travel as opaque `binary` columns with typed metadata;
  * decode/feature-extraction runs partition-parallel close to the data.
  *
  * Spark-side design (the part that must be real at 100 TB):
  *  - payloads stay in one `BinaryType` column — parquet stores them inline
  *    per row-group, so a scan that projects only metadata never reads the
  *    bytes (column pruning), and `maxPartitionBytes` bounds task memory;
  *  - per-record work is `Dataset.mapPartitions` over typed case classes —
  *    the JVM analogue of `mapInPandas` batches: one iterator per partition,
  *    no per-row lambda dispatch, no driver involvement;
  *  - outputs are flat typed columns so downstream filters/aggregations are
  *    codegen'd Catalyst again.
  *
  * The codec itself is STUBBED: this container has no image/audio libs, so
  * [[FakeCodec]] is a deterministic stand-in (documented as such). Swapping
  * in a real JNI/ImageIO codec changes only that object — the schema,
  * partitioning and batch shape stay identical.
  */
object Multimodal {

  /** A media record: opaque payload + the typed metadata that travels with
    * it (never inside it, so metadata-only scans skip the bytes). */
  case class MediaRecord(
      media_id: Long,
      format: String,          // "img" | "audio" | "video"
      payload: Array[Byte],
      width: Int, height: Int, // declared dims (images/video)
      sample_rate: Int)        // audio

  case class MediaFeatures(
      media_id: Long,
      format: String,
      n_bytes: Long,
      checksum: Long,          // decoded-content checksum
      mean_intensity: Double,  // mean of decoded samples
      n_frames: Int)           // frames sampled (video) / 1 otherwise

  /** DETERMINISTIC FAKE decode — stands in for the real image/audio codec
    * (none available in this container). Derives pseudo-samples from the
    * payload bytes so tests are reproducible end-to-end. */
  object FakeCodec {
    /** "decode" payload → sample array (pseudo-pixels / pseudo-PCM). */
    def decode(payload: Array[Byte]): Array[Int] =
      payload.map(b => (b & 0xff) ^ 0x5a)

    /** "resize": sample every stride-th decoded value — the shape of a real
      * nearest-neighbour downscale. */
    def resize(samples: Array[Int], stride: Int): Array[Int] =
      samples.indices.collect { case i if i % stride == 0 => samples(i) }.toArray

    /** "frame-sample": split decoded stream into frames, keep every k-th. */
    def sampleFrames(samples: Array[Int], frameLen: Int, everyK: Int): Seq[Array[Int]] =
      samples.grouped(math.max(frameLen, 1)).zipWithIndex
        .collect { case (f, i) if i % everyK == 0 => f }.toSeq
  }

  /** Build a media frame from the documents table (UTF-8 payloads) — the
    * testdata has no binary column, so this synthesizes one while keeping
    * the pipeline binary-typed end-to-end. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "img")
        .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("format"),
      encode(col("text"), "UTF-8").as("payload"),
      lit(64).as("width"), lit(64).as("height"), lit(16000).as("sample_rate"))

  /** TRUE-binary media fixture: payloads are arbitrary seeded bytes — nulls
    * (0x00), high bytes (>0x7f), everything a real image/audio blob contains
    * and UTF-8 text never exercises. Byte i of media m is
    * `(m*31 + i*131) mod 256`; length is `64 + m mod 128`. The bytes are
    * materialized through a genuine `BinaryType` column (unhex of a built
    * hex string), so the decode path consumes real arbitrary binary, while
    * an oracle can replay the generating formula arithmetically. */
  def syntheticBinaryMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "img")
        .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("format"),
      expr("""unhex(concat_ws('', transform(
              |  sequence(0, cast(64 + doc_id % 128 as int) - 1),
              |  i -> lpad(hex((doc_id * 31 + i * 131) % 256), 2, '0'))))""".stripMargin)
        .as("payload"),
      lit(64).as("width"), lit(64).as("height"), lit(16000).as("sample_rate"))

  /** Partition-parallel decode + feature extraction (mapInPandas analogue).
    * One pass per partition; emits flat typed features. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val decoded = FakeCodec.decode(r.payload)
        val resized = FakeCodec.resize(decoded, stride = 4)
        val frames =
          if (r.format == "video") FakeCodec.sampleFrames(decoded, r.width, 2)
          else Seq(decoded)
        MediaFeatures(
          media_id = r.media_id,
          format = r.format,
          n_bytes = r.payload.length.toLong,
          checksum = decoded.foldLeft(0L)((a, v) => (a * 31 + v) % 1000000007L),
          mean_intensity =
            if (resized.isEmpty) 0.0 else resized.sum.toDouble / resized.length,
          n_frames = frames.size)
      }
    }
  }

  /** End-to-end: documents → binary media column → typed features. */
  def documentFeatures(spark: SparkSession, docs: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    extractFeatures(mediaFromDocuments(docs).as[MediaRecord])
  }
}
