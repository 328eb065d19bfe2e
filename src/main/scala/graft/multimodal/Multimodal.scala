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
  * Two codec tiers share that batch shape:
  *  - [[graft.multimodal.MediaCodecs]] — REAL pure-JVM parsers for public
  *    container formats (24-bpp BMP, RIFF/WAVE PCM), used by the mm04 path
  *    ([[syntheticContainers]] → [[decodeContainers]]);
  *  - [[FakeCodec]] — a deterministic stand-in for formats that genuinely
  *    need native libraries (JPEG/MP3/video), kept for mm02/mm03 so the
  *    binary plumbing is exercised with arbitrary bytes. Swapping in a JNI
  *    codec changes only that object — schema, partitioning and batch shape
  *    stay identical.
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

  // --------------------------------------------------------------------
  // REAL container path (mm04): genuine BMP / WAV bytes through the same
  // typed mapPartitions shape, decoded by graft.multimodal.MediaCodecs.
  // --------------------------------------------------------------------

  /** An opaque media container: just an id and bytes — the decoder learns
    * everything else (format included) from the bytes themselves. */
  case class Container(media_id: Long, payload: Array[Byte])

  case class ContainerFeatures(
      media_id: Long,
      format: String,       // sniffed from magic bytes, not carried metadata
      n_bytes: Long,        // full container size (headers + padding + data)
      width: Long, height: Long,   // BMP dims; 0 for audio
      sample_rate: Long,    // WAV fmt-chunk rate; 0 for images
      n_samples: Long,      // decoded content units (channel bytes / samples)
      checksum: Long,       // ordered fold over decoded content
      mean_val: Double)     // mean decoded value

  /** Synthesize REAL containers on the executors: even ids become 24-bpp
    * BMPs (varying width ⇒ row padding 0–3 bytes), odd ids become RIFF/WAVE
    * PCM with a JUNK chunk (odd lengths ⇒ RIFF pad byte) before `data`.
    * Content follows closed-form byte formulas so an oracle can replay the
    * *decoded* values arithmetically without parsing anything:
    *   BMP  m: w=4+m%5, h=3+m%4, channel j = (m*31 + j) mod 256 (top-down BGR)
    *   WAV  m: n=32+m%64, sample i = (m*131 + i*17) mod 65536 as signed i16,
    *           junk length 5+m%3
    */
  def syntheticContainers(docs: DataFrame): Dataset[Container] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { m =>
        val payload =
          if (m % 2 == 0) {
            val w = (4 + m % 5).toInt
            val h = (3 + m % 4).toInt
            val channels = Array.tabulate(w * h * 3)(j => ((m * 31 + j) % 256).toInt)
            MediaCodecs.Bmp.write(w, h, channels)
          } else {
            val n = (32 + m % 64).toInt
            val samples = Array.tabulate(n)(i => ((m * 131 + i * 17) % 65536).toShort)
            MediaCodecs.Wav.write(16000, samples, junkLen = (5 + m % 3).toInt)
          }
        Container(m, payload)
      }
    }
  }

  /** One sampled audio frame: exact integer aggregates (sum / sum of
    * squares / peak) so the oracle compare never meets a float sum. */
  case class FrameFeatures(
      media_id: Long, frame_idx: Long, n_samples: Long,
      sum_val: Long, sum_sq: Long, peak: Long)

  /** Frame-sampling over REAL WAV containers (the "frame-sample" stage of
    * a media pipeline): parse the RIFF/WAVE chunks, split PCM into
    * `frameLen`-sample frames, keep every `everyK`-th frame, and reduce
    * each kept frame to exact integer features on the executor — the
    * mapPartitions batch path never ships raw samples through a shuffle,
    * only the O(frames/everyK) feature rows. */
  def audioFrames(media: Dataset[Container], frameLen: Int,
      everyK: Int): Dataset[FrameFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { c =>
        val audio = MediaCodecs.Wav.parse(c.payload)
        audio.samples.grouped(frameLen).zipWithIndex.collect {
          case (fr, idx) if idx % everyK == 0 =>
            var sum = 0L; var sq = 0L; var peak = 0L
            fr.foreach { s =>
              sum += s; sq += s.toLong * s
              peak = math.max(peak, math.abs(s.toLong))
            }
            FrameFeatures(c.media_id, idx.toLong, fr.length.toLong, sum, sq, peak)
        }
      }
    }
  }

  /** Silence-trim summary: leading/trailing quiet-sample runs and the
    * exact integer energy/peak of the kept middle — every field a long so
    * the oracle compare never meets a float. */
  case class TrimmedAudio(media_id: Long, n_samples: Long, lead_trim: Long,
      tail_trim: Long, n_kept: Long, kept_sum_sq: Long, peak: Long)

  /** SILENCE TRIM over real WAV containers — the "strip lead-in/lead-out"
    * stage of an audio-ingest pipeline: drop the longest prefix and suffix
    * whose samples are all |s| < threshold, report what remains. An
    * all-quiet clip is attributed entirely to lead_trim (tail 0, kept 0) —
    * the oracle mirrors that convention. Same scale shape as
    * [[audioFrames]]: per-row mapPartitions decode, ONE bounded summary
    * row out per media, raw samples never reach a shuffle. */
  def audioTrimSilence(media: Dataset[Container],
      threshold: Int): Dataset[TrimmedAudio] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { c =>
        val s = MediaCodecs.Wav.parse(c.payload).samples
        val n = s.length
        var lead = 0
        while (lead < n && math.abs(s(lead).toInt) < threshold) lead += 1
        var last = n - 1
        while (last >= lead && math.abs(s(last).toInt) < threshold) last -= 1
        val tail = if (lead >= n) 0L else (n - 1 - last).toLong
        var sq = 0L; var peak = 0L
        var i = lead
        while (i <= last) {
          val v = s(i).toLong
          sq += v * v
          if (math.abs(v) > peak) peak = math.abs(v)
          i += 1
        }
        TrimmedAudio(c.media_id, n.toLong, lead.toLong, tail,
          math.max(last - lead + 1, 0).toLong, sq, peak)
      }
    }
  }

  /** Dynamic-range summary: every field an exact long, buckets are sample
    * BIT LENGTHS (≈6 dB ladder — one extra bit doubles amplitude). */
  case class AudioDynRange(media_id: Long, n_samples: Long, peak_bucket: Long,
      floor_bucket: Long, range_buckets: Long, n_quiet: Long)

  /** LOUDNESS / DYNAMIC RANGE over real WAV containers — the
    * level-screening pass an audio corpus runs before normalization:
    * bucket each sample at bit_length(|s|) (0 = digital silence, 16 =
    * full-scale), report the peak and floor occupied buckets, their span
    * (the clip's dynamic range in ~6 dB steps), and the quiet-sample count
    * under the mm19 threshold. Integer bit-length instead of 20·log₁₀
    * keeps the whole query libm-free — a dB-scale measure with NO float
    * anywhere, so the oracle compare is exact by construction. Same scale
    * shape as [[audioTrimSilence]]: map-side decode, one bounded row out
    * per media. */
  def audioDynamicRange(media: Dataset[Container],
      quietThreshold: Int): Dataset[AudioDynRange] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { c =>
        val s = MediaCodecs.Wav.parse(c.payload).samples
        var peak = 0; var floor = Int.MaxValue; var quiet = 0L
        s.foreach { v =>
          val a = math.abs(v.toInt)
          if (a < quietThreshold) quiet += 1L
          if (a > 0) {
            val b = 32 - Integer.numberOfLeadingZeros(a)
            if (b > peak) peak = b
            if (b < floor) floor = b
          }
        }
        if (floor == Int.MaxValue) floor = 0
        AudioDynRange(c.media_id, s.length.toLong, peak.toLong, floor.toLong,
          (peak - floor).toLong, quiet)
      }
    }
  }

  /** One fixed-size thumbnail per image: source dims + per-channel sums of
    * the resized pixels (exact longs; any float is derived downstream).
    * Field order follows [[MediaCodecs.BmpImage.channels]]'s B,G,R pixel
    * layout so the names tell the truth about which channel each sum holds. */
  case class Thumbnail(media_id: Long, width: Long, height: Long,
      b_sum: Long, g_sum: Long, r_sum: Long)

  /** Nearest-neighbour IMAGE RESIZE through the real BMP parser — the
    * "resize" stage of the media pipeline (decode → RESIZE → features),
    * downsampling each decoded image to a fixed w2×h2 thumbnail: output
    * pixel (x2, y2) samples source pixel (⌊x2·w/w2⌋, ⌊y2·h/h2⌋). All
    * arithmetic is exact integers, so the oracle can replay the sampled
    * coordinates and channel formula without parsing a byte — a parser or
    * index slip (row flip, padding, channel order) lands in the sums and
    * flips the hash. Scale shape: pure mapPartitions over the payload
    * column (the one place a Catalyst expression genuinely can't go);
    * thumbnails are w2×h2×3 ints regardless of source size, so downstream
    * stages shuffle bounded rows, never pixels. */
  def imageThumbnails(media: Dataset[Container], w2: Int, h2: Int): Dataset[Thumbnail] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { c =>
        val b = c.payload
        if (b.length >= 2 && b(0) == 'B' && b(1) == 'M') {
          val img = MediaCodecs.Bmp.parse(b)
          // channels is B,G,R per pixel (BmpImage doc) — accumulators named
          // accordingly so b_sum really is the blue channel
          var bs = 0L; var gs = 0L; var rs = 0L
          var y2 = 0
          while (y2 < h2) {
            var x2 = 0
            while (x2 < w2) {
              val x = x2 * img.width / w2
              val y = y2 * img.height / h2
              val base = (y * img.width + x) * 3
              bs += img.channels(base)
              gs += img.channels(base + 1)
              rs += img.channels(base + 2)
              x2 += 1
            }
            y2 += 1
          }
          Some(Thumbnail(c.media_id, img.width.toLong, img.height.toLong, bs, gs, rs))
        } else None
      }
    }
  }

  /** Histogram-equalization summary: every field an exact long, so the
    * oracle compare never meets a float. */
  case class EqualizedImage(media_id: Long, n_px: Long, n_levels: Long,
      eq_sum: Long, eq_min: Long, eq_max: Long)

  /** HISTOGRAM EQUALIZATION over real BMP containers — the contrast
    * normalization an image-ingest pipeline runs before feature
    * extraction: build the 256-level histogram over ALL channel bytes,
    * remap each level through the integer CDF transfer function
    * new(v) = (cdf(v) − cdf_min)·255 div (n − cdf_min) (cdf_min = the
    * count of the darkest occupied level; a single-level image maps to 0
    * by convention — both mirrored by the oracle), and reduce the
    * equalized image to exact integer aggregates. The summary is
    * LEVEL-SET arithmetic (Σ h(v)·new(v)), deliberately independent of
    * pixel order — mm06/mm13/mm15 already pin layout; this pins the CDF
    * remap itself. Scale shape: map-side decode + a 256-long histogram
    * per image, ONE bounded row out per media; pixels never shuffle. */
  def histogramEqualize(media: Dataset[Container]): Dataset[EqualizedImage] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { c =>
        val b = c.payload
        if (b.length >= 2 && b(0) == 'B' && b(1) == 'M') {
          val img = MediaCodecs.Bmp.parse(b)
          val hist = new Array[Long](256)
          img.channels.foreach(v => hist(v) += 1L)
          val n = img.channels.length.toLong
          var cdfMin = 0L
          var v = 0
          while (v < 256 && cdfMin == 0L) { cdfMin = hist(v); v += 1 }
          var cdf = 0L; var eqSum = 0L
          var eqMin = Long.MaxValue; var eqMax = Long.MinValue
          var nLevels = 0L
          v = 0
          while (v < 256) {
            if (hist(v) > 0L) {
              cdf += hist(v)
              val nv =
                if (n == cdfMin) 0L else (cdf - cdfMin) * 255L / (n - cdfMin)
              eqSum += hist(v) * nv
              if (nv < eqMin) eqMin = nv
              if (nv > eqMax) eqMax = nv
              nLevels += 1L
            }
            v += 1
          }
          Some(EqualizedImage(c.media_id, n, nLevels, eqSum, eqMin, eqMax))
        } else None
      }
    }
  }

  /** Clipping summary: every field an exact long (first_clip = −1 when
    * the clip never saturates). */
  case class ClippingReport(media_id: Long, n_samples: Long,
      n_clipped: Long, max_clip_run: Long, first_clip: Long)

  /** CLIPPING DETECTOR over real WAV containers — the saturation screen
    * an audio corpus runs before any gain-sensitive feature: count
    * samples at |s| ≥ threshold (near full-scale), the LONGEST
    * consecutive clipped run (sustained saturation ruins a clip; a
    * single tick doesn't), and where clipping first appears. One decode
    * pass, exact integers, one bounded row out per media. */
  def audioClipping(media: Dataset[Container],
      threshold: Int): Dataset[ClippingReport] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { c =>
        val s = MediaCodecs.Wav.parse(c.payload).samples
        var nClip = 0L; var run = 0L; var maxRun = 0L
        var first = -1L
        var i = 0
        while (i < s.length) {
          if (math.abs(s(i).toInt) >= threshold) {
            nClip += 1L; run += 1L
            if (run > maxRun) maxRun = run
            if (first < 0L) first = i.toLong
          } else run = 0L
          i += 1
        }
        ClippingReport(c.media_id, s.length.toLong, nClip, maxRun, first)
      }
    }
  }

  /** Integral-image quadrant summary: all exact longs; `sat_ok` is the
    * construction certificate (SAT box lookups ≡ direct accumulation). */
  case class IntegralQuads(media_id: Long, width: Long, height: Long,
      q_tl: Long, q_tr: Long, q_bl: Long, q_br: Long, total: Long,
      sat_ok: Boolean)

  /** INTEGRAL IMAGE (summed-area table) over real BMP containers — the
    * O(1)-box-query primitive behind Haar features / SSD block matching:
    * build the SAT over the GREEN channel, answer the four quadrant box
    * queries via the 4-corner identity, and CERTIFY the construction by
    * comparing against direct per-pixel accumulation computed in the same
    * pass (`sat_ok` — the oracle pins it TRUE and replays the direct
    * sums, so a wrong corner sign or an off-by-one border flips either
    * the sums or the certificate). Exact integer arithmetic; map-side
    * decode, ONE bounded row out per image. */
  def integralQuadrants(media: Dataset[Container]): Dataset[IntegralQuads] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { c =>
        val b = c.payload
        if (b.length >= 2 && b(0) == 'B' && b(1) == 'M') {
          val img = MediaCodecs.Bmp.parse(b)
          val w = img.width; val h = img.height
          def g(x: Int, y: Int): Long = img.channels((y * w + x) * 3 + 1).toLong
          // SAT with a zero border: sat(x, y) = Σ g over [0,x)×[0,y)
          val sat = Array.ofDim[Long](h + 1, w + 1)
          var y = 0
          while (y < h) {
            var rowSum = 0L
            var x = 0
            while (x < w) {
              rowSum += g(x, y)
              sat(y + 1)(x + 1) = sat(y)(x + 1) + rowSum
              x += 1
            }
            y += 1
          }
          // box [x0,x1)×[y0,y1) via the 4-corner identity
          def box(x0: Int, y0: Int, x1: Int, y1: Int): Long =
            sat(y1)(x1) - sat(y0)(x1) - sat(y1)(x0) + sat(y0)(x0)
          def direct(x0: Int, y0: Int, x1: Int, y1: Int): Long = {
            var s = 0L
            var yy = y0
            while (yy < y1) {
              var xx = x0
              while (xx < x1) { s += g(xx, yy); xx += 1 }
              yy += 1
            }
            s
          }
          val (w2, h2) = (w / 2, h / 2)
          val quads = Seq((0, 0, w2, h2), (w2, 0, w, h2),
            (0, h2, w2, h), (w2, h2, w, h))
          val viaSat = quads.map { case (x0, y0, x1, y1) => box(x0, y0, x1, y1) }
          val viaDirect = quads.map { case (x0, y0, x1, y1) => direct(x0, y0, x1, y1) }
          Some(IntegralQuads(c.media_id, w.toLong, h.toLong,
            viaSat(0), viaSat(1), viaSat(2), viaSat(3),
            box(0, 0, w, h), viaSat == viaDirect &&
              box(0, 0, w, h) == direct(0, 0, w, h)))
        } else None
      }
    }
  }

  /** One dominant-color row: all fields exact longs. `code` packs the
    * per-channel high bits as (b≥128)·4 + (g≥128)·2 + (r≥128) — the
    * 8-cell RGB cube corner the pixel falls in. */
  case class DominantColor(media_id: Long, rank: Long, code: Long,
      n_px_code: Long, n_px: Long)

  /** DOMINANT-COLOR EXTRACTION over real BMP containers — the palette
    * summarization stage (thumbnail search, near-black/near-white frame
    * screens): quantize every pixel to its RGB-cube corner (1 bit per
    * channel, 8 cells) and keep each image's top-2 cells by
    * (count DESC, code ASC). The 8-cell histogram is built map-side in
    * one decode pass; TWO bounded rows leave per image — pixels never
    * shuffle. Integer end to end. */
  def dominantColors(media: Dataset[Container]): Dataset[DominantColor] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { c =>
        val b = c.payload
        if (b.length >= 2 && b(0) == 'B' && b(1) == 'M') {
          val img = MediaCodecs.Bmp.parse(b)
          val counts = new Array[Long](8)
          val nPx = img.channels.length / 3
          var p = 0
          while (p < nPx) {
            val base = p * 3
            // channels is B,G,R per pixel (BmpImage doc)
            val code = (if (img.channels(base) >= 128) 4 else 0) |
              (if (img.channels(base + 1) >= 128) 2 else 0) |
              (if (img.channels(base + 2) >= 128) 1 else 0)
            counts(code) += 1L
            p += 1
          }
          val top = (0 until 8).filter(counts(_) > 0L)
            .sortBy(code => (-counts(code), code)).take(2)
          top.zipWithIndex.map { case (code, i) =>
            DominantColor(c.media_id, i + 1L, code.toLong, counts(code),
              nPx.toLong)
          }
        } else Nil
      }
    }
  }

  /** One ViT-style patch: grid position + exact per-channel sums over a
    * p×p tile (ragged right/bottom tiles keep their true pixel count).
    * Field order follows [[MediaCodecs.BmpImage.channels]]'s B,G,R pixel
    * layout so the names tell the truth about which channel each sum holds. */
  case class Patch(media_id: Long, py: Long, px: Long, n_px: Long,
      b_sum: Long, g_sum: Long, r_sum: Long)

  /** PATCH EXTRACTION — the ViT preprocessing stage (an image becomes a
    * GRID of p×p patches, each reduced to features) run through the real
    * BMP parser: decode → tile → one exact-integer feature row per patch.
    * Ragged edges keep PARTIAL tiles with their true n_px — silently
    * dropping them is the classic preprocessing bug this operator pins.
    * Scale shape: pure mapPartitions over the payload column; the output
    * is ⌈w/p⌉·⌈h/p⌉ bounded rows per image, so downstream stages (patch
    * embedding, token packing) shuffle feature rows, never pixels. */
  def imagePatches(media: Dataset[Container], p: Int): Dataset[Patch] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { c =>
        val b = c.payload
        if (b.length >= 2 && b(0) == 'B' && b(1) == 'M') {
          val img = MediaCodecs.Bmp.parse(b)
          val ny = (img.height + p - 1) / p
          val nx = (img.width + p - 1) / p
          for {
            py <- 0 until ny
            px <- 0 until nx
          } yield {
            // channels is B,G,R per pixel (BmpImage doc) — accumulators
            // named accordingly so b_sum really is the blue channel
            var bs = 0L; var gs = 0L; var rs = 0L; var n = 0L
            var y = py * p
            while (y < math.min((py + 1) * p, img.height)) {
              var x = px * p
              while (x < math.min((px + 1) * p, img.width)) {
                val base = (y * img.width + x) * 3
                bs += img.channels(base)
                gs += img.channels(base + 1)
                rs += img.channels(base + 2)
                n += 1
                x += 1
              }
              y += 1
            }
            Patch(c.media_id, py.toLong, px.toLong, n, bs, gs, rs)
          }
        } else Seq.empty[Patch]
      }
    }
  }

  /** One histogram cell: channel is the index into the B,G,R pixel layout
    * (0 = blue — see [[MediaCodecs.BmpImage.channels]]); zero bins are not
    * emitted (the downstream GROUP BY shape). */
  case class ChannelHist(media_id: Long, channel: Long, bin: Long, n_px: Long)

  /** Per-image per-channel intensity HISTOGRAM over the real BMP decode —
    * the classic image-level feature (exposure/contrast screening, channel
    * imbalance checks) a vision corpus computes before training. `bins`
    * equal-width buckets over [0, 256). Scale shape: pure map-side decode,
    * one bounded O(3·bins) count array per image on the executor; only the
    * tiny (media_id, channel, bin, n_px) rows ever reach a shuffle —
    * payload bytes never do. */
  def channelHistograms(media: Dataset[Container], bins: Int): Dataset[ChannelHist] = {
    import media.sparkSession.implicits._
    require(256 % bins == 0, s"bins must divide 256, got $bins")
    val width = 256 / bins
    media.mapPartitions { it =>
      it.flatMap { c =>
        val b = c.payload
        if (b.length >= 2 && b(0) == 'B' && b(1) == 'M') {
          val img = MediaCodecs.Bmp.parse(b)
          val counts = Array.ofDim[Long](3, bins)
          var j = 0
          while (j < img.channels.length) {
            counts(j % 3)(img.channels(j) / width) += 1
            j += 1
          }
          for {
            ch <- 0 until 3
            bin <- 0 until bins if counts(ch)(bin) > 0
          } yield ChannelHist(c.media_id, ch.toLong, bin.toLong, counts(ch)(bin))
        } else Seq.empty[ChannelHist]
      }
    }
  }

  /** Flat features of a decoded PNG. No container-size column on purpose:
    * deflate output length is implementation-defined, so only DECODED
    * content is cross-engine comparable. */
  case class PngFeatures(media_id: Long, width: Long, height: Long,
      n_channels: Long, checksum: Long, mean_val: Double)

  /** Synthesize REAL PNGs (zlib-compressed, CRC-framed, filter-cycled —
    * see [[MediaCodecs.Png]]) on the executors. Content is closed-form so
    * the oracle replays decoded values arithmetically:
    *   PNG m: w = 3 + m%6, h = 2 + m%5, channel j = (m*37 + j*11) mod 256
    *   (top-down RGB). */
  def syntheticPngs(docs: DataFrame): Dataset[Container] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { m =>
        val w = (3 + m % 6).toInt
        val h = (2 + m % 5).toInt
        val rgb = Array.tabulate(w * h * 3)(j => ((m * 37 + j * 11) % 256).toInt)
        Container(m, MediaCodecs.Png.write(w, h, rgb))
      }
    }
  }

  /** Partition-parallel PNG decode through the real chunk-walk + inflate +
    * unfilter parser. A slip anywhere — CRC, IDAT reassembly, a filter
    * predictor — lands in checksum/mean and flips the oracle compare. */
  def decodePngs(media: Dataset[Container]): Dataset[PngFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { c =>
        val img = MediaCodecs.Png.parse(c.payload)
        var sum = 0L
        var chk = 0L
        var i = 0
        while (i < img.rgb.length) {
          val v = img.rgb(i)
          sum += v
          chk = (chk * 31 + v) % 1000000007L
          i += 1
        }
        PngFeatures(c.media_id, img.width.toLong, img.height.toLong,
          img.rgb.length.toLong, chk, sum.toDouble / img.rgb.length)
      }
    }
  }

  /** Outcome of an integrity pass over one container: `ok` rows carry the
    * decoded-content checksum, `quarantined` rows carry 0. */
  case class IntegrityRow(media_id: Long, status: String, checksum: Long)

  /** CORRUPT-CONTAINER QUARANTINE — the ingest-time integrity screen a
    * media corpus runs before anything downstream touches payloads: decode
    * each container under a per-row guard; CRC mismatches, truncated
    * chunks and broken zlib streams QUARANTINE the row instead of failing
    * the whole job (the classic "one bad file kills the 100 TB batch"
    * failure). Detection is the REAL codec's own framing checks (PNG
    * chunk CRC-32 is verified on parse — MediaCodecs.Png), not a
    * heuristic. Map-side only; one tiny status row per container. */
  def pngIntegrity(media: Dataset[Container]): Dataset[IntegrityRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { c =>
        try {
          val img = MediaCodecs.Png.parse(c.payload)
          var chk = 0L
          var i = 0
          while (i < img.rgb.length) {
            chk = (chk * 31 + img.rgb(i)) % 1000000007L
            i += 1
          }
          IntegrityRow(c.media_id, "ok", chk)
        } catch {
          case scala.util.control.NonFatal(_) =>
            IntegrityRow(c.media_id, "quarantined", 0L)
        }
      }
    }
  }

  /** One resampled audio clip: exact integer aggregates over the
    * rate-converted PCM (any float is derived downstream). */
  case class ResampledAudio(media_id: Long, src_rate: Long, dst_rate: Long,
      n_in: Long, n_out: Long, sum_val: Long, sum_sq: Long, peak: Long)

  /** AUDIO RESAMPLING through the real WAV parser — the audio analogue of
    * [[imageThumbnails]] (decode → RATE-CONVERT → features): each clip is
    * nearest-neighbour-resampled from its container's fmt-chunk rate to
    * `dstRate`: output sample j takes source sample ⌊j·srcRate/dstRate⌋,
    * output length ⌊n·dstRate/srcRate⌋ — all-integer index arithmetic, so
    * the oracle replays the mapping and the signed-i16 sample formula
    * without parsing a byte. Scale shape: mapPartitions over payloads;
    * each clip reduces to one 8-long feature row regardless of duration. */
  def resampleAudio(media: Dataset[Container], dstRate: Int): Dataset[ResampledAudio] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { c =>
        val b = c.payload
        if (b.length >= 4 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
            b(3) == 'F') {
          val audio = MediaCodecs.Wav.parse(b)
          val n = audio.samples.length
          val nOut = (n.toLong * dstRate / audio.sampleRate).toInt
          var sum = 0L; var sq = 0L; var peak = 0L
          var j = 0
          while (j < nOut) {
            val s = audio.samples((j.toLong * audio.sampleRate / dstRate).toInt)
            sum += s; sq += s.toLong * s
            peak = math.max(peak, math.abs(s.toLong))
            j += 1
          }
          Some(ResampledAudio(c.media_id, audio.sampleRate.toLong,
            dstRate.toLong, n.toLong, nOut.toLong, sum, sq, peak))
        } else None
      }
    }
  }

  /** Average-hash of one decoded image: 64 bits packed as two 32-bit
    * halves (bit 63 of one word would wrap signed in SQL engines). */
  case class AHash(media_id: Long, lo: Long, hi: Long)

  /** NEAR-DUP BMP fixture: 16×16 images in FAMILIES — base pattern keyed
    * on m%8, plus a strength-128 perturbation of the first (m/8)%5 pixels
    * of the SAMPLED 8×8 grid (even x, even y), so same-family variants
    * differ by a few aHash bits and cross-family images differ by many.
    * Channel formula (closed-form for the oracle): with q = j/3,
    * y = q/16, x = q%16, p = (y/2)*8 + x/2:
    *   value(m, j) = ((m%8)*37 + j*13
    *                  + [y even ∧ x even ∧ p < (m/8)%5] · 128) mod 256 */
  def syntheticNearDupBmps(docs: DataFrame): Dataset[Container] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { m =>
        val channels = Array.tabulate(16 * 16 * 3) { j =>
          val q = j / 3
          val y = q / 16
          val x = q % 16
          val pert =
            if (y % 2 == 0 && x % 2 == 0 && (y / 2) * 8 + x / 2 < (m / 8) % 5)
              128L
            else 0L
          (((m % 8) * 37 + j * 13 + pert) % 256).toInt
        }
        Container(m, MediaCodecs.Bmp.write(16, 16, channels))
      }
    }
  }

  /** PERCEPTUAL HASH (aHash) through the real BMP parser — the image
    * analogue of SimHash text dedup: nearest-neighbour resize to the 8×8
    * grid (source pixel ⌊x2·w/8⌋, ⌊y2·h/8⌋), per-pixel gray SUM r+g+b
    * (never divided — stays an exact integer), bit p set iff
    * 64·gray(p) > Σ gray (strictly above the mean, cross-multiplied so no
    * division ever happens). All-integer, so the DuckDB oracle replays the
    * 64 bits arithmetically from the channel formula without parsing a
    * byte. Scale shape: one mapPartitions pass over payloads; each image
    * reduces to TWO longs — the downstream dedup join never sees pixels. */
  def imageAHash(media: Dataset[Container]): Dataset[AHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { c =>
        val b = c.payload
        if (b.length >= 2 && b(0) == 'B' && b(1) == 'M') {
          val img = MediaCodecs.Bmp.parse(b)
          val gray = new Array[Long](64)
          var p = 0
          while (p < 64) {
            val x = (p % 8) * img.width / 8
            val y = (p / 8) * img.height / 8
            val base = (y * img.width + x) * 3
            gray(p) = img.channels(base).toLong + img.channels(base + 1) +
              img.channels(base + 2)
            p += 1
          }
          val total = gray.sum
          var lo = 0L; var hi = 0L
          p = 0
          while (p < 64) {
            if (64L * gray(p) > total) {
              if (p < 32) lo |= 1L << p else hi |= 1L << (p - 32)
            }
            p += 1
          }
          Some(AHash(c.media_id, lo, hi))
        } else None
      }
    }
  }

  /** Difference-hash of one decoded image: 56 bits — 8 rows × 7 adjacent
    * left>right gray comparisons on the same 8×8 sampled grid as
    * [[imageAHash]] — packed in ONE long (56 < 63, no sign wrap). dHash
    * captures the horizontal GRADIENT field where aHash captures the
    * mean-level field, so the two disagree on exactly the perturbations
    * that shift brightness without reordering neighbours — which is what
    * mm17 measures. All-integer comparisons, oracle-replayable. */
  case class DHash(media_id: Long, dh: Long)

  def imageDHash(media: Dataset[Container]): Dataset[DHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { c =>
        val b = c.payload
        if (b.length >= 2 && b(0) == 'B' && b(1) == 'M') {
          val img = MediaCodecs.Bmp.parse(b)
          val gray = new Array[Long](64)
          var p = 0
          while (p < 64) {
            val x = (p % 8) * img.width / 8
            val y = (p / 8) * img.height / 8
            val base = (y * img.width + x) * 3
            gray(p) = img.channels(base).toLong + img.channels(base + 1) +
              img.channels(base + 2)
            p += 1
          }
          var dh = 0L
          var r = 0
          while (r < 8) {
            var cix = 0
            while (cix < 7) {
              if (gray(r * 8 + cix) > gray(r * 8 + cix + 1))
                dh |= 1L << (r * 7 + cix)
              cix += 1
            }
            r += 1
          }
          Some(DHash(c.media_id, dh))
        } else None
      }
    }
  }

  /** Per-clip unnormalized-Haar band energies over the first 32 decoded
    * samples (every synthetic clip has ≥ 32): detail energies at levels
    * 1–3 plus the level-3 approximation energy, and the dominant detail
    * level (argmax, ties to the lowest level). Unnormalized Haar (sums
    * and differences, no /√2) keeps every value an exact 64-bit integer:
    * |a3| ≤ 8·32768, squared ≤ 6.9e10, ×4 terms ≪ 2⁶³ — so the oracle
    * replays the filterbank arithmetically from the sample formula and
    * the hash compare never meets a float. */
  case class WaveletEnergy(media_id: Long, e1: Long, e2: Long, e3: Long,
    ea3: Long, dominant: Int)

  def audioWaveletEnergy(media: Dataset[Container]): Dataset[WaveletEnergy] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { c =>
        val b = c.payload
        if (b.length >= 4 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
            b(3) == 'F') {
          val audio = MediaCodecs.Wav.parse(b)
          if (audio.samples.length >= 32) {
            val s = Array.tabulate(32)(i => audio.samples(i).toLong)
            val a1 = Array.tabulate(16)(i => s(2 * i) + s(2 * i + 1))
            val d1 = Array.tabulate(16)(i => s(2 * i) - s(2 * i + 1))
            val a2 = Array.tabulate(8)(i => a1(2 * i) + a1(2 * i + 1))
            val d2 = Array.tabulate(8)(i => a1(2 * i) - a1(2 * i + 1))
            val a3 = Array.tabulate(4)(i => a2(2 * i) + a2(2 * i + 1))
            val d3 = Array.tabulate(4)(i => a2(2 * i) - a2(2 * i + 1))
            val e1 = d1.map(x => x * x).sum
            val e2 = d2.map(x => x * x).sum
            val e3 = d3.map(x => x * x).sum
            val ea3 = a3.map(x => x * x).sum
            val dom = if (e1 >= e2 && e1 >= e3) 1
              else if (e2 >= e3) 2 else 3
            Some(WaveletEnergy(c.media_id, e1, e2, e3, ea3, dom))
          } else None
        } else None
      }
    }
  }

  /** Partition-parallel REAL decode: sniff the container magic, parse with
    * the genuine header/chunk parser, emit flat features. Any parse slip —
    * row order, padding, chunk offsets, sample sign — changes checksum or
    * mean and is caught by the formula-replaying oracle. */
  def decodeContainers(media: Dataset[Container]): Dataset[ContainerFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { c =>
        val b = c.payload
        if (b.length >= 2 && b(0) == 'B' && b(1) == 'M') {
          val img = MediaCodecs.Bmp.parse(b)
          var sum = 0L; var chk = 0L; var i = 0
          while (i < img.channels.length) {
            val v = img.channels(i)
            sum += v; chk = (chk * 31 + v) % 1000000007L; i += 1
          }
          ContainerFeatures(c.media_id, "img", b.length.toLong,
            img.width.toLong, img.height.toLong, 0L, img.channels.length.toLong,
            chk, sum.toDouble / img.channels.length)
        } else {
          val audio = MediaCodecs.Wav.parse(b)
          var sum = 0L; var chk = 0L; var i = 0
          while (i < audio.samples.length) {
            val s = audio.samples(i)
            sum += s; chk = (chk * 31 + (s & 0xffff)) % 1000000007L; i += 1
          }
          ContainerFeatures(c.media_id, "audio", b.length.toLong,
            0L, 0L, audio.sampleRate.toLong, audio.samples.length.toLong,
            chk, sum.toDouble / audio.samples.length)
        }
      }
    }
  }

  /** One extracted animation frame reduced to features: exact integer
    * checksum + count, mean as the single derived float. */
  case class GifFrameFeatures(media_id: Long, frame_idx: Long, width: Long,
      height: Long, delay_cs: Long, checksum: Long, mean_val: Double)

  /** Animated-GIF fixture (closed-form for the oracle): GIF m has
    * 1 + m%3 full-screen frames of (2 + m%4) × (2 + m%3) pixels; frame f
    * pixel p = (m*31 + f*17 + p*7) mod 256 (grayscale palette index);
    * frame delay = 4 + (m+f)%7 centiseconds. */
  def syntheticGifs(docs: DataFrame): Dataset[Container] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { m =>
        val w = (2 + m % 4).toInt
        val h = (2 + m % 3).toInt
        val frames = (0 until (1 + m % 3).toInt).map { f =>
          ((4 + (m + f) % 7).toInt,
            Array.tabulate(w * h)(p => ((m * 31 + f * 17 + p * 7) % 256).toInt))
        }
        Container(m, MediaCodecs.Gif.write(w, h, frames))
      }
    }
  }

  /** One sniffed-and-decoded container reduced to format-tagged features. */
  case class SniffFeatures(media_id: Long, format: String, n_units: Long,
      checksum: Long, mean_val: Double)

  /** UNIVERSAL container dispatch — the ingest reality of a crawled media
    * corpus: nobody hands you a format column, the bytes are the truth.
    * Sniff the magic (BM / RIFF / \x89PNG / GIF8) and decode through the
    * matching REAL parser; emit per-container features in one shape so
    * downstream stats group by the SNIFFED format. Checksums fold the
    * storage units (channel bytes, u16 samples, palette indices) in
    * decode order; means are over the semantic values (signed samples for
    * audio). Pure mapPartitions — a mixed 100 TB corpus dispatches
    * embarrassingly parallel with zero shuffles. */
  def sniffDecode(media: Dataset[Container]): Dataset[SniffFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { c =>
        val b = c.payload
        def fold(n: Int, value: Int => Int, mean: Int => Int = null)
            : (Long, Long, Double) = {
          val mv = if (mean == null) value else mean
          var chk = 0L; var sum = 0L; var i = 0
          while (i < n) {
            chk = (chk * 31 + value(i)) % 1000000007L
            sum += mv(i)
            i += 1
          }
          (n.toLong, chk, sum.toDouble / n)
        }
        val (fmt, n, chk, mean) =
          if (b.length >= 2 && b(0) == 'B' && b(1) == 'M') {
            val img = MediaCodecs.Bmp.parse(b)
            val (n, c2, m) = fold(img.channels.length, img.channels(_))
            ("bmp", n, c2, m)
          } else if (b.length >= 4 && b(0) == 'R' && b(1) == 'I' &&
              b(2) == 'F' && b(3) == 'F') {
            val audio = MediaCodecs.Wav.parse(b)
            val (n, c2, m) = fold(audio.samples.length,
              i => audio.samples(i) & 0xffff, i => audio.samples(i).toInt)
            ("wav", n, c2, m)
          } else if (b.length >= 4 && (b(0) & 0xff) == 0x89 && b(1) == 'P') {
            val img = MediaCodecs.Png.parse(b)
            val (n, c2, m) = fold(img.rgb.length, img.rgb(_))
            ("png", n, c2, m)
          } else if (b.length >= 4 && b(0) == 'G' && b(1) == 'I' &&
              b(2) == 'F' && b(3) == '8') {
            val anim = MediaCodecs.Gif.parse(b)
            val px = anim.frames.iterator.flatMap(_.pixels.iterator).toArray
            val (n, c2, m) = fold(px.length, px(_))
            ("gif", n, c2, m)
          } else
            throw new IllegalArgumentException(
              f"unknown container magic 0x${b(0) & 0xff}%02x")
        SniffFeatures(c.media_id, fmt, n, chk, mean)
      }
    }
  }

  /** Per-clip keyframe verdict: the frame with the largest L1 pixel
    * change vs its predecessor (exact integers; single-frame clips keep
    * frame 0 with zero energy). */
  case class Keyframe(media_id: Long, n_frames: Long, key_frame: Long,
      max_diff: Long)

  /** SCENE-CHANGE keyframe selection — the standard "which frame do I
    * thumbnail / embed" reduction over a video-shaped container: decode
    * all frames, score each against its predecessor by exact integer L1
    * pixel distance, keep the argmax (ties → earliest frame). Everything
    * happens inside ONE mapPartitions pass per clip — frames never leave
    * the executor, no shuffle exists at all; a 100 TB corpus reduces to
    * one 4-long row per clip map-side. */
  def gifKeyframes(media: Dataset[Container]): Dataset[Keyframe] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { c =>
        val anim = MediaCodecs.Gif.parse(c.payload)
        val fs = anim.frames
        if (fs.length < 2) Keyframe(c.media_id, fs.length.toLong, 0L, 0L)
        else {
          var bestF = 1L
          var bestD = -1L
          var f = 1
          while (f < fs.length) {
            val a = fs(f - 1).pixels
            val b = fs(f).pixels
            var d = 0L
            var i = 0
            while (i < b.length) { d += math.abs(b(i) - a(i)); i += 1 }
            if (d > bestD) { bestD = d; bestF = f.toLong }
            f += 1
          }
          Keyframe(c.media_id, fs.length.toLong, bestF, bestD)
        }
      }
    }
  }

  /** VIDEO-shaped frame extraction: block-walk + real LZW decode of every
    * frame ([[MediaCodecs.Gif]]), one feature row per frame. A slip in
    * the sub-block chain skip, the code-width handling or the dictionary
    * growth lands in checksum/mean and flips the oracle compare. The
    * frame fan-out happens ON the executors (mapPartitions emits one row
    * per frame), so a million-clip corpus decodes embarrassingly parallel
    * with no shuffle before the per-frame rows exist. */
  def gifFrames(media: Dataset[Container]): Dataset[GifFrameFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { c =>
        val anim = MediaCodecs.Gif.parse(c.payload)
        anim.frames.iterator.zipWithIndex.map { case (fr, idx) =>
          var sum = 0L
          var chk = 0L
          var i = 0
          while (i < fr.pixels.length) {
            val v = fr.pixels(i)
            sum += v
            chk = (chk * 31 + v) % 1000000007L
            i += 1
          }
          GifFrameFeatures(c.media_id, idx.toLong, fr.width.toLong,
            fr.height.toLong, fr.delayCs.toLong, chk,
            sum.toDouble / fr.pixels.length)
        }
      }
    }
  }
}
