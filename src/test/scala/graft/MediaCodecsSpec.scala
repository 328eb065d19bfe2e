package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{MediaCodecs, Multimodal}
import MediaCodecs.{Bmp, Wav}

/** Pins the REAL container parsers against hand-assembled byte fixtures —
  * built digit-by-digit here, never via the writers — so a matching
  * writer/parser bug pair cannot hide. Round-trips and the Spark decode
  * path are covered on top.
  */
class MediaCodecsSpec extends AnyFunSuite {

  private def le32(v: Int): Array[Byte] =
    Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
  private def le16(v: Int): Array[Byte] = Array[Byte](v.toByte, (v >> 8).toByte)

  /** Hand-assembled 2×2 24-bpp BMP. Raster rows top-down are
    * row0 = [(1,2,3),(4,5,6)], row1 = [(7,8,9),(10,11,12)] (B,G,R tuples);
    * storage is BOTTOM-UP (row1 first) with 3*2=6 → 2 pad bytes per row. */
  private def handBmp: Array[Byte] = {
    val stride = 8
    val header =
      Array[Byte]('B', 'M') ++ le32(54 + 2 * stride) ++ le16(0) ++ le16(0) ++ le32(54) ++
      le32(40) ++ le32(2) ++ le32(2) ++ le16(1) ++ le16(24) ++ le32(0) ++
      le32(2 * stride) ++ le32(2835) ++ le32(2835) ++ le32(0) ++ le32(0)
    val row1 = Array[Byte](7, 8, 9, 10, 11, 12, 0, 0) // stored first (bottom)
    val row0 = Array[Byte](1, 2, 3, 4, 5, 6, 0, 0)
    header ++ row1 ++ row0
  }

  test("BMP parse recovers top-down raster order from bottom-up padded rows") {
    val img = Bmp.parse(handBmp)
    assert(img.width == 2 && img.height == 2)
    assert(img.channels.toSeq == (1 to 12))
  }

  test("BMP parse honours a non-default pixel-data offset") {
    val base = handBmp
    // move the pixel array 4 bytes further out and patch bfOffBits
    val shifted = base.take(54) ++ Array[Byte](99, 99, 99, 99) ++ base.drop(54)
    System.arraycopy(le32(58), 0, shifted, 10, 4)
    assert(Bmp.parse(shifted).channels.toSeq == (1 to 12))
  }

  test("BMP parse rejects bad magic and unsupported depth") {
    val bad = handBmp; bad(0) = 'X'
    intercept[IllegalArgumentException](Bmp.parse(bad))
    val mono = handBmp
    System.arraycopy(le16(8), 0, mono, 28, 2) // claim 8 bpp
    intercept[IllegalArgumentException](Bmp.parse(mono))
  }

  test("BMP write/parse round-trips across all padding widths (0-3 bytes)") {
    for (w <- 4 to 8; h <- 2 to 3) {
      val channels = Array.tabulate(w * h * 3)(j => (j * 37 + 11) % 256)
      val img = Bmp.parse(Bmp.write(w, h, channels))
      assert(img.width == w && img.height == h)
      assert(img.channels.toSeq == channels.toSeq, s"w=$w h=$h")
    }
  }

  /** Hand-assembled RIFF/WAVE: fmt, then a 3-byte JUNK chunk (odd ⇒ one pad
    * byte), then data with samples [1000, -2] — a parser that assumes data
    * at offset 44 or skips chunks without word alignment reads garbage. */
  private def handWav: Array[Byte] = {
    Array[Byte]('R', 'I', 'F', 'F') ++ le32(4 + 24 + 12 + 12) ++
      Array[Byte]('W', 'A', 'V', 'E') ++
      Array[Byte]('f', 'm', 't', ' ') ++ le32(16) ++
      le16(1) ++ le16(1) ++ le32(8000) ++ le32(16000) ++ le16(2) ++ le16(16) ++
      Array[Byte]('J', 'U', 'N', 'K') ++ le32(3) ++ Array[Byte](42, 42, 42, 0) ++
      Array[Byte]('d', 'a', 't', 'a') ++ le32(4) ++ le16(1000) ++ le16(-2 & 0xffff)
  }

  test("WAV chunk walk skips odd-sized JUNK (with pad byte) and reads PCM") {
    val audio = Wav.parse(handWav)
    assert(audio.sampleRate == 8000)
    assert(audio.samples.toSeq == Seq[Short](1000, -2))
  }

  test("WAV parse rejects bad magic, truncated chunks, missing data") {
    val bad = handWav; bad(8) = 'X'
    intercept[IllegalArgumentException](Wav.parse(bad))
    intercept[IllegalArgumentException](Wav.parse(handWav.dropRight(3)))
    val noData = handWav.take(36) // header + fmt only
    intercept[IllegalArgumentException](Wav.parse(noData))
  }

  test("WAV write/parse round-trips incl. extreme samples and odd junk") {
    val samples = Array[Short](Short.MinValue, Short.MaxValue, 0, -1, 12345)
    for (junk <- 0 to 3) {
      val audio = Wav.parse(Wav.write(44100, samples, junk))
      assert(audio.sampleRate == 44100)
      assert(audio.samples.toSeq == samples.toSeq, s"junk=$junk")
    }
  }
}

/** The Spark-side mm04 path: executor-synthesized real containers decoded
  * by magic-sniffing mapPartitions. */
class ContainerPipelineSpec extends SparkSpec {

  test("syntheticContainers -> decodeContainers matches the content formulas") {
    import spark.implicits._
    val docs = spark.range(0, 20).select($"id".as("doc_id"))
    val out = Multimodal.decodeContainers(Multimodal.syntheticContainers(docs))
      .collect().sortBy(_.media_id)
    assert(out.length == 20)
    out.foreach { f =>
      val m = f.media_id
      if (m % 2 == 0) {
        val w = 4 + m % 5; val h = 3 + m % 4
        assert(f.format == "img" && f.width == w && f.height == h)
        assert(f.n_samples == w * h * 3 && f.sample_rate == 0L)
        val vals = (0L until w * h * 3).map(j => (m * 31 + j) % 256)
        assert(f.checksum == vals.foldLeft(0L)((a, v) => (a * 31 + v) % 1000000007L))
        assert(f.mean_val == vals.sum.toDouble / vals.length)
      } else {
        val n = 32 + m % 64
        assert(f.format == "audio" && f.sample_rate == 16000L && f.n_samples == n)
        assert(f.width == 0L && f.height == 0L)
        val u = (0L until n).map(i => (m * 131 + i * 17) % 65536)
        assert(f.checksum == u.foldLeft(0L)((a, v) => (a * 31 + v) % 1000000007L))
        val signed = u.map(v => if (v >= 32768) v - 65536 else v)
        assert(f.mean_val == signed.sum.toDouble / n)
      }
    }
  }
}
