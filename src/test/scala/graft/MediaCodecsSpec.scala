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

  // ---------------------------------------------------------------- PNG

  private def be32(v: Int): Array[Byte] =
    Array[Byte]((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)

  private def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val t = typ.getBytes("US-ASCII")
    val crc = new java.util.zip.CRC32()
    crc.update(t); crc.update(data)
    be32(data.length) ++ t ++ data ++ be32(crc.getValue.toInt)
  }

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(raw); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](1024)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end(); out.toByteArray
  }

  private val pngSig =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Hand-assembled 2×2 truecolor PNG with hand-computed filter bytes:
    * row 0 filter None, row 1 filter Up with deltas that WRAP mod 256 —
    * a parser that skips unfiltering (or signs the bytes) cannot pass. */
  private def handPng: Array[Byte] = {
    val ihdr = be32(2) ++ be32(2) ++ Array[Byte](8, 2, 0, 0, 0)
    val raw = Array[Byte](
      0, 10, 20, 30, 40, 50, 60,                             // row0: None
      2, 5, 5, 5, 250.toByte, 250.toByte, 250.toByte)        // row1: Up
    pngSig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", deflate(raw)) ++
      chunk("IEND", Array.emptyByteArray)
  }

  test("PNG parse unfilters Up rows with mod-256 wraparound") {
    val img = MediaCodecs.Png.parse(handPng)
    assert(img.width == 2 && img.height == 2)
    assert(img.rgb.toSeq == Seq(10, 20, 30, 40, 50, 60,
      15, 25, 35, (40 + 250) % 256, (50 + 250) % 256, (60 + 250) % 256))
  }

  test("PNG parse concatenates IDAT chunks split at arbitrary points") {
    val ihdr = be32(2) ++ be32(2) ++ Array[Byte](8, 2, 0, 0, 0)
    val raw = Array[Byte](
      0, 10, 20, 30, 40, 50, 60,
      1, 5, 5, 5, 7, 7, 7) // row1: Sub (left-pixel deltas)
    val z = deflate(raw)
    // three-way split, including a 1-byte chunk
    val parts = Seq(z.slice(0, 1), z.slice(1, z.length / 2),
      z.slice(z.length / 2, z.length))
    val bytes = pngSig ++ chunk("IHDR", ihdr) ++
      parts.map(chunk("IDAT", _)).reduce(_ ++ _) ++
      chunk("IEND", Array.emptyByteArray)
    val img = MediaCodecs.Png.parse(bytes)
    // Sub predicts from the pixel to the LEFT in the same row
    assert(img.rgb.toSeq == Seq(10, 20, 30, 40, 50, 60,
      5, 5, 5, 12, 12, 12))
  }

  test("PNG parse rejects a preset-dictionary zlib stream instead of spinning") {
    // zlib with FDICT set: Inflater returns 0 with needsDictionary=true and
    // needsInput=false — an unguarded inflate loop never terminates here
    val raw = Array[Byte](
      0, 10, 20, 30, 40, 50, 60,
      0, 5, 5, 5, 7, 7, 7)
    val dict = Array[Byte](10, 20, 30)
    val d = new java.util.zip.Deflater()
    d.setDictionary(dict)
    d.setInput(raw); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](1024)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    val ihdr = be32(2) ++ be32(2) ++ Array[Byte](8, 2, 0, 0, 0)
    val bytes = pngSig ++ chunk("IHDR", ihdr) ++
      chunk("IDAT", out.toByteArray) ++ chunk("IEND", Array.emptyByteArray)
    val e = intercept[IllegalArgumentException](MediaCodecs.Png.parse(bytes))
    assert(e.getMessage.contains("preset-dictionary"))
  }

  test("PNG parse rejects a corrupted chunk CRC") {
    val bytes = handPng
    bytes(bytes.length - 5) = (bytes(bytes.length - 5) ^ 0x01).toByte // IEND CRC
    val e = intercept[IllegalArgumentException](MediaCodecs.Png.parse(bytes))
    assert(e.getMessage.contains("CRC"))
  }

  test("PNG write → parse round-trips the filter cycle (None/Sub/Up)") {
    val (w, h) = (5, 7) // ≥3 rows so every filter type is exercised
    val rgb = Array.tabulate(w * h * 3)(j => (j * 13 + 7) % 256)
    val img = MediaCodecs.Png.parse(MediaCodecs.Png.write(w, h, rgb))
    assert(img.width == w && img.height == h)
    assert(img.rgb.toSeq == rgb.toSeq)
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

  test("Spark PNG decode matches the generating formula end-to-end") {
    val docs = spark.range(0, 12).selectExpr("id AS doc_id")
    val feats = Multimodal.decodePngs(Multimodal.syntheticPngs(docs))
      .collect().sortBy(_.media_id)
    assert(feats.length == 12)
    feats.foreach { f =>
      val m = f.media_id
      val w = 3 + m % 6; val h = 2 + m % 5
      assert(f.width == w && f.height == h && f.n_channels == w * h * 3)
      val vals = (0L until w * h * 3).map(j => (m * 37 + j * 11) % 256)
      assert(f.checksum == vals.foldLeft(0L)((a, v) => (a * 31 + v) % 1000000007L))
      assert(f.mean_val == vals.sum.toDouble / vals.length)
    }
  }

  test("Spark GIF frame extraction matches the generating formula end-to-end") {
    val docs = spark.range(0, 12).selectExpr("id AS doc_id")
    val feats = Multimodal.gifFrames(Multimodal.syntheticGifs(docs))
      .collect().sortBy(f => (f.media_id, f.frame_idx))
    assert(feats.length == (0L until 12L).map(m => 1 + m % 3).sum)
    feats.foreach { f =>
      val m = f.media_id; val fi = f.frame_idx
      val w = 2 + m % 4; val h = 2 + m % 3
      assert(f.width == w && f.height == h)
      assert(f.delay_cs == 4 + (m + fi) % 7)
      val vals = (0L until w * h).map(p => (m * 31 + fi * 17 + p * 7) % 256)
      assert(f.checksum == vals.foldLeft(0L)((a, v) => (a * 31 + v) % 1000000007L))
      assert(f.mean_val == vals.sum.toDouble / vals.length)
    }
  }
}

/** Pins [[MediaCodecs.Gif]]: write/parse round-trips, and hand-assembled
  * COMPRESSED LZW streams the literal-code writer never produces — the
  * KwKwK self-reference case and dictionary code-width growth — so the
  * decoder is proven a real LZW decompressor, not a literal-stream
  * shortcut that happens to round-trip its own writer. */
class GifCodecSpec extends AnyFunSuite {
  import MediaCodecs.Gif

  test("GIF write/parse round-trips frames, sizes and delays") {
    for (w <- 2 to 5; h <- 2 to 4; nf <- 1 to 3) {
      val frames = (0 until nf).map { f =>
        (f * 3 + 1, Array.tabulate(w * h)(p => (f * 91 + p * 53) % 256))
      }
      val anim = Gif.parse(Gif.write(w, h, frames))
      assert(anim.width == w && anim.height == h && anim.frames.length == nf)
      anim.frames.zipWithIndex.foreach { case (fr, f) =>
        assert(fr.width == w && fr.height == h && fr.delayCs == f * 3 + 1)
        assert(fr.pixels.toSeq == frames(f)._2.toSeq, s"w=$w h=$h f=$f")
      }
    }
  }

  test("GIF round-trip covers >512-pixel frames (dictionary past one CLEAR span)") {
    val w = 40; val h = 20
    val px = Array.tabulate(w * h)(p => (p * 7 + 3) % 256)
    val anim = Gif.parse(Gif.write(w, h, Seq((0, px))))
    assert(anim.frames.head.pixels.toSeq == px.toSeq)
  }

  /** Minimal GIF wrapper around raw LZW image bytes (4-entry palette,
    * one w×1 frame, no extensions). */
  private def wrap(lzw: Array[Byte], w: Int, minCodeSize: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    w16(w); w16(1)
    out.write(0x81); out.write(0); out.write(0) // 4-entry GCT
    (0 until 4).foreach { i => out.write(i); out.write(i); out.write(i) }
    out.write(0x2c); w16(0); w16(0); w16(w); w16(1); out.write(0)
    out.write(minCodeSize)
    var off = 0
    while (off < lzw.length) {
      val n = math.min(255, lzw.length - off)
      out.write(n); out.write(lzw, off, n)
      off += n
    }
    out.write(0); out.write(0x3b)
    out.toByteArray
  }

  /** LSB-first variable-width code packer (the GIF bit order). */
  private def pack(codes: Seq[(Int, Int)]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var acc = 0L; var nBits = 0
    codes.foreach { case (code, width) =>
      acc |= code.toLong << nBits; nBits += width
      while (nBits >= 8) { out.write((acc & 0xff).toInt); acc >>= 8; nBits -= 8 }
    }
    if (nBits > 0) out.write((acc & 0xff).toInt)
    out.toByteArray
  }

  test("LZW decoder handles the KwKwK self-reference case") {
    // pixels 'aaaa' (a = 0) compressed by a REAL LZW encoder with
    // minCodeSize 2 (clear 4, eoi 5): CLEAR, 0, 6, 0, EOI — code 6 is
    // consumed before its dictionary entry exists (cScSc), forcing the
    // prev + prev[0] reconstruction.
    val lzw = pack(Seq((4, 3), (0, 3), (6, 3), (0, 3), (5, 3)))
    val anim = Gif.parse(wrap(lzw, w = 4, minCodeSize = 2))
    assert(anim.frames.head.pixels.toSeq == Seq(0, 0, 0, 0))
  }

  test("LZW decoder grows the code width when the dictionary fills") {
    // 300 literal 8-bit pixels after ONE CLEAR: the decoder adds an entry
    // per code after the first, so entry 512 arrives mid-stream and codes
    // switch from 9 to 10 bits exactly there. The packer simulates the
    // encoder side of the same convention.
    val px = Array.tabulate(300)(i => (i * 11 + 5) % 256)
    val codes = Seq.newBuilder[(Int, Int)]
    codes += ((256, 9))
    var dictSize = 258
    var width = 9
    px.zipWithIndex.foreach { case (p, i) =>
      codes += ((p, width))
      if (i > 0) { // dictionary adds start with the second code
        dictSize += 1
        if (dictSize == (1 << width)) width += 1
      }
    }
    codes += ((257, width))
    val anim = Gif.parse(wrap(pack(codes.result()), w = 300, minCodeSize = 8))
    assert(anim.frames.head.pixels.toSeq == px.toSeq)
  }
}
