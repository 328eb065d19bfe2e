package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Real pure-JVM media codecs over public container formats — no stubs.
  *
  * Unlike [[Multimodal.FakeCodec]] (a documented stand-in for formats that
  * need native libraries), these parse genuine byte-level containers:
  *
  *  - [[Bmp]]: Windows BMP, 24-bpp uncompressed (BITMAPFILEHEADER +
  *    BITMAPINFOHEADER). The two details every naive parser gets wrong are
  *    covered: pixel rows are stored BOTTOM-UP, and every row is padded to a
  *    4-byte boundary. The parser honours the header's pixel-data offset
  *    rather than assuming 54.
  *  - [[Wav]]: RIFF/WAVE, 16-bit mono little-endian PCM. The parser does a
  *    real chunk walk — `fmt ` and `data` may be separated by arbitrary
  *    chunks (`JUNK`, `LIST`, ...), and odd-sized chunks carry a pad byte
  *    (RIFF word alignment) — so a fixed-offset-44 reader would fail on the
  *    files our writer emits.
  *
  * Writers exist so the pipeline can synthesize real containers on the
  * executors (this container ships no media fixtures); parsers never peek at
  * generator state — only bytes. The mm04 oracle replays the *content
  * formula* arithmetically, so any parse slip (row order, padding, chunk
  * offset, sign handling) diverges from the oracle and flips the compare.
  *
  * Reference scope: the reference pipeline treats sensor payloads as opaque
  * typed blobs (ETL.py:41-63); binary media decode is north-star engine
  * scope beyond it.
  */
object MediaCodecs {

  /** Decoded 24-bpp image: `channels` holds B,G,R bytes (0-255) per pixel in
    * TOP-DOWN raster order — i.e. storage order un-flipped and un-padded. */
  final case class BmpImage(width: Int, height: Int, channels: Array[Int])

  /** Decoded PCM audio: signed 16-bit samples, plus the fmt-chunk rate. */
  final case class WavAudio(sampleRate: Int, samples: Array[Short])

  object Bmp {
    private val FileHeaderLen = 14
    private val InfoHeaderLen = 40

    /** Bytes each stored pixel row occupies: 3 per pixel, padded to 4. */
    def rowBytes(width: Int): Int = (3 * width + 3) / 4 * 4

    /** Serialize top-down B,G,R channel bytes into a real 24-bpp BMP
      * (bottom-up rows, 4-byte row padding, positive biHeight). */
    def write(width: Int, height: Int, channels: Array[Int]): Array[Byte] = {
      require(channels.length == width * height * 3,
        s"need ${width * height * 3} channel bytes, got ${channels.length}")
      val stride  = rowBytes(width)
      val dataLen = stride * height
      val buf = ByteBuffer.allocate(FileHeaderLen + InfoHeaderLen + dataLen)
        .order(ByteOrder.LITTLE_ENDIAN)
      // BITMAPFILEHEADER
      buf.put('B'.toByte).put('M'.toByte)
      buf.putInt(buf.capacity())                  // bfSize
      buf.putShort(0).putShort(0)                 // bfReserved1/2
      buf.putInt(FileHeaderLen + InfoHeaderLen)   // bfOffBits
      // BITMAPINFOHEADER
      buf.putInt(InfoHeaderLen)                   // biSize
      buf.putInt(width).putInt(height)            // positive => bottom-up
      buf.putShort(1)                             // biPlanes
      buf.putShort(24)                            // biBitCount
      buf.putInt(0)                               // biCompression = BI_RGB
      buf.putInt(dataLen)                         // biSizeImage
      buf.putInt(2835).putInt(2835)               // 72 dpi
      buf.putInt(0).putInt(0)                     // biClrUsed/Important
      // pixel array: last raster row first
      var y = height - 1
      while (y >= 0) {
        var i = y * width * 3
        val rowEnd = i + width * 3
        while (i < rowEnd) { buf.put(channels(i).toByte); i += 1 }
        var p = 3 * width
        while (p < stride) { buf.put(0: Byte); p += 1 }
        y -= 1
      }
      buf.array()
    }

    /** Parse a 24-bpp uncompressed BMP back to top-down channel bytes. */
    def parse(bytes: Array[Byte]): BmpImage = {
      val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      require(bytes.length >= FileHeaderLen + InfoHeaderLen, "truncated BMP header")
      require(buf.get(0) == 'B' && buf.get(1) == 'M', "bad BMP magic")
      val offBits  = buf.getInt(10)
      val width    = buf.getInt(18)
      val height   = buf.getInt(22)
      val bitCount = buf.getShort(28).toInt
      val compress = buf.getInt(30)
      require(bitCount == 24 && compress == 0, s"unsupported BMP: $bitCount bpp, compression $compress")
      require(width > 0 && height > 0, s"unsupported BMP dims ${width}x$height")
      val stride = rowBytes(width)
      require(bytes.length >= offBits + stride * height, "truncated BMP pixel array")
      val channels = new Array[Int](width * height * 3)
      var y = 0
      while (y < height) {
        // stored row y holds raster row (height-1-y)
        val src = offBits + y * stride
        var dst = (height - 1 - y) * width * 3
        var i = 0
        while (i < width * 3) {
          channels(dst) = bytes(src + i) & 0xff
          dst += 1; i += 1
        }
        y += 1
      }
      BmpImage(width, height, channels)
    }
  }

  object Wav {
    /** Serialize mono 16-bit LE PCM into a RIFF/WAVE container. A `JUNK`
      * chunk of `junkLen` bytes sits between `fmt ` and `data` (odd lengths
      * get the RIFF pad byte), forcing consumers into a real chunk walk. */
    def write(sampleRate: Int, samples: Array[Short], junkLen: Int): Array[Byte] = {
      require(junkLen >= 0)
      val junkPadded = junkLen + (junkLen & 1)
      val dataLen    = samples.length * 2
      val riffLen    = 4 + (8 + 16) + (8 + junkPadded) + (8 + dataLen)
      val buf = ByteBuffer.allocate(8 + riffLen).order(ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")).putInt(riffLen)
      buf.put("WAVE".getBytes("US-ASCII"))
      // fmt chunk: PCM, mono, 16-bit
      buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      buf.putShort(1)                       // wFormatTag = PCM
      buf.putShort(1)                       // nChannels
      buf.putInt(sampleRate)
      buf.putInt(sampleRate * 2)            // nAvgBytesPerSec
      buf.putShort(2)                       // nBlockAlign
      buf.putShort(16)                      // wBitsPerSample
      // junk chunk (declared length odd => one pad byte follows)
      buf.put("JUNK".getBytes("US-ASCII")).putInt(junkLen)
      var j = 0
      while (j < junkPadded) { buf.put(0: Byte); j += 1 }
      // data chunk
      buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
      var i = 0
      while (i < samples.length) { buf.putShort(samples(i)); i += 1 }
      buf.array()
    }

    /** Chunk-walk a RIFF/WAVE container; returns fmt rate + PCM samples. */
    def parse(bytes: Array[Byte]): WavAudio = {
      val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      require(bytes.length >= 12, "truncated RIFF header")
      require(tag(bytes, 0) == "RIFF" && tag(bytes, 8) == "WAVE", "bad RIFF/WAVE magic")
      var pos = 12
      var sampleRate = -1
      var samples: Array[Short] = null
      while (pos + 8 <= bytes.length && (sampleRate < 0 || samples == null)) {
        val id  = tag(bytes, pos)
        val len = buf.getInt(pos + 4)
        require(len >= 0 && pos + 8 + len <= bytes.length, s"truncated '$id' chunk")
        id match {
          case "fmt " =>
            require(len >= 16, "short fmt chunk")
            val formatTag = buf.getShort(pos + 8).toInt
            val channels  = buf.getShort(pos + 10).toInt
            val bits      = buf.getShort(pos + 22).toInt
            require(formatTag == 1 && channels == 1 && bits == 16,
              s"unsupported WAV: format $formatTag, $channels ch, $bits bit")
            sampleRate = buf.getInt(pos + 12)
          case "data" =>
            require(sampleRate >= 0, "data chunk before fmt")
            val n = len / 2
            val out = new Array[Short](n)
            var i = 0
            while (i < n) { out(i) = buf.getShort(pos + 8 + 2 * i); i += 1 }
            samples = out
          case _ => () // skip JUNK/LIST/anything else
        }
        pos += 8 + len + (len & 1) // RIFF chunks are word-aligned
      }
      require(samples != null, "no data chunk")
      WavAudio(sampleRate, samples)
    }

    private def tag(bytes: Array[Byte], at: Int): String =
      new String(bytes, at, 4, "US-ASCII")
  }

  /** Decoded truecolor PNG: R,G,B bytes (0-255) per pixel, top-down. */
  final case class PngImage(width: Int, height: Int, rgb: Array[Int])

  /** PNG, 8-bit truecolor (color type 2), non-interlaced — a COMPRESSED
    * container: scanlines are byte-filtered then zlib-deflated (JDK
    * `Deflater`/`Inflater`, a real zlib), framed in CRC-32-guarded chunks.
    * The writer deliberately exercises what lazy readers skip: scanline
    * filters cycle None/Sub/Up per row (so unfiltering must actually
    * reconstruct, not memcpy), the deflate stream is split across TWO IDAT
    * chunks (readers must concatenate before inflating), and every chunk
    * CRC is verified on parse. Compressed output length depends on the
    * deflate implementation, so pipelines must treat container size as
    * opaque — only DECODED content is oracle-comparable. */
  object Png {
    private val Signature = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte)

    /** Serialize top-down R,G,B channel bytes into a real PNG. Row y uses
      * filter y%3: 0 None, 1 Sub (delta vs the pixel to the left), 2 Up
      * (delta vs the row above). */
    def write(width: Int, height: Int, rgb: Array[Int]): Array[Byte] = {
      require(rgb.length == width * height * 3,
        s"need ${width * height * 3} channel bytes, got ${rgb.length}")
      val stride = width * 3
      val raw = new Array[Byte](height * (1 + stride))
      var y = 0
      while (y < height) {
        val off = y * (1 + stride)
        val filter = y % 3
        raw(off) = filter.toByte
        var x = 0
        while (x < stride) {
          val v = rgb(y * stride + x)
          val pred = filter match {
            case 1 => if (x >= 3) rgb(y * stride + x - 3) else 0
            case 2 => if (y >= 1) rgb((y - 1) * stride + x) else 0
            case _ => 0
          }
          raw(off + 1 + x) = ((v - pred) & 0xff).toByte
          x += 1
        }
        y += 1
      }
      val deflater = new java.util.zip.Deflater()
      deflater.setInput(raw)
      deflater.finish()
      val comp = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      while (!deflater.finished()) comp.write(buf, 0, deflater.deflate(buf))
      deflater.end()
      val idat = comp.toByteArray
      val out = new java.io.ByteArrayOutputStream()
      out.write(Signature, 0, Signature.length)
      val ihdr = ByteBuffer.allocate(13).order(ByteOrder.BIG_ENDIAN)
      ihdr.putInt(width).putInt(height)
      ihdr.put(8: Byte)  // bit depth
      ihdr.put(2: Byte)  // color type: truecolor
      ihdr.put(0: Byte).put(0: Byte).put(0: Byte) // deflate, adaptive, no interlace
      writeChunk(out, "IHDR", ihdr.array())
      val cut = idat.length / 2 // two IDATs: readers must concatenate
      writeChunk(out, "IDAT", java.util.Arrays.copyOfRange(idat, 0, cut))
      writeChunk(out, "IDAT", java.util.Arrays.copyOfRange(idat, cut, idat.length))
      writeChunk(out, "IEND", Array.emptyByteArray)
      out.toByteArray
    }

    private def writeChunk(out: java.io.ByteArrayOutputStream, typ: String,
        data: Array[Byte]): Unit = {
      val t = typ.getBytes("US-ASCII")
      val len = ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN)
        .putInt(data.length).array()
      out.write(len, 0, 4)
      out.write(t, 0, 4)
      out.write(data, 0, data.length)
      val crc = new java.util.zip.CRC32()
      crc.update(t)
      crc.update(data)
      val c = ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN)
        .putInt(crc.getValue.toInt).array()
      out.write(c, 0, 4)
    }

    /** Chunk-walk + CRC-verify + inflate + unfilter back to top-down RGB. */
    def parse(bytes: Array[Byte]): PngImage = {
      require(bytes.length >= 8 && Signature.indices.forall(i => bytes(i) == Signature(i)),
        "bad PNG signature")
      val buf = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
      var pos = 8
      var width = -1
      var height = -1
      val idat = new java.io.ByteArrayOutputStream()
      var done = false
      while (!done) {
        require(pos + 8 <= bytes.length, "truncated PNG chunk header")
        val len = buf.getInt(pos)
        val typ = new String(bytes, pos + 4, 4, "US-ASCII")
        require(len >= 0 && pos + 12 + len <= bytes.length, s"truncated '$typ' chunk")
        val crc = new java.util.zip.CRC32()
        crc.update(bytes, pos + 4, 4 + len)
        require(crc.getValue.toInt == buf.getInt(pos + 8 + len),
          s"CRC mismatch in '$typ' chunk")
        typ match {
          case "IHDR" =>
            width = buf.getInt(pos + 8)
            height = buf.getInt(pos + 12)
            val depth = bytes(pos + 16).toInt
            val color = bytes(pos + 17).toInt
            val interlace = bytes(pos + 20).toInt
            require(depth == 8 && color == 2 && interlace == 0,
              s"unsupported PNG: depth $depth, color $color, interlace $interlace")
          case "IDAT" => idat.write(bytes, pos + 8, len)
          case "IEND" => done = true
          case _ => () // ancillary chunk — skip
        }
        pos += 12 + len
      }
      require(width > 0 && height > 0, "no IHDR before IDAT/IEND")
      val stride = width * 3
      val raw = new Array[Byte](height * (1 + stride))
      val inflater = new java.util.zip.Inflater()
      inflater.setInput(idat.toByteArray)
      var got = 0
      var stalls = 0 // n==0 with input remaining: bounded, then malformed
      while (got < raw.length && !inflater.finished()) {
        val n = inflater.inflate(raw, got, raw.length - got)
        require(!inflater.needsDictionary, "preset-dictionary zlib stream unsupported")
        require(n > 0 || !inflater.needsInput, "truncated deflate stream")
        if (n == 0) { stalls += 1; require(stalls < 8, "stalled deflate stream") }
        else stalls = 0
        got += n
      }
      inflater.end()
      require(got == raw.length, s"short pixel data: $got of ${raw.length}")
      val rgb = new Array[Int](width * height * 3)
      var y = 0
      while (y < height) {
        val off = y * (1 + stride)
        val filter = raw(off).toInt
        require(filter >= 0 && filter <= 2, s"unsupported filter $filter")
        var x = 0
        while (x < stride) {
          val pred = filter match {
            case 1 => if (x >= 3) rgb(y * stride + x - 3) else 0
            case 2 => if (y >= 1) rgb((y - 1) * stride + x) else 0
            case _ => 0
          }
          rgb(y * stride + x) = ((raw(off + 1 + x) & 0xff) + pred) & 0xff
          x += 1
        }
        y += 1
      }
      PngImage(width, height, rgb)
    }
  }
}
