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

  /** One decoded animation frame: palette-index pixels in raster order
    * (the writer's palette is the identity grayscale ramp, so an index IS
    * the intensity), plus the frame's GCE delay in centiseconds. */
  final case class GifFrame(left: Int, top: Int, width: Int, height: Int,
      delayCs: Int, pixels: Array[Int])

  /** Decoded animation: logical screen size + frames in stream order. */
  final case class GifAnim(width: Int, height: Int, frames: Seq[GifFrame])

  /** GIF89a, 8-bit global palette, multi-frame (animated) — the VIDEO-
    * shaped container: frame extraction means a real block walk (extension
    * blocks must be skipped by their sub-block chain, not fixed offsets)
    * and a real LZW decompressor (variable-width codes LSB-first, CLEAR /
    * EOI handling, the KwKwK self-reference case, code-width growth).
    *
    * The writer emits genuinely-valid streams the cheap way every GIF
    * encoder is allowed to: literal codes with periodic CLEARs (classic
    * "uncompressed GIF"), a NETSCAPE looping application extension (so
    * parsers must skip an app extension, not just GCEs), and per-frame
    * Graphic Control Extensions carrying distinct delays. The parser is a
    * full LZW decoder, NOT a literal-stream shortcut — it handles
    * compressed streams from any conforming encoder. */
  object Gif {

    private def u16(bytes: Array[Byte], at: Int): Int =
      (bytes(at) & 0xff) | ((bytes(at + 1) & 0xff) << 8)

    /** Serialize frames of 8-bit palette indices (= grayscale intensities)
      * into an animated GIF89a. `frames` = (delayCs, pixels); every frame
      * is full-screen at (0,0). */
    def write(width: Int, height: Int, frames: Seq[(Int, Array[Int])]): Array[Byte] = {
      require(frames.nonEmpty, "need at least one frame")
      val out = new java.io.ByteArrayOutputStream()
      out.write("GIF89a".getBytes("US-ASCII"))
      def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
      w16(width); w16(height)
      out.write(0xf7) // GCT present, 8-bit colour resolution, 256 entries
      out.write(0)    // background index
      out.write(0)    // aspect ratio
      var i = 0
      while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
      // NETSCAPE2.0 looping app extension — parsers must walk sub-blocks
      out.write(0x21); out.write(0xff); out.write(11)
      out.write("NETSCAPE2.0".getBytes("US-ASCII"))
      out.write(3); out.write(1); w16(0); out.write(0)
      frames.foreach { case (delayCs, pixels) =>
        require(pixels.length == width * height, "frame size mismatch")
        out.write(0x21); out.write(0xf9); out.write(4) // GCE
        out.write(0)                                   // no disposal/transparency
        w16(delayCs); out.write(0); out.write(0)
        out.write(0x2c)                                // image descriptor
        w16(0); w16(0); w16(width); w16(height)
        out.write(0)                                   // no LCT, not interlaced
        out.write(8)                                   // LZW min code size
        val lzw = encodeLzw(pixels)
        var off = 0
        while (off < lzw.length) {
          val n = math.min(255, lzw.length - off)
          out.write(n); out.write(lzw, off, n)
          off += n
        }
        out.write(0) // block terminator
      }
      out.write(0x3b) // trailer
      out.toByteArray
    }

    /** Literal-code LZW at fixed 9-bit width: CLEAR, then each pixel as
      * its own code, re-CLEARing every 200 codes so the dictionary never
      * reaches the 512-entry width-growth point (sidestepping the
      * early/late-change encoder ambiguity — decoders of either
      * convention read this stream identically). */
    private def encodeLzw(pixels: Array[Int]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var acc = 0L
      var nBits = 0
      def emit(code: Int): Unit = {
        acc |= code.toLong << nBits
        nBits += 9
        while (nBits >= 8) {
          out.write((acc & 0xff).toInt); acc >>= 8; nBits -= 8
        }
      }
      emit(256) // CLEAR
      var n = 0
      pixels.foreach { p =>
        if (n == 200) { emit(256); n = 0 }
        emit(p); n += 1
      }
      emit(257) // EOI
      if (nBits > 0) out.write((acc & 0xff).toInt)
      out.toByteArray
    }

    /** Full variable-width LZW decode (any conforming GIF stream). */
    private def decodeLzw(data: Array[Byte], minCodeSize: Int,
        expected: Int): Array[Int] = {
      val clear = 1 << minCodeSize
      val eoi = clear + 1
      val out = new Array[Int](expected)
      var n = 0
      val dict = new scala.collection.mutable.ArrayBuffer[Array[Int]](4096)
      var width = 0
      def reset(): Unit = {
        dict.clear()
        var c = 0
        while (c < clear) { dict += Array(c); c += 1 }
        dict += null; dict += null // CLEAR, EOI slots
        width = minCodeSize + 1
      }
      reset()
      var prev: Array[Int] = null
      var acc = 0L
      var nBits = 0
      var pos = 0
      var done = false
      while (!done) {
        while (nBits < width && pos < data.length) {
          acc |= (data(pos) & 0xffL) << nBits
          nBits += 8; pos += 1
        }
        require(nBits >= width, "LZW stream truncated")
        val code = (acc & ((1L << width) - 1)).toInt
        acc >>= width; nBits -= width
        if (code == clear) { reset(); prev = null }
        else if (code == eoi) done = true
        else {
          val entry =
            if (code < dict.length && dict(code) != null) dict(code)
            else if (code == dict.length && prev != null)
              prev :+ prev(0) // the KwKwK case
            else throw new IllegalArgumentException(s"bad LZW code $code")
          require(n + entry.length <= expected, "LZW output overrun")
          System.arraycopy(entry, 0, out, n, entry.length)
          n += entry.length
          if (prev != null && dict.length < 4096) {
            dict += prev :+ entry(0)
            if (dict.length == (1 << width) && width < 12) width += 1
          }
          prev = entry
        }
      }
      require(n == expected, s"decoded $n of $expected pixels")
      out
    }

    /** Block-walk + LZW-decode every frame. Extensions (GCE, application,
      * comment, plain-text) are skipped by their length-prefixed sub-block
      * chains; the GCE's delay is captured for the following frame. */
    def parse(bytes: Array[Byte]): GifAnim = {
      val magic = new String(bytes, 0, 6, "US-ASCII")
      require(magic == "GIF89a" || magic == "GIF87a", s"bad GIF magic $magic")
      val width = u16(bytes, 6)
      val height = u16(bytes, 8)
      val packed = bytes(10) & 0xff
      var pos = 13
      if ((packed & 0x80) != 0) pos += 3 * (1 << ((packed & 7) + 1))
      val frames = Seq.newBuilder[GifFrame]
      var pendingDelay = 0
      var done = false
      while (!done) {
        (bytes(pos) & 0xff) match {
          case 0x3b => done = true
          case 0x21 => // extension: label + sub-block chain
            val label = bytes(pos + 1) & 0xff
            pos += 2
            if (label == 0xf9) pendingDelay = u16(bytes, pos + 2)
            while ((bytes(pos) & 0xff) != 0) pos += 1 + (bytes(pos) & 0xff)
            pos += 1
          case 0x2c =>
            val left = u16(bytes, pos + 1)
            val top = u16(bytes, pos + 3)
            val fw = u16(bytes, pos + 5)
            val fh = u16(bytes, pos + 7)
            val fPacked = bytes(pos + 9) & 0xff
            require((fPacked & 0x40) == 0, "interlaced GIF not supported")
            pos += 10
            if ((fPacked & 0x80) != 0) pos += 3 * (1 << ((fPacked & 7) + 1))
            val minCodeSize = bytes(pos) & 0xff
            pos += 1
            val lzw = new java.io.ByteArrayOutputStream()
            while ((bytes(pos) & 0xff) != 0) {
              val len = bytes(pos) & 0xff
              lzw.write(bytes, pos + 1, len)
              pos += 1 + len
            }
            pos += 1
            frames += GifFrame(left, top, fw, fh, pendingDelay,
              decodeLzw(lzw.toByteArray, minCodeSize, fw * fh))
            pendingDelay = 0
          case other =>
            throw new IllegalArgumentException(f"unknown GIF block 0x$other%02x")
        }
      }
      GifAnim(width, height, frames.result())
    }
  }
}
