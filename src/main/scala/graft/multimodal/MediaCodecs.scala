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
}
