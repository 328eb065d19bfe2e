package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{MediaCodecs, Multimodal}

/** Kernel properties of the mm08 perceptual-hash dedup, checked through the
  * REAL Spark path on hand-built BMPs (SparkSpec session) plus a pure
  * pigeonhole property for the band blocking. */
class AHashSpec extends SparkSpec {
  import spark.implicits._

  private def hashOf(imgs: (Long, Array[Byte])*): Map[Long, (Long, Long)] = {
    val ds = spark.createDataset(imgs.map { case (id, b) =>
      Multimodal.Container(id, b)
    })
    Multimodal.imageAHash(ds).collect().map(h => h.media_id -> (h.lo, h.hi)).toMap
  }

  private def flat(w: Int, h: Int, v: Int): Array[Int] =
    Array.fill(w * h * 3)(v)

  test("uniform image hashes to zero — no pixel is strictly above the mean") {
    val m = hashOf(1L -> MediaCodecs.Bmp.write(8, 8, flat(8, 8, 100)))
    assert(m(1L) == (0L, 0L))
  }

  test("one bright sampled pixel sets exactly that bit") {
    // 8x8 source = identity sampling; brighten pixel (x=3, y=2) → p = 19
    val ch = flat(8, 8, 10)
    val base = (2 * 8 + 3) * 3
    ch(base) = 255; ch(base + 1) = 255; ch(base + 2) = 255
    val m = hashOf(1L -> MediaCodecs.Bmp.write(8, 8, ch))
    assert(m(1L) == (1L << 19, 0L), s"got ${m(1L)}")
  }

  test("a high-index bright pixel lands in the hi word") {
    // pixel (x=7, y=7) → p = 63 → hi bit 31
    val ch = flat(8, 8, 10)
    val base = (7 * 8 + 7) * 3
    ch(base) = 255; ch(base + 1) = 255; ch(base + 2) = 255
    val m = hashOf(1L -> MediaCodecs.Bmp.write(8, 8, ch))
    assert(m(1L) == (0L, 1L << 31), s"got ${m(1L)}")
  }

  test("16x16 source samples even coordinates only") {
    // brighten ODD-coordinate pixels: the 8x8 grid never sees them
    val ch = flat(16, 16, 10)
    for (y <- 0 until 16; x <- 0 until 16 if y % 2 == 1 || x % 2 == 1) {
      val base = (y * 16 + x) * 3
      ch(base) = 255; ch(base + 1) = 255; ch(base + 2) = 255
    }
    val m = hashOf(1L -> MediaCodecs.Bmp.write(16, 16, ch))
    assert(m(1L) == (0L, 0L), s"odd pixels leaked into the hash: ${m(1L)}")
  }

  test("band blocking is pigeonhole-complete for ham <= 3") {
    // 4 bands of 16 bits: any pair within Hamming 3 shares >= 1 band
    val rng = new scala.util.Random(7)
    (1 to 2000).foreach { _ =>
      val lo = rng.nextLong() & 0xffffffffL
      val hi = rng.nextLong() & 0xffffffffL
      val flips = rng.nextInt(4) // 0..3 bit flips
      var (lo2, hi2) = (lo, hi)
      (1 to flips).foreach { _ =>
        val bit = rng.nextInt(64)
        if (bit < 32) lo2 ^= 1L << bit else hi2 ^= 1L << (bit - 32)
      }
      def bands(l: Long, h: Long) =
        Seq(l & 0xffff, (l >>> 16) & 0xffff, h & 0xffff, (h >>> 16) & 0xffff)
      assert(bands(lo, hi).zip(bands(lo2, hi2)).exists { case (a, b) => a == b },
        f"no shared band for ham<=3 pair: $lo%x/$hi%x vs $lo2%x/$hi2%x")
    }
  }
}
