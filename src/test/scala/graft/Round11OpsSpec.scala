package graft

/** Kernel semantics for the round-11 additions — ts68 trimmed mean,
  * ts69's integer control-chart breach rule, ts70 Cox–Stuart pairing,
  * tx47 total-variation drift — pinned against brute-force math on
  * handcrafted/seeded fixtures (the sf oracles verify engine-vs-DuckDB;
  * these verify the MATH). Pure JVM checks: none of these need a
  * SparkSession, so the suite stays sub-second. */
class Round11OpsSpec extends org.scalatest.funsuite.AnyFunSuite {

  /** ts68's trim rule replayed in plain Scala: rank by (value, id),
    * drop k = ⌊n/10⌋ per side, half-up integer-micro mean. */
  private def trimmedMicro(vals: Seq[(Double, Long)]): Long = {
    val sorted = vals.sortBy { case (v, id) => (v, id) }
    val k = sorted.size / 10
    val kept = sorted.slice(k, sorted.size - k)
    val sx = kept.map { case (v, _) =>
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP) }.sum
    val tn = kept.size
    ((2 * (sx * 1000000).toBigInt + tn) / (2 * tn)).toLong
  }

  test("ts68: trim drops exactly k per side and the survivors' mean moves " +
    "toward the median under one-sided outliers") {
    val rnd = new scala.util.Random(3)
    for (_ <- 1 to 50) {
      val n = 20 + rnd.nextInt(200)
      val base = (1 to n).map(i => (rnd.nextDouble() * 100, i.toLong))
      // inject high outliers on 5% of ids — the trimmed mean must sit
      // BELOW the raw mean (outliers are one-sided)
      val data = base.map { case (v, id) =>
        if (id % 20 == 0) (v + 10000.0, id) else (v, id) }
      val k = data.size / 10
      val sorted = data.sortBy { case (v, id) => (v, id) }
      val kept = sorted.slice(k, sorted.size - k)
      assert(kept.size == data.size - 2 * k)
      val rawMicro = {
        val sx = data.map { case (v, _) =>
          BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP) }.sum
        ((2 * (sx * 1000000).toBigInt + data.size) / (2 * data.size)).toLong
      }
      if (k >= data.count(_._2 % 20 == 0))
        assert(trimmedMicro(data) < rawMicro,
          s"n=$n k=$k: trimmed mean did not shed the high outliers")
    }
  }

  test("ts68: trimming a symmetric frame is mean-neutral") {
    // values symmetric around 50 → trim removes matching extremes, the
    // half-up micro mean is exactly 50e6 before and after
    val vals = (1 to 99).map(i => (i.toDouble, i.toLong))
    assert(trimmedMicro(vals) == 50000000L)
  }

  test("ts69: the 1000/2660 integer breach rule IS |m - c| > 2.66*MRbar " +
    "in exact rationals") {
    val rnd = new scala.util.Random(5)
    for (_ <- 1 to 10000) {
      val m = (rnd.nextLong() & Long.MaxValue) % 1000000000L
      val c = (rnd.nextLong() & Long.MaxValue) % 1000000000L
      val mr = (rnd.nextLong() & Long.MaxValue) % 100000000L
      val integerRule = math.abs(m - c) * 1000L > mr * 2660L
      val rationalRule =
        BigDecimal(math.abs(m - c)) > BigDecimal("2.66") * BigDecimal(mr)
      assert(integerRule == rationalRule, s"m=$m c=$c mr=$mr")
    }
  }

  test("ts70: i <-> i+ceil(n/2) pairing (the textbook form) uses " +
    "floor(n/2) pairs and drops exactly an odd series' MIDDLE element") {
    for (n <- 1 to 50) {
      val h = n / 2           // pairs
      val shift = n - n / 2   // ceil(n/2) — the engine's (n - n div 2)
      val pairs = (1 to n).filter(_ <= h).map(i => (i, i + shift))
      assert(pairs.size == h)
      assert(pairs.forall { case (_, b) => b >= 1 && b <= n })
      val used = pairs.flatMap { case (a, b) => Seq(a, b) }.toSet
      if (n % 2 == 1 && n > 1) {
        // odd n: the single unused element is the middle, (n+1)/2
        assert(used == (1 to n).toSet - ((n + 1) / 2),
          s"n=$n: expected exactly the middle dropped, used=$used")
      } else if (n % 2 == 0) {
        assert(used == (1 to n).toSet, s"n=$n: even series uses every hour")
      }
    }
  }

  test("tx47: integer-cross-multiplied TVD equals the ratio definition and " +
    "sits in [0, 1]") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      val vocab = 1 + rnd.nextInt(30)
      val c0 = Seq.fill(vocab)(rnd.nextInt(1000).toLong)
      val c1 = Seq.fill(vocab)(rnd.nextInt(1000).toLong)
      val (n0, n1) = (c0.sum max 1L, c1.sum max 1L)
      val sn = c0.zip(c1).map { case (a, b) => (a * n1 - b * n0).abs }.sum
      val tvd = sn.toDouble / (2L * n0 * n1).toDouble
      val direct = 0.5 * c0.zip(c1).map { case (a, b) =>
        math.abs(a.toDouble / n0 - b.toDouble / n1) }.sum
      assert(tvd >= 0.0 && tvd <= 1.0 + 1e-12, s"tvd=$tvd")
      assert(math.abs(tvd - direct) < 1e-9,
        s"integer form diverged from the ratio definition: $tvd vs $direct")
      // identical distributions → exactly 0 (integer arithmetic, no fuzz)
      val same = c0.zip(c0).map { case (a, b) => (a * n0 - b * n0).abs }.sum
      assert(same == 0L)
    }
  }

  test("v37/v42 audit stride: every query audited at gate scale, ~5 at any " +
    "rung") {
    def stride(n: Long) = 100L * math.max(1L, n / 500L)
    assert(stride(500) == 100L, "sf0.01 gate: stride must equal the query " +
      "modulus so the oracle sees every query audited")
    assert(stride(5000) == 1000L)
    assert(stride(160000) == 32000L) // 32x rung: 160000/32000 = 5 audited
    for (n <- Seq(500L, 5000L, 160000L, 10000000L)) {
      val audited = (0L until n).count(id => id % stride(n) == 0)
      assert(audited >= 1 && audited <= 10, s"n=$n audited=$audited")
    }
  }
}
