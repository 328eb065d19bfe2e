package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType, TimestampType}
import org.scalacheck.{Gen, Prop, Properties}

import graft.operators.AsOfJoin
import graft.schema.GasSchema
import graft.store.LongStore
import graft.transform.GasTransform

/** Property-based pinning of transform/store invariants (SURVEY.md §5.3),
  * via ScalaCheck's native runner. */
object PropertySpec extends Properties("graft") {

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val secondsGen = Gen.chooseNum(0.0, 86400.0)

  property("timestampInDayRange") =
    Prop.forAll(Gen.nonEmptyListOf(secondsGen)) { ts =>
      val df = ts.toDF(GasSchema.timeCol)
        .withColumn("file_name", lit("20161007_210049.csv"))
      val out = GasTransform(df).select(unix_micros(col("_time"))).collect()
      val dayStart = java.time.Instant.parse("2016-10-07T00:00:00Z")
        .getEpochSecond * 1000000L
      val dayEnd = dayStart + 86400L * 1000000L
      out.forall { r =>
        val us = r.getLong(0)
        us >= dayStart && us <= dayEnd
      }
    }

  property("unpivotPreservesCountAndSum") =
    Prop.forAll(Gen.chooseNum(1, 25)) { n =>
      val rows = (1 to n).map { i =>
        Row.fromSeq(java.sql.Timestamp.valueOf(f"2016-10-07 00:00:${i % 60}%02d") +:
          Seq.tabulate(19)(j => (i * 100 + j).toDouble))
      }
      val schema = StructType(StructField("_time", TimestampType) +:
        GasSchema.sensorCols.map(c => StructField(c, DoubleType)))
      val wide = spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
      val long = LongStore.unpivot(wide)
      val wideSum = wide.select(
        GasSchema.sensorCols.map(c => sum(col(s"`$c`"))).reduce(_ + _).as("s"))
        .first().getDouble(0)
      val longSum = long.agg(sum(col("_value"))).first().getDouble(0)
      long.count() == n.toLong * 19 && math.abs(wideSum - longSum) < 1e-6
    }

  private val eventGen = for {
    k <- Gen.chooseNum(1L, 4L)
    t <- Gen.chooseNum(0L, 50L)
  } yield (k, t)

  property("asOfJoinMatchesReference") =
    Prop.forAll(Gen.nonEmptyListOf(eventGen), Gen.listOfN(12, eventGen)) { (ls, rsRaw) =>
      val rs = rsRaw.distinct // operator precondition: unique (key, ts) on the right
      val left = ls.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
        .toDF("k", "t", "lid")
      val right = rs.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
        .toDF("k", "t", "rid")
      val got = AsOfJoin.joinAsOf(left, right, "k", "t", "t", Seq("rid"))
        .select("lid", "asof_rid").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      val expected = ls.zipWithIndex.map { case ((k, t), i) =>
        val candidates = rs.zipWithIndex.filter { case ((rk, rt), _) => rk == k && rt <= t }
        i.toLong -> candidates.sortBy { case ((_, rt), _) => rt }.lastOption.map(_._2.toLong)
      }.toMap
      got == expected
    }

  // salting must be invisible in the output: same multiset of rows as the
  // plain equi-join, for any salt count, including duplicate keys both sides
  property("saltedJoinEqualsPlainJoin") =
    Prop.forAll(
      Gen.nonEmptyListOf(Gen.chooseNum(1L, 5L)),
      Gen.nonEmptyListOf(Gen.chooseNum(1L, 5L)),
      Gen.chooseNum(1, 7)) { (lks, rks, salts) =>
      val big = lks.zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("k", "lv")
      val small = rks.zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("k", "rv")
      def multiset(df: org.apache.spark.sql.DataFrame) =
        df.select("k", "lv", "rv").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
          .groupBy(identity).view.mapValues(_.length).toMap
      multiset(graft.operators.SaltedJoin.join(big, small, "k", salts)) ==
        multiset(big.join(small, Seq("k")))
    }

  // the min-label fixpoint must equal brute-force union-find on ANY graph —
  // chains, cycles, self-loops, duplicate edges, multiple components
  property("connectedComponentsMatchUnionFind") =
    Prop.forAll(Gen.listOfN(20,
      Gen.zip(Gen.chooseNum(1L, 12L), Gen.chooseNum(1L, 12L)))) { edges =>
      edges.isEmpty || {
        val got = graft.operators.ConnectedComponents
          .minLabel(edges.toDF("src", "dst"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val verts = edges.flatMap { case (a, b) => Seq(a, b) }.distinct
        // canonical id = min vertex of the component, on both sides
        val expected = verts.map { v =>
          val root = find(v)
          v -> verts.filter(find(_) == root).min
        }.toMap
        got == expected
      }
    }

  // 2-decimal "prices" (cents) — the shape every mean site aggregates
  private val centsGen = Gen.chooseNum(1L, 2000000L)

  /** halfUpMean6 ≡ exact BigDecimal HALF_UP at scale 6 — including the
    * exact-half-way quotients where a double round(sx/n, 6) is
    * engine-dependent (the ts29 class). Counts are biased toward the
    * dangerous 2-adic shapes (n = 32·odd gives reduced denominator 3200). */
  property("halfUpMean6EqualsBigDecimalHalfUp") =
    Prop.forAll(Gen.nonEmptyListOf(centsGen),
        Gen.oneOf(Gen.chooseNum(1, 200),
          Gen.chooseNum(1, 6).map(odd => 32 * (2 * odd - 1)))) { (cents, n0) =>
      val vals = cents.take(64)
      val n = math.max(1, n0 % (vals.size + 1))
      val sample = vals.take(n).map(c => c / 100.0)
      val got = sample.toDF("v")
        .agg(count(lit(1)).as("n"),
          sum(graft.queries.sumExactCol(col("v"))).as("s"))
        .select(graft.queries.halfUpMean6("s", "n").as("m"))
        .collect()(0).getDouble(0)
      // exact rational half-up: (2·sum_micro + n) / (2n) floored
      val sumMicro = BigInt(vals.take(n).sum) * 10000
      val wantMicro = (2 * sumMicro + n) / (2 * n)
      val wantD = (BigDecimal(wantMicro) / 1000000).toDouble
      // independent check via BigDecimal HALF_UP division
      val bdWant = (BigDecimal(vals.take(n).sum) / 100 / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      got == wantD && wantD == bdWant
    }

  /** ts41's sorted-array rolling median/MAD construction ≡ brute force —
    * bit-exact double equality, because both sides run the same IEEE sort,
    * element picks and one (a+b)/2 per statistic. */
  property("rollingMedianMadMatchesBruteForce") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.chooseNum(1, 20000))) { cents =>
      val vals = cents.take(60).map(_ / 100.0)
      val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("i", "v").withColumn("g", lit(1))
      val w = Window.partitionBy(col("g")).orderBy(col("i"))
        .rowsBetween(-14, 0)
      val got = df
        .withColumn("arr", sort_array(collect_list(col("v")).over(w)))
        .withColumn("n", size(col("arr")))
        .withColumn("med",
          (element_at(col("arr"), expr("cast((n + 1) div 2 as int)")) +
            element_at(col("arr"), expr("cast((n + 2) div 2 as int)"))) / 2)
        .withColumn("devs",
          expr("array_sort(transform(arr, x -> abs(x - med)))"))
        .withColumn("mad",
          (element_at(col("devs"), expr("cast((n + 1) div 2 as int)")) +
            element_at(col("devs"), expr("cast((n + 2) div 2 as int)"))) / 2)
        .select("i", "med", "mad").collect()
        .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
      def med(xs: Seq[Double]): Double = {
        val s = xs.sorted
        val n = s.size
        (s((n + 1) / 2 - 1) + s((n + 2) / 2 - 1)) / 2
      }
      vals.indices.forall { i =>
        val win = vals.slice(math.max(0, i - 14), i + 1)
        val m = med(win)
        got(i.toLong) == ((m, med(win.map(x => math.abs(x - m)))))
      }
    }

  /** ts44's dedup → 7-day fan-out → dedup → count construction ≡ a naive
    * per-day distinct scan. */
  property("rollingDistinctMatchesBruteForce") =
    Prop.forAll(Gen.nonEmptyListOf(
        Gen.zip(Gen.chooseNum(0, 20), Gen.chooseNum(0, 9)))) { pairs0 =>
      val pairs = pairs0.take(80)
      val df = pairs.map { case (d, u) => (d.toLong, u.toLong) }
        .toDF("dayo", "user_id")
        .select(expr("date_add(DATE '2024-01-01', cast(dayo as int))")
          .as("day"), col("user_id"))
      val du = df.distinct()
      val days = du.select(col("day")).distinct()
      val got = du
        .select(col("user_id"),
          explode(expr("sequence(day, date_add(day, 6))")).as("wday"))
        .distinct()
        .join(days.select(col("day").as("wday")), Seq("wday"))
        .groupBy(col("wday"))
        .agg(count(lit(1)).as("n7"))
        .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
      val present = pairs.map(_._1).distinct
      present.forall { d =>
        val want = pairs.collect {
          case (pd, u) if pd <= d && pd >= d - 6 => u
        }.distinct.size.toLong
        val key = java.time.LocalDate.of(2024, 1, 1).plusDays(d).toString
        got(key) == want
      }
    }

  /** The non-negative-sum precondition is ENFORCED: Spark `div` truncates
    * where DuckDB `//` floors, so a negative sum would silently
    * hash-diverge cross-engine — the guard must raise instead. */
  property("halfUpMean6RaisesOnNegativeSum") =
    Prop.forAll(Gen.chooseNum(-2000000L, -1L)) { cents =>
      val df = Seq(cents / 100.0).toDF("v")
        .agg(count(lit(1)).as("n"),
          sum(graft.queries.sumExactCol(col("v"))).as("s"))
        .select(graft.queries.halfUpMean6("s", "n").as("m"))
      Prop.throws(classOf[Throwable])(df.collect())
    }
}
