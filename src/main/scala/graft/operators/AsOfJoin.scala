package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time ("as-of") join — the canonical time-series join the
  * reference's InfluxDB/Flux surface implies for sensor enrichment
  * (SURVEY.md §2.3).
  *
  * For every left row, attach the latest right row whose `rightTs <=
  * leftTs` within the same `key` (inclusive match, like DuckDB/kdb ASOF).
  *
  * Implementation: union both sides tagged with a side marker, then a single
  * `last(_, ignoreNulls)` window over `(key) ORDER BY (ts, side)`. This costs
  * exactly ONE shuffle on the key and a per-partition sort — it scales
  * linearly with input size on a large cluster, unlike the naive
  * `l.ts >= r.ts` range join which Spark plans as a per-key cross product
  * (quadratic in rows-per-key at 100 TB). Skewed keys are handled by AQE;
  * for a known-hot key, pre-salt the key column on both sides.
  *
  * Right rows sort before left rows at equal timestamps, so an exact
  * timestamp match is visible to the left row. If the right side can carry
  * duplicate (key, ts) pairs, dedup it first — ties among right rows are
  * otherwise broken arbitrarily.
  */
object AsOfJoin {

  /** @param rightCols right-side columns to carry; each appears in the output
    *                  as `prefix + name` (nullable — null when no right row
    *                  precedes the left row).
    *
    * The carried columns are filled as ONE struct per right row: `last(...,
    * ignoreNulls)` then skips only the left rows' null placeholder struct,
    * never a genuine right row — so a right row whose payload value IS NULL
    * attaches that NULL (DuckDB/kdb ASOF semantics), instead of silently
    * reaching back to an older right row as a per-column fill would.
    */
  def joinAsOf(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      rightCols: Seq[String],
      prefix: String = "asof_"): DataFrame = {

    val leftCols = left.columns.toSeq
    val collisions = rightCols.map(prefix + _).filter(leftCols.contains)
    require(collisions.isEmpty,
      s"as-of join output column(s) ${collisions.mkString(", ")} collide with " +
        "left columns; pass a distinguishing prefix")
    val internal = Seq("__ts", "__side", "__r")
    val reserved = internal.filter(c =>
      leftCols.contains(c) || right.columns.contains(c))
    require(reserved.isEmpty,
      s"as-of join reserves column name(s) ${reserved.mkString(", ")}; " +
        "rename them on the inputs first")

    val payloadType = org.apache.spark.sql.types.StructType(
      rightCols.map(c => org.apache.spark.sql.types.StructField(
        c, right.schema(c).dataType, nullable = true)))

    val lTagged = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__r", lit(null).cast(payloadType))
    val rTagged = {
      val base = right
        .withColumn("__ts", col(rightTs))
        .withColumn("__side", lit(0))
        .withColumn("__r", struct(rightCols.map(col): _*))
        .select(col(key), col("__ts"), col("__side"), col("__r"))
      // null placeholders for every left column absent on the right
      leftCols.filterNot(_ == key).foldLeft(base) {
        case (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }
    }

    val w = Window
      .partitionBy(col(key))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val projected = rightCols.foldLeft(
      lTagged.unionByName(rTagged)
        .withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))) {
      case (df, c) => df.withColumn(prefix + c, col("__r").getField(c))
    }

    projected
      .filter(col("__side") === 1)
      .drop("__ts", "__side", "__r")
  }

  /** NEAREST-direction as-of join (pandas `merge_asof(direction='nearest')`):
    * for every left row, attach the right row with the smallest |Δt| within
    * the same `key` — whichever side of the left timestamp it falls on.
    * Exact-distance ties resolve BACKWARD (the earlier right row), so the
    * result is a deterministic function of the inputs.
    *
    * Same scale discipline as [[joinAsOf]]: ONE shuffle on the key. The
    * union gets two window passes over the same hash partitioning — an
    * ascending pass carrying the latest preceding right row and a
    * descending pass carrying the earliest following one (Catalyst reuses
    * the Exchange; only a second in-partition sort is added) — then a
    * per-row arithmetic pick between the two candidates. The naive
    * formulation (per-key join + global argmin per left row) is a per-key
    * cross product — quadratic in rows-per-key at 100 TB.
    *
    * `leftTs`/`rightTs` must be TIMESTAMP (distances compared in exact
    * epoch-µs) or an integral epoch column. If the right side can carry
    * duplicate (key, ts) pairs, dedup it first — candidate choice among
    * exact duplicates is otherwise arbitrary (same contract as
    * [[joinAsOf]]).
    *
    * Output: left columns + `prefix + c` for each right payload column +
    * `prefix + "match_ts"` (epoch-µs of the matched right row; all NULL
    * when the key has no right rows).
    */
  def joinAsOfNearest(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      rightCols: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    import org.apache.spark.sql.types._

    val leftCols = left.columns.toSeq
    val outCols = rightCols.map(prefix + _) :+ (prefix + "match_ts")
    val collisions = outCols.filter(leftCols.contains)
    require(collisions.isEmpty,
      s"as-of join output column(s) ${collisions.mkString(", ")} collide with " +
        "left columns; pass a distinguishing prefix")
    val internal = Seq("__tsn", "__side", "__r", "__b", "__f", "__n")
    val reserved = internal.filter(c =>
      leftCols.contains(c) || right.columns.contains(c))
    require(reserved.isEmpty,
      s"as-of join reserves column name(s) ${reserved.mkString(", ")}; " +
        "rename them on the inputs first")

    def micros(c: org.apache.spark.sql.Column, dt: DataType) = dt match {
      case TimestampType => unix_micros(c)
      case LongType | IntegerType | ShortType | ByteType => c.cast("long")
      case other => throw new IllegalArgumentException(
        s"nearest as-of needs a timestamp or integral epoch column, got $other")
    }

    val payloadType = StructType(
      rightCols.map(c => StructField(c, right.schema(c).dataType,
        nullable = true)) :+ StructField("__pts", LongType, nullable = true))

    val lTagged = left
      .withColumn("__tsn", micros(col(leftTs), left.schema(leftTs).dataType))
      .withColumn("__side", lit(1))
      .withColumn("__r", lit(null).cast(payloadType))
    val rTagged = {
      val base = right
        .withColumn("__tsn", micros(col(rightTs), right.schema(rightTs).dataType))
        .withColumn("__side", lit(0))
        .withColumn("__r", struct(
          rightCols.map(col) :+ col("__tsn").as("__pts"): _*))
        .select(col(key), col("__tsn"), col("__side"), col("__r"))
      leftCols.filterNot(_ == key).foldLeft(base) {
        case (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }
    }

    // right rows sort before left rows at equal timestamps in BOTH passes,
    // so an exact-timestamp right row is visible to the left row from
    // either direction (distance 0 → backward pick, same row)
    val wB = Window.partitionBy(col(key))
      .orderBy(col("__tsn").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(col(key))
      .orderBy(col("__tsn").desc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val picked = lTagged.unionByName(rTagged)
      .withColumn("__b", last(col("__r"), ignoreNulls = true).over(wB))
      .withColumn("__f", last(col("__r"), ignoreNulls = true).over(wF))
      .filter(col("__side") === 1)
      .withColumn("__n",
        when(col("__f").isNull, col("__b"))
          .when(col("__b").isNull, col("__f"))
          .otherwise(when(
            col("__tsn") - col("__b.__pts") <= col("__f.__pts") - col("__tsn"),
            col("__b")).otherwise(col("__f"))))

    val projected = rightCols.foldLeft(
        picked.withColumn(prefix + "match_ts", col("__n.__pts"))) {
      case (df, c) => df.withColumn(prefix + c, col("__n").getField(c))
    }
    projected.drop("__tsn", "__side", "__r", "__b", "__f", "__n")
  }
}
