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
}
