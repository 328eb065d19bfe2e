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
    val rightTypes = rightCols.map(c => c -> right.schema(c).dataType).toMap

    val lTagged = rightCols.foldLeft(
      left.withColumn("__ts", col(leftTs)).withColumn("__side", lit(1))) {
      case (df, c) => df.withColumn(prefix + c, lit(null).cast(rightTypes(c)))
    }
    val rTagged = {
      val base = right
        .withColumn("__ts", col(rightTs))
        .withColumn("__side", lit(0))
      val withPrefixed = rightCols.foldLeft(base) { case (df, c) =>
        df.withColumn(prefix + c, col(c))
      }
      // null placeholders for every left column absent on the right
      leftCols.filterNot(_ == key).foldLeft(
        withPrefixed.select((Seq(key, "__ts", "__side") ++ rightCols.map(prefix + _)).map(col): _*)) {
        case (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }
    }

    val unioned = lTagged.unionByName(rTagged)
    val w = Window
      .partitionBy(col(key))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = rightCols.foldLeft(unioned) { case (df, c) =>
      df.withColumn(prefix + c, last(col(prefix + c), ignoreNulls = true).over(w))
    }

    filled
      .filter(col("__side") === 1)
      .drop("__ts", "__side")
  }
}
