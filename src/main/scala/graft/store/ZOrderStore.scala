package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for multi-dimensional data skipping —
  * the lakehouse answer to "my scans filter on BOTH user and time, but a
  * sort can only cluster one of them" (SURVEY.md §2 scale extensions; same
  * layout Delta's OPTIMIZE ZORDER BY and Iceberg's sort-order rewrite
  * produce).
  *
  * Each of the two dimensions is normalised to 8 bits against its observed
  * min/max (one cheap distributed aggregate — never a driver collect), the
  * bits are interleaved into a 16-bit Morton code, and rows are written
  * grid-partitioned by the top `cellBits` of that code. Every output file
  * then covers a bounded RECTANGLE in (dim1, dim2) space, so a predicate
  * box on both dimensions intersects O(perimeter) cells instead of the
  * O(full stripe) a single-dimension sort leaves behind; file/row-group
  * min-max stats (parquet footers here; a table-format stats catalog at
  * 100 TB) prune the rest. The whole computation is map-side expression
  * work — the only wide operation is the write itself.
  */
object ZOrderStore {

  /** 16-bit Morton interleave of two 8-bit normalised dimensions.
    * `mn`/`mx` come from a one-row broadcast aggregate of the input. */
  private[graft] def mortonCode(d1: Column, mn1: Column, mx1: Column,
      d2: Column, mn2: Column, mx2: Column): Column = {
    // constant dimension (mx == mn) maps to bucket 0 rather than a NaN
    def norm(c: Column, mn: Column, mx: Column): Column =
      when(mx === mn, lit(0)).otherwise(
        least(lit(255), greatest(lit(0),
          floor((c.cast("double") - mn) / (mx - mn) * 256)))).cast("int")
    val b1 = norm(d1, mn1, mx1)
    val b2 = norm(d2, mn2, mx2)
    // acc | (bit i of b1 -> 2i) | (bit i of b2 -> 2i+1), i = 0..7
    // (the scala DSL's shiftleft/shiftright only take literal Int shift
    // amounts, so the column-valued shifts go through call_function)
    def shl(c: Column, by: Column) = call_function("shiftleft", c, by)
    def shr(c: Column, by: Column) = call_function("shiftright", c, by)
    aggregate(sequence(lit(0), lit(7)), lit(0),
      (acc, i) => acc
        .bitwiseOR(shl(shr(b1, i) % 2, lit(2) * i))
        .bitwiseOR(shl(shr(b2, i) % 2, lit(2) * i + 1)))
  }

  /** Write `df` to `path` clustered on the Morton code of `(d1, d2)`,
    * grid-partitioned into 2^cellBits z-cells (directory-partitioned on
    * `_zcell`, so the cell assignment is exact and deterministic — no
    * range-sampling). Reading `path` back yields the original columns plus
    * the `_zcell` partition column. */
  def write(df: DataFrame, d1: String, d2: String, path: String,
      cellBits: Int = 6): Unit = {
    val ranges = df.agg(
      min(col(d1).cast("double")).as("mn1"), max(col(d1).cast("double")).as("mx1"),
      min(col(d2).cast("double")).as("mn2"), max(col(d2).cast("double")).as("mx2"))
    df.crossJoin(broadcast(ranges))
      .withColumn("_zcell",
        shiftright(mortonCode(col(d1), col("mn1"), col("mx1"),
          col(d2), col("mn2"), col("mx2")), 16 - cellBits))
      .drop("mn1", "mx1", "mn2", "mx2")
      .repartition(col("_zcell"))
      .write.mode("overwrite").partitionBy("_zcell").parquet(path)
  }
}
