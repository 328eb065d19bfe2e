package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

package object queries {

  /** Registry shape the driver calls: (session, sfDir) => result frame. */
  type Q = (SparkSession, String) => DataFrame

  /** Exact sum of a double column, oracle-stable.
    *
    * Summing raw doubles is order-dependent, and Spark and DuckDB aggregate
    * in different orders. Casting each value to an exact decimal first makes
    * the sum associative (exact integer arithmetic under the hood); casting
    * the total back to double is then a single deterministic conversion.
    * Inputs in the testdata have <= 2 fractional digits, so DECIMAL(18,6)
    * loses nothing; per-row products of such values stay well inside the
    * 6-decimal rounding margin (error ~1e-13 vs boundary distance 5e-7).
    */
  def sumExact(c: Column): Column = sum(c.cast(DecimalType(18, 6))).cast("double")

  /** Exact running/window sum of a double column — same rationale. */
  def sumExactCol(c: Column): Column = c.cast(DecimalType(18, 6))

  /** Order-independent mean: exact decimal sum divided by count (one IEEE
    * division, deterministic on both engines). */
  def avgExact(c: Column): Column = sumExact(c) / count(lit(1))
}
