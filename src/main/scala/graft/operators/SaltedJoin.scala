package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-resistant equi-join (SURVEY.md §4 scale notes).
  *
  * A shuffled equi-join sends every row of a key to one reducer; a hot key
  * (a handful of customers owning 1% of a 100 TB fact table) turns into one
  * straggler task. Salting splits each key into `salts` sub-keys: the big
  * (skewed) side gets a per-row salt, the small side is replicated once per
  * salt value, and the join key becomes (key, salt) — hot keys now spread
  * over `salts` reducers at the cost of replicating the other side ×salts.
  *
  * The salt value is derived from a hash of the big side's whole row, which
  * makes it deterministic per row but uniformly spread; correctness never
  * depends on the salt distribution, only parallelism does. AQE's skew-join
  * splitting handles moderate skew automatically; explicit salting is for
  * the known-pathological keys where even one shuffle block overflows.
  */
object SaltedJoin {

  /** Equi-join `big ⋈ small` on `key`, salting `big` into `salts` sub-keys
    * and replicating `small` ×salts. Output = exactly the unsalted join's
    * rows (the salt columns are internal and dropped). */
  def join(big: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val bigSalted = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col).toIndexedSeq: _*), lit(salts)).cast("int"))
    val smallReplicated = small.withColumn("__salt",
      explode(expr(s"sequence(0, ${salts - 1})")))
    bigSalted.join(smallReplicated, Seq(key, "__salt")).drop("__salt")
  }
}
