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
  * The salt is a round-robin row index (`monotonically_increasing_id mod
  * salts`), NOT a hash of the row: byte-identical duplicate rows of a hot
  * key — precisely the pathological case salting exists for — would all
  * hash to one salt and still pile onto one reducer. The row-index salt
  * spreads unconditionally; correctness never depends on the salt values,
  * only parallelism does. AQE's skew-join splitting handles moderate skew
  * automatically; explicit salting is for the known-pathological keys where
  * even one shuffle block overflows.
  */
object SaltedJoin {

  /** Equi-join `big ⋈ small` on `key`, salting `big` into `salts` sub-keys
    * and replicating `small` ×salts. Output = exactly the unsalted join's
    * rows (the salt columns are internal and dropped).
    *
    * NONDETERMINISM INVARIANT: `monotonically_increasing_id` depends on
    * partition layout, so a task retry or a cache-evict-then-recompute can
    * assign a row a DIFFERENT salt than an earlier attempt. This is safe
    * here because the salt never reaches the output: every salt value joins
    * against a full replica of `small`, so each big-side row produces the
    * identical joined row whatever its salt — only which reducer does the
    * work moves. The oracle (q23 ≡ unsalted join) and the distribution
    * property test pin both halves of that claim. Do NOT reuse this salt as
    * a persisted bucketing/partition key, where recompute-stability would
    * matter — derive one from row content instead. */
  def join(big: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(!big.columns.contains("__salt") && !small.columns.contains("__salt"),
      "salted join reserves the column name __salt; rename it on the inputs first")
    val bigSalted = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts)).cast("int"))
    val smallReplicated = small.withColumn("__salt",
      explode(expr(s"sequence(0, ${salts - 1})")))
    bigSalted.join(smallReplicated, Seq(key, "__salt")).drop("__salt")
  }
}
