package graft

/** Smoke + contract checks over the whole query registry (the driver's t1
  * shape): every query runs on sf0.001, returns rows, and every oracle key
  * refers to a registered query. */
class RegistrySpec extends SparkSpec {

  test("entry returns rows (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle keys without queries: $missing")
  }

  test("every registered query is oracled — no rows-only verification anywhere") {
    // the board has been 100% hash-checked since round 4 (sketch queries
    // emit accuracy verdicts); a new query landing without an oracle would
    // silently downgrade itself to the driver's weaker rows-only check
    val unoracled = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unoracled.isEmpty, s"queries without an oracle: $unoracled")
  }

  test("all registered queries run and return rows on sf0.001") {
    val empty = SparkEntry.queries.toSeq.sortBy(_._1).filter {
      case (_, fn) => fn(spark, sf).limit(1).count() == 0
    }.map(_._1)
    assert(empty.isEmpty, s"queries with no rows at sf0.001: $empty")
  }
}
