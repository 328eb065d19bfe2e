package graft

import org.apache.spark.sql.SparkSessionExtensions

import graft.functions.{GraftExtensions, VectorFunctions}

/** The session-extension entry point must inject cleanly and the same
  * builders must resolve through SQL (full end-to-end injection needs a
  * fresh SparkContext, which the shared test session precludes — the
  * registry path is exercised via VectorFunctions.register instead). */
class GraftExtensionsSpec extends SparkSpec {

  test("extension point injects without error") {
    new GraftExtensions().apply(new SparkSessionExtensions)
  }

  test("injected builders evaluate from SQL text") {
    VectorFunctions.register(spark)
    val row = spark.sql(
      """SELECT graft_dot(array(1D, 2D, 3D), array(4D, 5D, 6D)) AS d,
        |       graft_hsig(array_repeat(1D, 64)) AS s""".stripMargin).first()
    assert(row.getDouble(0) == 32.0)
    // signature is deterministic: recompute plane sign bits in-test
    val expected = (0 until 16).map { i =>
      val acc = (0 until 64).map(j =>
        1.0 * ((73856093L * (i + 1) * (j + 7)) % 2001L - 1000L)).sum
      if (acc >= 0) 1 << i else 0
    }.sum
    assert(row.getInt(1) == expected)
  }

  test("kernels follow the HOF on malformed input: length mismatch / null slot -> NULL") {
    VectorFunctions.register(spark)
    // the HOF forms the kernels claim identity with
    def hofDot(a: String, b: String) =
      s"aggregate(zip_with($a, $b, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
    def hofL2(a: String, b: String) =
      s"aggregate(zip_with($a, $b, (x, y) -> (x - y) * (x - y)), 0D, (acc, x) -> acc + x)"

    // dense equal-length: kernel == HOF, non-null
    val ok = spark.sql(
      s"""SELECT graft_dot(array(1D,2D,3D), array(4D,5D,6D)) AS kd,
         |       ${hofDot("array(1D,2D,3D)", "array(4D,5D,6D)")} AS hd,
         |       graft_l2(array(1D,2D,3D), array(4D,5D,6D)) AS kl,
         |       ${hofL2("array(1D,2D,3D)", "array(4D,5D,6D)")} AS hl""".stripMargin)
      .first()
    assert(ok.getDouble(0) == ok.getDouble(1) && ok.getDouble(2) == ok.getDouble(3))

    // length mismatch: HOF nulls the fold (zip_with pads with null) — the
    // kernels must agree, not silently truncate
    val mis = spark.sql(
      s"""SELECT graft_dot(array(1D,2D), array(1D)) AS kd,
         |       ${hofDot("array(1D,2D)", "array(1D)")} AS hd,
         |       graft_l2(array(1D,2D), array(1D)) AS kl,
         |       ${hofL2("array(1D,2D)", "array(1D)")} AS hl""".stripMargin).first()
    assert(mis.isNullAt(0) && mis.isNullAt(1) && mis.isNullAt(2) && mis.isNullAt(3))

    // null slot (containsNull=true input): NULL, not a garbage 0.0 read
    val slot = spark.sql(
      s"""SELECT graft_dot(array(1D, CAST(NULL AS DOUBLE)), array(1D,2D)) AS kd,
         |       ${hofDot("array(1D, CAST(NULL AS DOUBLE))", "array(1D,2D)")} AS hd,
         |       graft_l2(array(1D, CAST(NULL AS DOUBLE)), array(1D,2D)) AS kl,
         |       ${hofL2("array(1D, CAST(NULL AS DOUBLE))", "array(1D,2D)")} AS hl"""
        .stripMargin).first()
    assert(slot.isNullAt(0) && slot.isNullAt(1) && slot.isNullAt(2) && slot.isNullAt(3))
  }

  test("plane-count arg widens the signature to long and extends the family") {
    VectorFunctions.register(spark)
    val row = spark.sql(
      "SELECT graft_hsig(array_repeat(1D, 64), 60) AS s").first()
    val expected = (0 until 60).map { i =>
      val acc = (0 until 64).map(j =>
        1.0 * ((73856093L * (i + 1) * (j + 7)) % 2001L - 1000L)).sum
      if (acc >= 0) 1L << i else 0L
    }.sum
    assert(row.getLong(0) == expected)
    // the low 16 planes are the same family: default sig == low bits
    val both = spark.sql(
      """SELECT graft_hsig(array_repeat(1D, 64)) AS s16,
        |       graft_hsig(array_repeat(1D, 64), 60) & 65535 AS lo""".stripMargin).first()
    assert(both.getInt(0).toLong == both.getLong(1))
  }
}
