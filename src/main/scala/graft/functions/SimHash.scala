package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.Locale

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whole-document 64-bit SimHash as ONE per-row expression: lowercase +
  * SQL trim (spaces only) + whitespace-split, distinct tokens, md5 per
  * token, majority vote per bit, emitted as the 16-hex-char signature.
  *
  * Byte-identical to the dataflow formulation
  * `explode(array_distinct(split(trim(lower(text)), '\s+')))` → `md5(tok)`
  * → 64 bit-sums → majority — for ALL inputs, non-space whitespace at the
  * edges included (SimHashSpec pins the equivalence) — but with NO row
  * explosion and NO shuffle:
  * the signature is computed map-side in a single pass over each document,
  * so a SimHash pipeline's first shuffle is the (band, value) bucket join
  * itself. The token loop runs inside one eval call (CodegenFallback is
  * irrelevant here: the per-row work IS the loop, there is no per-element
  * virtual dispatch to save).
  */
case class SimHashExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash expects string, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    // same pipeline as split(trim(lower(text)), '\s+') for EVERY input:
    // SQL trim strips only ' ' (Java String.trim would also eat tabs/
    // newlines), and the limit=-1 split keeps trailing empty tokens the way
    // Spark's split does — so text edged with tabs/newlines hashes the same
    // "" token here as in the dataflow formulation and the DuckDB oracle,
    // instead of silently diverging on non-space whitespace.
    val lowered = text.toLowerCase(Locale.ROOT)
    var st = 0
    var en = lowered.length
    while (st < en && lowered.charAt(st) == ' ') st += 1
    while (en > st && lowered.charAt(en - 1) == ' ') en -= 1
    val toks = lowered.substring(st, en).split("\\s+", -1)
    val seen = new java.util.HashSet[String]()
    val md = SimHashExpr.digest.get()
    val sums = new Array[Int](64)
    var n = 0
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (seen.add(t)) {
        md.reset()
        val d = md.digest(t.getBytes(StandardCharsets.UTF_8))
        n += 1
        var bit = 0
        while (bit < 64) {
          val nibble =
            if ((bit & 4) == 0) (d(bit >> 3) >> 4) & 0xf else d(bit >> 3) & 0xf
          sums(bit) += (nibble >> (3 - (bit & 3))) & 1
          bit += 1
        }
      }
      i += 1
    }
    val out = new Array[Char](16)
    var ni = 0
    while (ni < 16) {
      var v = 0
      var k = 0
      while (k < 4) {
        if (2 * sums(4 * ni + k) > n) v |= 8 >> k
        k += 1
      }
      out(ni) = "0123456789abcdef".charAt(v)
      ni += 1
    }
    UTF8String.fromString(new String(out))
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else nullSafeEval(v)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashExpr {
  /** MessageDigest is stateful — one instance per task thread. */
  private val digest: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))
}
