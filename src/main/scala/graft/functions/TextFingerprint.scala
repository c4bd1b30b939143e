package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels for text fingerprinting — called both from the
  * interpreted path and from generated code (the codegen emits a static
  * call, the same pattern Spark's own StaticInvoke-backed functions use,
  * so the expression stays inside whole-stage codegen).
  */
object Fingerprints {
  final val Prime: Long = (1L << 61) - 1 // Mersenne prime 2^61-1
  final val Base: Long = 1000003L

  /** Polynomial rolling hash over k-grams; the document fingerprint is the
    * MINIMUM k-gram hash (winnowing-style content sampling: stable under
    * edits far from the minimizing k-gram). O(n), no allocation. */
  def minKgramHash(s: UTF8String, k: Int): Long = {
    val str = s.toString
    val n = str.length
    if (n == 0) return 0L
    if (n <= k) return fullHash(str)
    // precompute base^(k-1) mod p
    var bk = 1L
    var i = 0
    while (i < k - 1) { bk = mulMod(bk, Base); i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = addMod(mulMod(h, Base), str.charAt(i).toLong); i += 1 }
    var min = h
    i = k
    while (i < n) {
      // slide: remove str(i-k), add str(i)
      h = subMod(h, mulMod(str.charAt(i - k).toLong, bk))
      h = addMod(mulMod(h, Base), str.charAt(i).toLong)
      if (h < min) min = h
      i += 1
    }
    min
  }

  def fullHash(str: String): Long = {
    var h = 0L
    var i = 0
    while (i < str.length) { h = addMod(mulMod(h, Base), str.charAt(i).toLong); i += 1 }
    h
  }

  // modular arithmetic on 2^61-1 without overflow (inputs < 2^61)
  private def mulMod(a: Long, b: Long): Long = {
    // 128-bit multiply via Math.multiplyHigh (Java 9+)
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    // (hi:lo) mod 2^61-1: fold 2^64 = 8 * 2^61 ≡ 8 (mod p) pieces
    val lo61 = lo & Prime
    val rest = (lo >>> 61) | (hi << 3)
    var s = lo61 + rest
    if (s >= Prime) s -= Prime
    s
  }
  private def addMod(a: Long, b: Long): Long = {
    var s = a + b
    if (s >= Prime) s -= Prime
    s
  }
  private def subMod(a: Long, b: Long): Long = {
    var s = a - b
    if (s < 0) s += Prime
    s
  }
}

/** Catalyst expression: winnowing-style min-k-gram fingerprint of a string
  * column. Codegen-enabled (emits a static call into [[Fingerprints]] so
  * the operator stays inside WholeStageCodegen — no UDF serialization, no
  * row boxing).
  */
case class TextFingerprint(child: Expression, k: Int = 8)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    Fingerprints.minKgramHash(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Fingerprints.minKgramHash($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): TextFingerprint =
    copy(child = newChild)
}

object TextFingerprint {
  import org.apache.spark.sql.graft.ColumnBridge

  /** Column API: `text_fingerprint($"text", 8)`. */
  def text_fingerprint(c: Column, k: Int = 8): Column =
    ColumnBridge.column(TextFingerprint(ColumnBridge.expression(c), k))
}
