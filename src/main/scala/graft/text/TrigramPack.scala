package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Character trigrams packed into ints (c0<<16 | c1<<8 | c2) in one pass —
  * the allocation-free alternative to
  * `explode(transform(sequence(...), i -> substring(text, i, 3)))`, which
  * materializes one UTF8String per position. Downstream aggregation then
  * hashes 4-byte ints instead of 3-char strings (~2× on the trigram
  * profile query); the 25 surviving top-k rows decode back to strings
  * with char() arithmetic. ASCII-only by construction of the corpus;
  * non-ASCII code points fold modulo 256 (documented, deterministic).
  */
object TrigramPackKernel {
  def pack(s: UTF8String): ArrayData = {
    val str = s.toString
    val n = str.length - 2
    if (n <= 0) return new GenericArrayData(Array.emptyIntArray)
    val out = new Array[Int](n)
    var c0 = str.charAt(0) & 0xff
    var c1 = str.charAt(1) & 0xff
    var i = 0
    while (i < n) {
      val c2 = str.charAt(i + 2) & 0xff
      out(i) = (c0 << 16) | (c1 << 8) | c2
      c0 = c1; c1 = c2
      i += 1
    }
    new GenericArrayData(out)
  }
}

case class TrigramPack(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    TrigramPackKernel.pack(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.TrigramPackKernel.pack($c)")

  override protected def withNewChildInternal(newChild: Expression): TrigramPack =
    copy(child = newChild)
}

object TrigramPack {
  import org.apache.spark.sql.graft.ColumnBridge

  def trigrams_packed(c: Column): Column =
    ColumnBridge.column(TrigramPack(ColumnBridge.expression(c)))
}
