package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Character 5-grams packed into longs (c0<<32 | c1<<24 | … | c4) in one
  * pass — the [[TrigramPackKernel]] pattern at shingle width. Because the
  * width is FIXED, unsigned-byte packing preserves lexicographic order:
  * `packed(a) < packed(b)  ⇔  a < b` under byte-wise string comparison,
  * so a MIN over packed longs chooses the same shingle as a MIN over the
  * raw strings — which is what lets a DuckDB oracle replay anchor
  * selection on raw 5-gram strings while the engine never materializes
  * one (the md5-per-shingle formulation this replaces paid ~50M digest +
  * hex allocations at the 10× bench scale). ASCII-only by construction
  * of the corpus; non-ASCII code points fold modulo 256 (documented,
  * deterministic — the [[TrigramPackKernel]] contract). */
object ShinglePackKernel {
  def pack(s: UTF8String): ArrayData = {
    val str = s.toString
    val n = str.length - 4
    if (n <= 0) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](n)
    var acc = ((str.charAt(0) & 0xffL) << 24) | ((str.charAt(1) & 0xffL) << 16) |
      ((str.charAt(2) & 0xffL) << 8) | (str.charAt(3) & 0xffL)
    var i = 0
    while (i < n) {
      acc = ((acc & 0xffffffffL) << 8) | (str.charAt(i + 4) & 0xffL)
      out(i) = acc
      i += 1
    }
    new GenericArrayData(out)
  }
}

case class ShinglePack(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    ShinglePackKernel.pack(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.ShinglePackKernel.pack($c)")

  override protected def withNewChildInternal(newChild: Expression): ShinglePack =
    copy(child = newChild)
}

object ShinglePack {
  import org.apache.spark.sql.graft.ColumnBridge

  def shingles_packed(c: Column): Column =
    ColumnBridge.column(ShinglePack(ColumnBridge.expression(c)))
}
