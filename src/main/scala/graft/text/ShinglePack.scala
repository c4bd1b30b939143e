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

  /** [[pack]] with per-document deduplication folded into the kernel,
    * emitted in ASCENDING order: the consumers of the packed-shingle
    * table all start from the DISTINCT (doc_id, shingle) relation, and
    * producing it in-scan removes the full-shingle-volume
    * distinct/collect_set exchanges from their plans (optimization
    * guide §2.4 "remove shuffles outright"). Exactly the set of values
    * [[pack]] emits — same packing, duplicates dropped; the sort makes
    * the per-doc array canonical and lets pair verification count
    * intersections by linear merge ([[SortedIntersectCountKernel]])
    * instead of a boxed hash set per pair. */
  def packDistinct(s: UTF8String): ArrayData = {
    val str = s.toString
    val n = str.length - 4
    if (n <= 0) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](n)
    val seen = new graft.functions.LongSet(n)
    var m = 0
    var acc = ((str.charAt(0) & 0xffL) << 24) | ((str.charAt(1) & 0xffL) << 16) |
      ((str.charAt(2) & 0xffL) << 8) | (str.charAt(3) & 0xffL)
    var i = 0
    while (i < n) {
      acc = ((acc & 0xffffffffL) << 8) | (str.charAt(i + 4) & 0xffL)
      if (seen.add(acc)) { out(m) = acc; m += 1 }
      i += 1
    }
    val trimmed = if (m == n) out else java.util.Arrays.copyOf(out, m)
    java.util.Arrays.sort(trimmed) // 40-bit packs: signed sort ≡ unsigned
    new GenericArrayData(trimmed)
  }
}

/** Count of common elements between two ASCENDING long arrays — the
  * zero-allocation merge twin of `size(array_intersect(a, b))` on
  * arrays that are already distinct and sorted ([[ShinglePackKernel
  * .packDistinct]] output): ArrayIntersect builds a boxed hash set per
  * ROW, which was the dominant stage of containment verification
  * (guide §1.2 per-task work). Inputs must be sorted distinct — the
  * producing kernel guarantees it. */
object SortedIntersectCountKernel {
  def count(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}

case class SortedIntersectCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectCountKernel.count(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.text.SortedIntersectCountKernel.count($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
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

case class ShinglePackDistinct(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    ShinglePackKernel.packDistinct(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.ShinglePackKernel.packDistinct($c)")

  override protected def withNewChildInternal(newChild: Expression): ShinglePackDistinct =
    copy(child = newChild)
}

object ShinglePack {
  import org.apache.spark.sql.graft.ColumnBridge

  def shingles_packed(c: Column): Column =
    ColumnBridge.column(ShinglePack(ColumnBridge.expression(c)))

  def shingles_packed_distinct(c: Column): Column =
    ColumnBridge.column(ShinglePackDistinct(ColumnBridge.expression(c)))

  def sorted_intersect_count(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
