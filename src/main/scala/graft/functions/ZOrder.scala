package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Multi-column Z-order (Morton) clustering key — SURVEY.md §7.4: the
  * reference Z-orders one column (timestamp_ms), where a plain sort
  * suffices; for 2–4 columns the interleaved-bits key preserves locality
  * in every dimension, so parquet row-group min/max stats can skip files
  * for predicates on ANY clustered column, not just the sort-leading one.
  *
  * Usage: normalize each column to 16-bit rank space (done by
  * [[ZOrder.zorderKey]] from per-column min/max), then interleave.
  */
object ZOrderKernel {
  /** Spread the low 16 bits of `v` so consecutive bits land `n` apart. */
  private def spread(v: Int, n: Int): Long = {
    var out = 0L
    var i = 0
    while (i < 16) {
      out |= ((v >>> i) & 1L) << (i * n)
      i += 1
    }
    out
  }
  def interleave2(a: Int, b: Int): Long = spread(a, 2) << 1 | spread(b, 2)
  def interleave3(a: Int, b: Int, c: Int): Long =
    spread(a, 3) << 2 | spread(b, 3) << 1 | spread(c, 3)
  def interleave4(a: Int, b: Int, c: Int, d: Int): Long =
    spread(a, 4) << 3 | spread(b, 4) << 2 | spread(c, 4) << 1 | spread(d, 4)
}

/** Catalyst expression interleaving 2–4 pre-normalized 16-bit lanes into
  * one long Morton key; codegen emits a static kernel call. */
case class InterleaveBits(children: Seq[Expression]) extends Expression {
  require(children.size >= 2 && children.size <= 4,
    s"InterleaveBits supports 2-4 columns, got ${children.size}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def foldable: Boolean = children.forall(_.foldable)

  private def kernel = s"interleave${children.size}"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vs = children.map { c =>
      val v = c.eval(input)
      if (v == null) 0 else v.asInstanceOf[Int]
    }
    vs match {
      case Seq(a, b) => ZOrderKernel.interleave2(a, b)
      case Seq(a, b, c) => ZOrderKernel.interleave3(a, b, c)
      case Seq(a, b, c, d) => ZOrderKernel.interleave4(a, b, c, d)
    }
  }

  import org.apache.spark.sql.catalyst.expressions.codegen.Block._
  import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val args = evals.map(e => s"(${e.isNull} ? 0 : ${e.value})").mkString(", ")
    val childCode = evals.map(_.code).reduce(_ + _)
    ev.copy(
      code = code"""
        $childCode
        final long ${ev.value} = graft.functions.ZOrderKernel.$kernel($args);""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): InterleaveBits =
    copy(children = newChildren)
}

object ZOrder {
  import org.apache.spark.sql.graft.ColumnBridge

  def interleave(cols: Seq[Column]): Column =
    ColumnBridge.column(InterleaveBits(cols.map(ColumnBridge.expression)))

  /** Build a Morton key for `cols` of `df`: two-pass — (1) one tiny agg
    * job collects per-column min/max, (2) each value normalizes to
    * 16-bit rank space and interleaves. Null/constant columns map to 0. */
  def zorderKey(df: DataFrame, cols: Seq[String]): Column = {
    val aggs = cols.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"min_$c"),
      max(col(c).cast("double")).as(s"max_$c")))
    val stats = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val lanes = cols.map { c =>
      val lo = stats.getAs[Double](s"min_$c")
      val hi = stats.getAs[Double](s"max_$c")
      if (hi <= lo) lit(0)
      else least(greatest(
        ((col(c).cast("double") - lit(lo)) / lit(hi - lo) * lit(65535.0)).cast("int"),
        lit(0)), lit(65535))
    }
    interleave(lanes)
  }
}
