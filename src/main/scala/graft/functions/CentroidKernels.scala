package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Centroid-assignment kernels for the IVF / PQ index-build paths.
  *
  * The declarative formulation — `corpus CROSS JOIN broadcast(centroids)`
  * then a `groupBy(vec_id).agg(max_by/min_by)` — MATERIALIZES n·cells
  * rows through an exchange before reducing them back to n: at the
  * second bench decade (200k vectors × 316 cells) that is 63M exploded
  * rows per assignment pass, and the whole query scales n^1.5 in ROWS.
  * The FLOPs are unavoidable (exhaustive nearest-centroid assignment is
  * n·cells·dim by definition) but the row amplification is not: these
  * kernels run the argmax/argmin per INPUT row over a
  * driver-materialized centroid matrix riding the plan as one flat
  * array literal, so assignment is a codegen'd map — n rows in, n rows
  * out, no exchange. Measured on knn_ivf at ×100 of the bench dir:
  * 26 s → ~7 s; knn_pq 58 s → ~8 s.
  *
  * Float semantics mirror the joined formulation EXACTLY (same
  * forward-index dot loops, same operation order, same tie-breaks), so
  * the DuckDB oracles — which replay the joined form — still match
  * bit-for-bit:
  *  - cell score = dot(v, c)/(n·cn), ties prefer the HIGHER cell
  *    (`max_by(cell, struct(cscore, cell))` semantics);
  *  - PQ distance = dot(s,s) − 2·dot(s,c) + dot(c,c), ties prefer the
  *    LOWER code (`min_by(code, struct(dist, code))` semantics).
  */
object CentroidKernels {
  /** argmax over `cells` centroids of dot(v, C[j])/(n·cn[j]); C rides
    * flattened row-major (cell-major), ties → higher j. */
  def nearestCell(v: ArrayData, n: Double, flat: ArrayData,
      cns: ArrayData, dim: Int): Int = {
    val cells = cns.numElements()
    var best = Double.NegativeInfinity
    var bestJ = 0
    var j = 0
    while (j < cells) {
      val off = j * dim
      var s = 0.0
      var i = 0
      while (i < dim) { s += v.getDouble(i) * flat.getDouble(off + i); i += 1 }
      val score = s / (n * cns.getDouble(j))
      if (score >= best) { best = score; bestJ = j } // ties → higher cell
      j += 1
    }
    bestJ
  }

  /** Top-`k` centroid indices by (ROUNDED-to-6 cosine desc, index asc)
    * — the [[nearestCell]] loop generalized to a k-selection, used by
    * the kNN label-propagation classifier where the "centroids" are a
    * small curated seed set. Scores are rounded BEFORE comparison with
    * the exact `round(x, 6)` semantics (BigDecimal HALF_UP on the
    * double's shortest decimal form) so the ranking matches the DuckDB
    * oracle's `ROUND(cos, 6)` ordering bit-for-bit — the same
    * tie-robustness contract every knn_* query pins. Ascending j with
    * a strict `>` displacement keeps equal-score ties on the LOWER
    * index, mirroring `ORDER BY cos DESC, seed_id`. */
  def topKCells(v: ArrayData, n: Double, flat: ArrayData,
      cns: ArrayData, dim: Int, k: Int): ArrayData = {
    val cells = cns.numElements()
    val kk = math.min(k, cells)
    val bestS = new Array[Double](kk)
    val bestJ = new Array[Int](kk)
    var filled = 0
    var j = 0
    while (j < cells) {
      val off = j * dim
      var s = 0.0
      var i = 0
      while (i < dim) { s += v.getDouble(i) * flat.getDouble(off + i); i += 1 }
      val score = java.math.BigDecimal.valueOf(s / (n * cns.getDouble(j)))
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      // insertion into the sorted top-k; later j never displaces an
      // equal-score earlier j (strict >)
      if (filled < kk || score > bestS(kk - 1)) {
        var p = math.min(filled, kk - 1)
        while (p > 0 && bestS(p - 1) < score) {
          bestS(p) = bestS(p - 1); bestJ(p) = bestJ(p - 1); p -= 1
        }
        bestS(p) = score; bestJ(p) = j
        if (filled < kk) filled += 1
      }
      j += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(bestJ, filled))
  }

  /** All PqM codes of one vector in one pass: for each subspace m,
    * argmin over `codes` codebook entries of the l2 distance between
    * v[m·subDim..] and the entry; codebook flat layout
    * [m][code][d] → (m·codes + code)·subDim + d; ties → lower code. */
  def pqEncode(v: ArrayData, flat: ArrayData, pqM: Int, subDim: Int,
      codes: Int): ArrayData = {
    val out = new Array[Int](pqM)
    var m = 0
    while (m < pqM) {
      val voff = m * subDim
      // dot(sub, sub) once per subspace
      var ss = 0.0
      var i = 0
      while (i < subDim) {
        val x = v.getDouble(voff + i); ss += x * x; i += 1
      }
      var best = Double.PositiveInfinity
      var bestCode = 0
      var code = 0
      while (code < codes) {
        val coff = (m * codes + code) * subDim
        var sc = 0.0
        var cc = 0.0
        i = 0
        while (i < subDim) {
          val c = flat.getDouble(coff + i)
          sc += v.getDouble(voff + i) * c
          cc += c * c
          i += 1
        }
        val d = ss - 2.0 * sc + cc
        if (d < best) { best = d; bestCode = code } // ties → lower code
        code += 1
      }
      out(m) = bestCode
      m += 1
    }
    new GenericArrayData(out)
  }
}

case class NearestCell(v: Expression, n: Expression, flat: Expression,
    cns: Expression, dim: Int) extends QuaternaryExpression {
  override def first: Expression = v
  override def second: Expression = n
  override def third: Expression = flat
  override def fourth: Expression = cns
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    CentroidKernels.nearestCell(a.asInstanceOf[ArrayData],
      b.asInstanceOf[Double], c.asInstanceOf[ArrayData],
      d.asInstanceOf[ArrayData], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c, d) =>
      s"graft.functions.CentroidKernels.nearestCell($a, $b, $c, $d, $dim)")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression,
      newFourth: Expression): NearestCell =
    copy(v = newFirst, n = newSecond, flat = newThird, cns = newFourth)
}

case class TopKCells(v: Expression, n: Expression, flat: Expression,
    cns: Expression, dim: Int, k: Int) extends QuaternaryExpression {
  override def first: Expression = v
  override def second: Expression = n
  override def third: Expression = flat
  override def fourth: Expression = cns
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    CentroidKernels.topKCells(a.asInstanceOf[ArrayData],
      b.asInstanceOf[Double], c.asInstanceOf[ArrayData],
      d.asInstanceOf[ArrayData], dim, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c, d) =>
      s"graft.functions.CentroidKernels.topKCells($a, $b, $c, $d, $dim, $k)")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression,
      newFourth: Expression): TopKCells =
    copy(v = newFirst, n = newSecond, flat = newThird, cns = newFourth)
}

case class PqEncode(left: Expression, right: Expression, pqM: Int,
    subDim: Int, codes: Int) extends BinaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CentroidKernels.pqEncode(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData], pqM, subDim, codes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.CentroidKernels.pqEncode($a, $b, $pqM, $subDim, $codes)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncode =
    copy(left = newLeft, right = newRight)
}

object CentroidKernelColumns {
  import org.apache.spark.sql.graft.ColumnBridge

  def nearest_cell(v: Column, n: Column, flat: Column, cns: Column,
      dim: Int): Column =
    ColumnBridge.column(NearestCell(ColumnBridge.expression(v),
      ColumnBridge.expression(n), ColumnBridge.expression(flat),
      ColumnBridge.expression(cns), dim))

  def top_k_cells(v: Column, n: Column, flat: Column, cns: Column,
      dim: Int, k: Int): Column =
    ColumnBridge.column(TopKCells(ColumnBridge.expression(v),
      ColumnBridge.expression(n), ColumnBridge.expression(flat),
      ColumnBridge.expression(cns), dim, k))

  def pq_encode(v: Column, flatCodebook: Column, pqM: Int, subDim: Int,
      codes: Int): Column =
    ColumnBridge.column(PqEncode(ColumnBridge.expression(v),
      ColumnBridge.expression(flatCodebook), pqM, subDim, codes))
}
