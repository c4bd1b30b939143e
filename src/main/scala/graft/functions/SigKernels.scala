package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Signature kernels for the LSH paths, as codegen'd unary expressions —
  * replacing per-element interpreted lambdas (transform/slice/concat_ws/
  * zip_with chains) with single-pass static loops.
  */
object SigKernels {
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Fold a MinHash sketch into `bands` band signatures (hash of each
    * rowsPerBand-lane slice, band index mixed in). */
  def bandSignatures(sketch: ArrayData, bands: Int, rowsPerBand: Int): ArrayData = {
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = mix(b.toLong)
      var i = 0
      while (i < rowsPerBand) {
        h = mix(h ^ sketch.getLong(b * rowsPerBand + i))
        i += 1
      }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }

  /** Random-hyperplane signature of a double vector: bit j is the sign of
    * the projection onto a ±1 plane derived from mix(seed, j, lane). */
  def hyperplaneSig(v: ArrayData, bits: Int, seed: Long): Long = {
    var sig = 0L
    var j = 0
    while (j < bits) {
      var proj = 0.0
      var i = 0
      val base = mix(seed ^ (j.toLong << 32))
      val n = v.numElements()
      while (i < n) {
        val w = if ((mix(base + i) & 1L) == 0L) 1.0 else -1.0
        proj += v.getDouble(i) * w
        i += 1
      }
      if (proj > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  /** SimHash of whitespace tokens in one pass — bit-identical to the
    * explode → xxhash64(word) → SimHashAgg pipeline (same trim/split
    * tokenization, same XXH64 seed-42 word hash), but computed inside the
    * scan with no explode and no shuffle of token hashes. */
  def simhash(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    import org.apache.spark.unsafe.types.UTF8String
    val toks = s.trim().toString.split("\\s+")
    val counts = new Array[Int](64)
    var t = 0
    while (t < toks.length) {
      val u = UTF8String.fromString(toks(t))
      val h = XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
        i += 1
      }
      t += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) { if (counts(i) > 0) sig |= (1L << i); i += 1 }
    sig
  }
}

/** array<bigint> sketch → array<bigint> of band signatures. */
case class BandSignatures(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    SigKernels.bandSignatures(input.asInstanceOf[ArrayData], bands, rowsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SigKernels.bandSignatures($c, $bands, $rowsPerBand)")

  override protected def withNewChildInternal(newChild: Expression): BandSignatures =
    copy(child = newChild)
}

/** array<double> vector → long hyperplane signature. */
case class HyperplaneSig(child: Expression, bits: Int, seed: Long)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    SigKernels.hyperplaneSig(input.asInstanceOf[ArrayData], bits, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SigKernels.hyperplaneSig($c, $bits, ${seed}L)")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
}

/** string → long SimHash signature. */
case class SimHashSig(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    SigKernels.simhash(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SigKernels.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
}

object SigKernelColumns {
  import org.apache.spark.sql.graft.ColumnBridge

  def band_signatures(c: Column, bands: Int, rowsPerBand: Int): Column =
    ColumnBridge.column(BandSignatures(ColumnBridge.expression(c), bands, rowsPerBand))

  def hyperplane_sig(c: Column, bits: Int, seed: Long = 42L): Column =
    ColumnBridge.column(HyperplaneSig(ColumnBridge.expression(c), bits, seed))

  def simhash_sig(c: Column): Column =
    ColumnBridge.column(SimHashSig(ColumnBridge.expression(c)))
}
