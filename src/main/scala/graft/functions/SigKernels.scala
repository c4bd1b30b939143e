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

  // md5-derived ±1 hyperplanes — the one plane family BOTH engines can
  // derive independently (DuckDB recomputes w(j,i) = ±1 from
  // substr(md5(j || ':' || i),1,1) <= '7', i.e. the top bit of the
  // digest's first byte), which is what makes the LSH signature — and
  // therefore knn_lsh — hash-oracle-checkable instead of rows-only.
  // The matrix is tiny (bits × dims) and cached per shape.
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Double]]()

  private def md5Planes(bits: Int, dims: Int): Array[Double] =
    planeCache.computeIfAbsent((bits, dims), { key =>
      val (b, d) = key
      val md = java.security.MessageDigest.getInstance("MD5")
      val w = new Array[Double](b * d)
      var j = 0
      while (j < b) {
        var i = 0
        while (i < d) {
          val dig = md.digest(s"$j:$i".getBytes("UTF-8"))
          w(j * d + i) = if ((dig(0) & 0x80) == 0) 1.0 else -1.0
          i += 1
        }
        j += 1
      }
      w
    })

  /** Hyperplane signature over the md5-derived plane matrix: bit j is
    * the sign of v · w_j with w_j's lanes summed in ascending index
    * order (the same left-to-right IEEE fold DuckDB's
    * list_inner_product performs — bit-identical projections). */
  def hyperplaneSigMd5(v: ArrayData, bits: Int): Long = {
    val n = v.numElements()
    val w = md5Planes(bits, n)
    var sig = 0L
    var j = 0
    while (j < bits) {
      var proj = 0.0
      var i = 0
      val base = j * n
      while (i < n) {
        proj += v.getDouble(i) * w(base + i)
        i += 1
      }
      if (proj > 0) sig |= (1L << j)
      j += 1
    }
    sig
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

  private val Md5 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))
  private val HexDigits = "0123456789abcdef".toCharArray

  /** min(md5(substring(text, i, k))) over every length-k character
    * window, hex-encoded like Spark's and DuckDB's `md5()` — the b=1
    * MinHash blocking key both engines can compute. NULL when the text
    * has fewer than k characters, matching the explode pipeline's
    * "no length-k shingle" case. One pass: tracks the minimum DIGEST
    * under unsigned byte comparison (hex encoding is order-preserving,
    * so min digest ⇔ min hex string) and hex-encodes once per document
    * instead of once per shingle. ASCII texts slide a window over the
    * UTF-8 bytes directly; otherwise windows are rebuilt over code
    * points (Spark's substring counts characters, and a code point's
    * UTF-8 bytes are position-independent, so byte windows of the
    * code-point windows match md5-of-substring exactly). */
  def minMd5Shingle(s: org.apache.spark.unsafe.types.UTF8String, k: Int)
      : org.apache.spark.unsafe.types.UTF8String = {
    val md = Md5.get()
    val bytes = s.getBytes
    var ascii = true
    var i = 0
    while (ascii && i < bytes.length) { ascii = bytes(i) >= 0; i += 1 }
    var best: Array[Byte] = null
    def offer(d: Array[Byte]): Unit =
      if (best == null || java.util.Arrays.compareUnsigned(d, best) < 0) best = d
    if (ascii) {
      if (bytes.length < k) return null
      i = 0
      while (i <= bytes.length - k) {
        md.reset(); md.update(bytes, i, k)
        offer(md.digest())
        i += 1
      }
    } else {
      val cps = s.toString.codePoints().toArray
      if (cps.length < k) return null
      val sb = new java.lang.StringBuilder(4 * k)
      i = 0
      while (i <= cps.length - k) {
        sb.setLength(0)
        var j = 0
        while (j < k) { sb.appendCodePoint(cps(i + j)); j += 1 }
        md.reset()
        offer(md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
        i += 1
      }
    }
    val hex = new Array[Char](32)
    i = 0
    while (i < 16) {
      hex(2 * i) = HexDigits((best(i) >> 4) & 0xf)
      hex(2 * i + 1) = HexDigits(best(i) & 0xf)
      i += 1
    }
    org.apache.spark.unsafe.types.UTF8String.fromString(new String(hex))
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

/** array<double> vector → long hyperplane signature over the
  * md5-derived plane matrix (the DuckDB-replayable plane family). */
case class HyperplaneSigMd5(child: Expression, bits: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    SigKernels.hyperplaneSigMd5(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SigKernels.hyperplaneSigMd5($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSigMd5 =
    copy(child = newChild)
}

/** string → hex min-md5 blocking key (b=1 MinHash over char k-grams). */
case class MinMd5Shingle(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def nullIntolerant: Boolean = true
  // returns null for texts shorter than k — not "null in, null out" alone
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    SigKernels.minMd5Shingle(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""${ev.value} = graft.functions.SigKernels.minMd5Shingle($c, $k);
         |${ev.isNull} = (${ev.value} == null);""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinMd5Shingle =
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

  def hyperplane_sig_md5(c: Column, bits: Int): Column =
    ColumnBridge.column(HyperplaneSigMd5(ColumnBridge.expression(c), bits))

  def simhash_sig(c: Column): Column =
    ColumnBridge.column(SimHashSig(ColumnBridge.expression(c)))

  def min_md5_shingle(c: Column, k: Int = 5): Column =
    ColumnBridge.column(MinMd5Shingle(ColumnBridge.expression(c), k))
}
