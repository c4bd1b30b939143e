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
    // limit -1: keep trailing empty tokens — Spark's split keeps them,
    // Java's default drops them, and the explode-pipeline equality this
    // kernel is pinned to must hold on trailing-whitespace docs too
    val toks = s.trim().toString.split("\\s+", -1)
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
  /** Big-endian pack of `k` (≤ 8) bytes starting at `i` — the window's
    * identity for the dedup set (unsigned bytes, so distinct windows
    * pack to distinct longs). */
  private def packWindow(bytes: Array[Byte], i: Int, k: Int): Long = {
    var acc = 0L
    var j = 0
    while (j < k) { acc = (acc << 8) | (bytes(i + j) & 0xffL); j += 1 }
    acc
  }

  def minMd5Shingle(s: org.apache.spark.unsafe.types.UTF8String, k: Int)
      : org.apache.spark.unsafe.types.UTF8String = {
    val md = Md5.get()
    val bytes = s.getBytes
    var ascii = true
    var i = 0
    while (ascii && i < bytes.length) { ascii = bytes(i) >= 0; i += 1 }
    // two reusable 16-byte digest buffers (cur/best, swapped on improve):
    // md.digest() allocated one array per WINDOW — ~n allocations per doc
    // for a min fold that keeps exactly one (guide §1.2 per-task work)
    var cur = new Array[Byte](16)
    var best: Array[Byte] = null
    def offer(): Unit = {
      if (best == null) { best = cur; cur = new Array[Byte](16) }
      else if (java.util.Arrays.compareUnsigned(cur, best) < 0) {
        val t = best; best = cur; cur = t
      }
    }
    if (ascii) {
      if (bytes.length < k) return null
      // duplicate windows contribute nothing to a min — hash them once
      val seen = if (k <= 8) new LongSet(bytes.length - k + 1) else null
      i = 0
      while (i <= bytes.length - k) {
        if (seen == null || seen.add(packWindow(bytes, i, k))) {
          md.reset(); md.update(bytes, i, k)
          md.digest(cur, 0, 16)
          offer()
        }
        i += 1
      }
    } else {
      val cps = s.toString.codePoints().toArray
      if (cps.length < k) return null
      val sb = new java.lang.StringBuilder(4 * k)
      val seen = new java.util.HashSet[String]()
      i = 0
      while (i <= cps.length - k) {
        sb.setLength(0)
        var j = 0
        while (j < k) { sb.appendCodePoint(cps(i + j)); j += 1 }
        val w = sb.toString
        if (seen.add(w)) {
          md.reset()
          md.update(w.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          md.digest(cur, 0, 16)
          offer()
        }
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

  // ---- md5-derived MinHash permutations (the DuckDB-replayable
  // permutation family, mirroring md5Planes above): classic affine
  // minhash lane_j = min over shingles of (a_j·h(s) + b_j) mod p with
  //   p    = 2147483647 (Mersenne 2^31-1: products stay under 2^62,
  //          exact in BIGINT arithmetic in BOTH engines),
  //   h(s) = first 8 hex chars of md5(shingle) as an unsigned int, mod p,
  //   a_j  = (first8hex(md5("a:" ++ j)) mod (p-1)) + 1,
  //   b_j  =  first8hex(md5("b:" ++ j)) mod p.
  // One md5 per shingle (the same cost class as minMd5Shingle, which is
  // benched fine at sf10) plus numPerm cheap mult-mods; DuckDB rebuilds
  // the identical (a_j, b_j) matrix from md5 and replays band →
  // candidate → verify, which is what graduates dedup_minhash /
  // dedup_clusters from rows-only to hash-oracled.

  final val MersennePrime: Long = 2147483647L

  private val permCache =
    new java.util.concurrent.ConcurrentHashMap[Integer, (Array[Long], Array[Long])]()

  /** First 4 digest bytes as an unsigned 32-bit value — equals parsing
    * the first 8 hex chars of the md5 string. */
  private def head32(d: Array[Byte]): Long =
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)

  private def md5Perms(numPerm: Int): (Array[Long], Array[Long]) =
    permCache.computeIfAbsent(numPerm, { n =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val a = new Array[Long](n)
      val b = new Array[Long](n)
      var j = 0
      while (j < n) {
        a(j) = head32(md.digest(s"a:$j".getBytes("UTF-8"))) %
          (MersennePrime - 1) + 1
        b(j) = head32(md.digest(s"b:$j".getBytes("UTF-8"))) % MersennePrime
        j += 1
      }
      (a, b)
    })

  /** numPerm md5-affine MinHash lanes over char k-gram shingles, as
    * array<int> (every lane < 2^31-1, so int lanes are LOSSLESS — the
    * verify join ships half the bytes of long lanes with none of
    * fold16's collision slack, keeping lane agreement exactly equal to
    * the oracle's). NULL when the text has no length-k window, like
    * [[minMd5Shingle]]. ASCII fast path / code-point fallback identical
    * to minMd5Shingle's (substring semantics are character-based). */
  def md5PermSketch(s: org.apache.spark.unsafe.types.UTF8String, k: Int,
      numPerm: Int): ArrayData = {
    val md = Md5.get()
    val (pa, pb) = md5Perms(numPerm)
    // Phase 1: md5-head values of the doc's DISTINCT windows (duplicates
    // are idempotent under the per-lane min — guide §1.2 per-task work:
    // natural text repeats k-grams constantly, and each repeat used to
    // pay a full md5 + numPerm affine passes for nothing).
    val bytes = s.getBytes
    var ascii = true
    var i = 0
    while (ascii && i < bytes.length) { ascii = bytes(i) >= 0; i += 1 }
    val dig = new Array[Byte](16)
    var hs: Array[Long] = null
    var nh = 0
    def append(h: Long): Unit = {
      if (hs == null) hs = new Array[Long](64)
      else if (nh == hs.length) hs = java.util.Arrays.copyOf(hs, nh * 2)
      hs(nh) = h; nh += 1
    }
    if (ascii) {
      if (bytes.length < k) return null
      val seen = if (k <= 8) new LongSet(bytes.length - k + 1) else null
      hs = new Array[Long](bytes.length - k + 1)
      i = 0
      while (i <= bytes.length - k) {
        if (seen == null || seen.add(packWindow(bytes, i, k))) {
          md.reset(); md.update(bytes, i, k)
          md.digest(dig, 0, 16)
          hs(nh) = head32(dig) % MersennePrime; nh += 1
        }
        i += 1
      }
    } else {
      val cps = s.toString.codePoints().toArray
      if (cps.length < k) return null
      val sb = new java.lang.StringBuilder(4 * k)
      val seen = new java.util.HashSet[String]()
      i = 0
      while (i <= cps.length - k) {
        sb.setLength(0)
        var j = 0
        while (j < k) { sb.appendCodePoint(cps(i + j)); j += 1 }
        val w = sb.toString
        if (seen.add(w)) {
          md.reset()
          md.update(w.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          md.digest(dig, 0, 16)
          append(head32(dig) % MersennePrime)
        }
        i += 1
      }
    }
    if (nh == 0) return null
    // Phase 2: per-lane affine min over the distinct h values. The
    // modulus is Mersenne (2^31-1), so `% p` — a hardware 64-bit divide
    // per lane per window — folds to two shift-adds and one conditional
    // subtract (x ≡ (x & p) + (x >>> 31) mod p, because 2^31 ≡ 1 mod p;
    // a*h + b < 2^62 so two folds land in [0, p]). Exactly equal to the
    // old `% MersennePrime` value, lane for lane.
    val P = MersennePrime
    val lanes = new Array[Int](numPerm)
    var j = 0
    while (j < numPerm) {
      val aj = pa(j)
      val bj = pb(j)
      var best = P // unreachable: folded values ≤ p, and p maps to 0
      var t = 0
      while (t < nh) {
        val x = aj * hs(t) + bj
        var y = (x & P) + (x >>> 31)
        y = (y & P) + (y >>> 31)
        if (y >= P) y -= P
        if (y < best) best = y
        t += 1
      }
      lanes(j) = best.toInt
      j += 1
    }
    new GenericArrayData(lanes)
  }

  /** Band keys over an int-lane sketch: band b's key is the
    * comma-joined decimal lanes of its rowsPerBand slice — a plain
    * string BOTH engines can assemble (DuckDB:
    * string_agg(lane, ',' ORDER BY j) per (doc, j // rowsPerBand)),
    * unlike the retired OPH family's mix()-folded long keys that no
    * SQL engine could reassemble. */
  def md5BandKeys(sketch: ArrayData, bands: Int, rowsPerBand: Int): ArrayData = {
    val out = new Array[org.apache.spark.unsafe.types.UTF8String](bands)
    val sb = new java.lang.StringBuilder(12 * rowsPerBand)
    var b = 0
    while (b < bands) {
      sb.setLength(0)
      var i = 0
      while (i < rowsPerBand) {
        if (i > 0) sb.append(',')
        sb.append(sketch.getInt(b * rowsPerBand + i))
        i += 1
      }
      out(b) = org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
      b += 1
    }
    new GenericArrayData(out.asInstanceOf[Array[AnyRef]])
  }

  /** Count of equal lanes between two int-lane sketches. */
  def agreementInt(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var eq = 0
    var i = 0
    while (i < n) {
      if (a.getInt(i) == b.getInt(i)) eq += 1
      i += 1
    }
    eq
  }

  /** SimHash over whitespace tokens with an md5-derived 64-bit word
    * hash (first 16 hex chars of md5(word), big-endian — DuckDB
    * reassembles the same value from two 8-hex-char halves), replacing
    * [[simhash]]'s XXH64 word hash that no SQL engine shares. Same
    * majority-bit vote; the tokenizer is pinned to what BOTH regex
    * engines mean by `\s+`-split: the explicit class `[ \t\n\f\r]`
    * (RE2's `\s` — Java's adds \x0B, which DuckDB would not split on)
    * with limit -1 (keep trailing empty tokens — DuckDB's
    * regexp_split_to_array keeps them, Java's default drops them). */
  def simhashMd5(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val md = Md5.get()
    val toks = s.trim().toString.split("[ \\t\\n\\f\\r]+", -1)
    val counts = new Array[Int](64)
    var t = 0
    while (t < toks.length) {
      md.reset()
      val d = md.digest(toks(t).getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
      var g = 0L
      var bi = 0
      while (bi < 8) { g = (g << 8) | (d(bi) & 0xffL); bi += 1 }
      var i = 0
      while (i < 64) {
        if (((g >>> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
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

/** string → array<int> md5-affine MinHash lanes (null when no k-window). */
case class Md5PermSketch(child: Expression, k: Int, numPerm: Int)
    extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true // short texts yield null

  override protected def nullSafeEval(input: Any): Any =
    SigKernels.md5PermSketch(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k, numPerm)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""${ev.value} = graft.functions.SigKernels.md5PermSketch($c, $k, $numPerm);
         |${ev.isNull} = (${ev.value} == null);""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Md5PermSketch =
    copy(child = newChild)
}

/** array<int> sketch → array<string> of comma-joined band keys. */
case class Md5BandKeys(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    SigKernels.md5BandKeys(input.asInstanceOf[ArrayData], bands, rowsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SigKernels.md5BandKeys($c, $bands, $rowsPerBand)")

  override protected def withNewChildInternal(newChild: Expression): Md5BandKeys =
    copy(child = newChild)
}

/** eq-lane count of two array<int> sketches. */
case class SketchAgreementInt(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SigKernels.agreementInt(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SigKernels.agreementInt($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SketchAgreementInt =
    copy(left = newLeft, right = newRight)
}

/** string → long md5-word-hash SimHash signature. */
case class SimHashMd5(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    SigKernels.simhashMd5(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SigKernels.simhashMd5($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHashMd5 =
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

  def hyperplane_sig(c: Column, bits: Int, seed: Long = 42L): Column =
    ColumnBridge.column(HyperplaneSig(ColumnBridge.expression(c), bits, seed))

  def hyperplane_sig_md5(c: Column, bits: Int): Column =
    ColumnBridge.column(HyperplaneSigMd5(ColumnBridge.expression(c), bits))

  def simhash_sig(c: Column): Column =
    ColumnBridge.column(SimHashSig(ColumnBridge.expression(c)))

  def min_md5_shingle(c: Column, k: Int = 5): Column =
    ColumnBridge.column(MinMd5Shingle(ColumnBridge.expression(c), k))

  def md5_perm_sketch(c: Column, k: Int, numPerm: Int): Column =
    ColumnBridge.column(Md5PermSketch(ColumnBridge.expression(c), k, numPerm))

  def md5_band_keys(c: Column, bands: Int, rowsPerBand: Int): Column =
    ColumnBridge.column(Md5BandKeys(ColumnBridge.expression(c), bands, rowsPerBand))

  def sketch_agreement_int(a: Column, b: Column): Column =
    ColumnBridge.column(SketchAgreementInt(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def simhash_md5(c: Column): Column =
    ColumnBridge.column(SimHashMd5(ColumnBridge.expression(c)))
}
