package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused tokenize → featurize → hash-bucket kernel for the linear
  * quality classifier ([[Classifier]]): one pass over the document's
  * UTF-8 bytes emits the md5 feature bucket of every token and every
  * adjacent token bigram, with NO intermediate strings.
  *
  * The composed-function form it replaces —
  * `split(trim(regexp_replace(text,"\\s+"," "))," ")` →
  * `concat(t, zip_with(...))` → `explode` →
  * `conv(substring(md5(f),1,6),16,10) % B` — allocates a token array,
  * a bigram string per pair, and a 32-char hex string per feature,
  * then PARSES the hex back to an integer. The kernel digests token
  * byte ranges of the original buffer in place (MessageDigest.update
  * over (offset,len) — zero copies for unigrams, one 1-byte separator
  * update for bigrams) and reads the bucket from the digest's first
  * 3 bytes directly. Same integers as the oracle's hex-digit Horner
  * sum: first 6 hex digits ≡ first 3 bytes, big-endian.
  *
  * Byte-level tokenization on ASCII whitespace is EXACT equivalence,
  * not an approximation: Java's `\s` matches only the six ASCII
  * whitespace chars, and multi-byte UTF-8 sequences never contain
  * bytes < 0x80, so scanning raw bytes splits identically for any
  * input. md5 is over the feature's UTF-8 bytes in both forms.
  *
  * Scale shape: the explode that follows fans out compact longs
  * instead of strings, and the expression codegens into the scan
  * stage — measured ~3× on the sf0.1 classifier query, with the
  * remaining cost the (deliberate, oracle-shared) md5 itself. */
object FeatureBucketsKernel {
  private val tl = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  /** First 3 digest bytes big-endian, mod `buckets` — ≡ the first 6
    * md5 hex digits parsed base-16 (the cross-engine oracle bucket). */
  private def b3(d: Array[Byte], buckets: Int): Long =
    ((((d(0) & 0xff) << 16) | ((d(1) & 0xff) << 8) | (d(2) & 0xff))
      % buckets).toLong

  def buckets(s: UTF8String, nBuckets: Int): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    // token spans: parallel (start, len) arrays, one scan
    var starts = new Array[Int](8)
    var lens = new Array[Int](8)
    var nTok = 0
    var i = 0
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      if (i < n) {
        val st = i
        while (i < n && !isWs(bytes(i))) i += 1
        if (nTok == starts.length) {
          starts = java.util.Arrays.copyOf(starts, nTok * 2)
          lens = java.util.Arrays.copyOf(lens, nTok * 2)
        }
        starts(nTok) = st
        lens(nTok) = i - st
        nTok += 1
      }
    }
    if (nTok == 0) return new GenericArrayData(Array.emptyLongArray)
    val md = tl.get()
    val out = new Array[Long](nTok + (nTok - 1))
    i = 0
    while (i < nTok) { // unigrams: digest the byte range in place
      md.update(bytes, starts(i), lens(i))
      out(i) = b3(md.digest(), nBuckets) // digest() resets the engine
      i += 1
    }
    i = 0
    while (i < nTok - 1) { // bigrams: tokA ++ ' ' ++ tokB, still no copy
      md.update(bytes, starts(i), lens(i))
      md.update(' '.toByte)
      md.update(bytes, starts(i + 1), lens(i + 1))
      out(nTok + i) = b3(md.digest(), nBuckets)
      i += 1
    }
    new GenericArrayData(out)
  }
}

case class FeatureBuckets(child: Expression, nBuckets: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    FeatureBucketsKernel.buckets(input.asInstanceOf[UTF8String], nBuckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.text.FeatureBucketsKernel.buckets($c, $nBuckets)")

  override protected def withNewChildInternal(newChild: Expression): FeatureBuckets =
    copy(child = newChild)
}

object FeatureBuckets {
  import org.apache.spark.sql.graft.ColumnBridge

  def feature_buckets(c: Column, nBuckets: Int): Column =
    ColumnBridge.column(FeatureBuckets(ColumnBridge.expression(c), nBuckets))
}
