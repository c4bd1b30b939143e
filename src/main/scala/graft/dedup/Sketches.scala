package graft.dedup

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Sketch aggregators for near-duplicate detection — typed
  * `Aggregator`s (SURVEY.md §7.4): each document's shingle/token stream
  * folds into a fixed-size buffer on the map side, so the shuffle moves
  * one sketch per document instead of the shingle explosion. At 100 TB
  * this is the difference between shuffling ~100 B/doc and ~10 KB/doc.
  */
object Sketches {

  /** Deterministic multiply-shift hash family: h_i(x) = (a_i·x + b_i)
    * with odd a_i, compared unsigned — a standard 2-universal family for
    * MinHash; no modular reduction needed on 64-bit lanes. */
  final class HashFamily(numPerm: Int, seed: Long) extends Serializable {
    private def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val a: Array[Long] = Array.tabulate(numPerm)(i => mix(seed + 2L * i) | 1L)
    val b: Array[Long] = Array.tabulate(numPerm)(i => mix(seed + 2L * i + 1))
  }

  /** MinHash sketch: elementwise-min of `numPerm` hashed lanes. */
  final class MinHashAgg(numPerm: Int, seed: Long = 42L)
      extends Aggregator[Long, Array[Long], Array[Long]] {
    private val fam = new HashFamily(numPerm, seed)

    def zero: Array[Long] = Array.fill(numPerm)(-1L) // unsigned max

    def reduce(buf: Array[Long], shingleHash: Long): Array[Long] = {
      var i = 0
      while (i < numPerm) {
        val h = fam.a(i) * shingleHash + fam.b(i)
        if (java.lang.Long.compareUnsigned(h, buf(i)) < 0) buf(i) = h
        i += 1
      }
      buf
    }

    def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < numPerm) {
        if (java.lang.Long.compareUnsigned(y(i), x(i)) < 0) x(i) = y(i)
        i += 1
      }
      x
    }

    def finish(buf: Array[Long]): Array[Long] = buf
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoders.longArray
    def outputEncoder: Encoder[Array[Long]] = ExpressionEncoders.longArray
  }

  /** SimHash sketch: 64 signed bit-counters folded over token hashes;
    * finish() takes the sign bit per lane. */
  final class SimHashAgg extends Aggregator[Long, Array[Int], Long] {
    def zero: Array[Int] = new Array[Int](64)

    def reduce(buf: Array[Int], tokenHash: Long): Array[Int] = {
      var i = 0
      while (i < 64) {
        if (((tokenHash >>> i) & 1L) == 1L) buf(i) += 1 else buf(i) -= 1
        i += 1
      }
      buf
    }

    def merge(x: Array[Int], y: Array[Int]): Array[Int] = {
      var i = 0
      while (i < 64) { x(i) += y(i); i += 1 }
      x
    }

    def finish(buf: Array[Int]): Long = {
      var sig = 0L
      var i = 0
      while (i < 64) { if (buf(i) > 0) sig |= (1L << i); i += 1 }
      sig
    }

    def bufferEncoder: Encoder[Array[Int]] = ExpressionEncoders.intArray
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  private object ExpressionEncoders {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    val longArray: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    val intArray: Encoder[Array[Int]] = ExpressionEncoder[Array[Int]]()
  }
}
