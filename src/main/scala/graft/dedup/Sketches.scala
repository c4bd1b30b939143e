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
    val intArray: Encoder[Array[Int]] = ExpressionEncoder[Array[Int]]()
  }
}
