package graft.dedup

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** One-permutation-hashing MinHash (OPH, Li/Owen/Zhang 2012) with
  * rotation densification (Shrivastava 2017): hash each char k-gram ONCE
  * with a rolling polynomial, route it to lane `hash mod numPerm`, keep
  * the unsigned minimum per lane, then fill empty lanes by borrowing from
  * the next occupied lane (re-mixed so borrowed lanes still behave like
  * independent permutations).
  *
  * Versus classic minhash (numPerm hashes per shingle) this is O(len)
  * instead of O(len × numPerm) per document — and as a scalar expression
  * it runs inside the scan's whole-stage-codegen with NO shuffle: the
  * alternative shingle-explode → distinct → groupBy-Aggregator plan
  * shuffles the shingle table twice. Duplicate shingles need no dedup
  * because min() is idempotent over multisets.
  */
object MinHashKernel {
  final val Base: Long = 1000003L

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** OPH sketch of `s`'s k-grams into `numPerm` lanes. */
  def sketch(s: UTF8String, k: Int, numPerm: Int, seed: Long): ArrayData = {
    val str = s.toString
    val n = str.length
    val lanes = new Array[Long](numPerm)
    java.util.Arrays.fill(lanes, -1L) // unsigned max = empty
    if (n > 0) {
      val kk = math.min(k, n)
      // rolling polynomial over k-grams (no mod: 64-bit wraparound is fine
      // because every k-gram hash is finalized through mix())
      var bk = 1L
      var i = 0
      while (i < kk - 1) { bk *= Base; i += 1 }
      var h = 0L
      i = 0
      while (i < kk) { h = h * Base + str.charAt(i); i += 1 }
      var g = mix(h ^ seed)
      var lane = Math.floorMod(g, numPerm.toLong).toInt
      if (java.lang.Long.compareUnsigned(g, lanes(lane)) < 0) lanes(lane) = g
      i = kk
      while (i < n) {
        h = (h - str.charAt(i - kk) * bk) * Base + str.charAt(i)
        g = mix(h ^ seed)
        lane = Math.floorMod(g, numPerm.toLong).toInt
        if (java.lang.Long.compareUnsigned(g, lanes(lane)) < 0) lanes(lane) = g
        i += 1
      }
    }
    // rotation densification: empty lane j borrows the next occupied lane
    // value, re-mixed with the distance so borrowed values stay distinct
    // per lane but equal for equal borrowed-from values.
    var anyFilled = false
    var j = 0
    while (j < numPerm && !anyFilled) { anyFilled = lanes(j) != -1L; j += 1 }
    if (anyFilled) {
      j = 0
      while (j < numPerm) {
        if (lanes(j) == -1L) {
          var d = 1
          while (lanes((j + d) % numPerm) == -1L) d += 1
          lanes(j) = mix(lanes((j + d) % numPerm) + j.toLong)
        }
        j += 1
      }
    } else {
      java.util.Arrays.fill(lanes, 0L)
    }
    new GenericArrayData(lanes)
  }
}

/** Catalyst expression wrapping [[MinHashKernel.sketch]]; codegen emits a
  * static call so the sketch computes inside WholeStageCodegen. */
case class MinHashSketch(child: Expression, k: Int, numPerm: Int, seed: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    MinHashKernel.sketch(input.asInstanceOf[UTF8String], k, numPerm, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.dedup.MinHashKernel.sketch($c, $k, $numPerm, ${seed}L)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSketch =
    copy(child = newChild)
}

object MinHashSketch {
  import org.apache.spark.sql.graft.ColumnBridge

  def minhash_sketch(c: Column, k: Int = 5, numPerm: Int = 128,
      seed: Long = 42L): Column =
    ColumnBridge.column(MinHashSketch(ColumnBridge.expression(c), k, numPerm, seed))
}
