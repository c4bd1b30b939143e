package graft.table

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Predicate}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.unsafe.types.UTF8String

/** Deletion vectors applied INSIDE the scan — a codegen'd predicate that
  * tests each row's `(_metadata.file_path, _metadata.row_index)` against
  * the file's broadcast RLE runs, instead of expanding the vector to a
  * (path, pos) frame and anti-joining (the pre-r6 plan, which fell back
  * to shuffling the entire vectored scan once the vector outgrew the
  * broadcast-join cap). The runs stay run-length-encoded end to end:
  * a billion-row vector of k contiguous runs broadcasts 16k bytes, each
  * row pays one binary search over its own file's runs (amortized to a
  * cached-array probe since rows arrive grouped by file), and the scan
  * plan keeps zero joins — Delta's scan-embedded DV bitmap, re-expressed
  * as RLE + whole-stage-codegen predicate.
  */
object DeletionVectors {

  /** Sorted (start, len) runs → flat [s0,l0,s1,l1,…] probe array. */
  private[table] def flatten(runs: Seq[(Long, Long)]): Array[Long] = {
    val sorted = runs.sortBy(_._1)
    val out = new Array[Long](sorted.size * 2)
    var i = 0
    sorted.foreach { case (s, l) => out(i) = s; out(i + 1) = l; i += 2 }
    out
  }

  // One broadcast per DISTINCT vector state, LRU-bounded: repeated scans
  // of the same snapshot (the hot pattern — a query fans into many scans
  // of one version) reuse one broadcast instead of accumulating one per
  // scan on the driver and executors; evicted entries unpersist (the
  // driver-side value survives, so an in-flight query lazily re-sends).
  private val BcCacheMax = 32
  private val bcCache = new java.util.LinkedHashMap[
      (org.apache.spark.SparkContext, Map[String, Seq[(Long, Long)]]),
      Broadcast[Map[String, Array[Long]]]](64, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[
        (org.apache.spark.SparkContext, Map[String, Seq[(Long, Long)]]),
        Broadcast[Map[String, Array[Long]]]]): Boolean =
      if (size() > BcCacheMax) {
        scala.util.Try(e.getValue.unpersist(blocking = false)); true
      } else false
  }

  private def broadcastOf(spark: org.apache.spark.sql.SparkSession,
      dv: Map[String, Seq[(Long, Long)]]): Broadcast[Map[String, Array[Long]]] =
    bcCache.synchronized {
      val key = (spark.sparkContext, dv)
      Option(bcCache.get(key)).getOrElse {
        val flat = dv.collect { case (p, rs) if rs.nonEmpty => p -> flatten(rs) }
        val bc = spark.sparkContext.broadcast(flat)
        bcCache.put(key, bc)
        bc
      }
    }

  /** `true` iff (`path`, `pos`) is a deleted position of `dv` (keys are
    * decoded absolute filesystem paths). Usable as a DELETED-side filter
    * (CDF diffs) or negated as the live-row filter of a vectored scan. */
  private[table] def deletedColumn(
      spark: org.apache.spark.sql.SparkSession,
      dv: Map[String, Seq[(Long, Long)]],
      path: Column, pos: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(DvDeleted(
      org.apache.spark.sql.graft.ColumnBridge.expression(path),
      org.apache.spark.sql.graft.ColumnBridge.expression(pos),
      new DvLookup(broadcastOf(spark, dv))))
}

/** Executor-side probe state: resolves a row's file path to its flat run
  * array once per file (rows arrive grouped by file, so the UTF8String
  * equality check short-circuits virtually every row), then binary-
  * searches the runs. `_metadata.file_path` arrives URL-ENCODED
  * (`c=a%2525b` for an on-disk `c=a%25b` directory); one URI decode per
  * file canonicalizes it to the decoded filesystem path the vector keys
  * use — hive-escaped partition values ('%', ' ', ':') hit the same key
  * the commit recorded (pre-r6, the encoded/decoded mismatch made the
  * anti-join silently miss those files and deleted rows resurrected).
  */
final class DvLookup(bc: Broadcast[Map[String, Array[Long]]]) extends Serializable {
  @transient private var lastPath: UTF8String = null
  @transient private var lastRuns: Array[Long] = null

  private def canonical(p: String): String =
    scala.util.Try(new java.net.URI(p).getPath).toOption
      .filter(_ != null).getOrElse(p)

  def deleted(path: UTF8String, pos: Long): Boolean = {
    if (lastPath == null || !lastPath.equals(path)) {
      lastPath = path.clone()
      lastRuns = bc.value.getOrElse(canonical(path.toString), null)
    }
    val runs = lastRuns
    if (runs == null) return false
    var lo = 0
    var hi = runs.length / 2 - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val s = runs(mid * 2)
      if (pos < s) hi = mid - 1
      else if (pos < s + runs(mid * 2 + 1)) return true
      else lo = mid + 1
    }
    false
  }
}

/** Codegen'd membership test backing [[DeletionVectors.deletedColumn]].
  * Never null (a row whose path/pos is null is simply not deleted), so
  * both the negated scan filter and the CDF semi filter stay total. */
case class DvDeleted(path: Expression, pos: Expression, lookup: DvLookup)
    extends BinaryExpression with Predicate {
  override def left: Expression = path
  override def right: Expression = pos
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val p = path.eval(input)
    val q = pos.eval(input)
    if (p == null || q == null) false
    else lookup.deleted(p.asInstanceOf[UTF8String], q.asInstanceOf[Long])
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lk = ctx.addReferenceObj("dvLookup", lookup, classOf[DvLookup].getName)
    val pe = path.genCode(ctx)
    val qe = pos.genCode(ctx)
    ev.copy(code = code"""
      ${pe.code}
      ${qe.code}
      boolean ${ev.value} = false;
      if (!${pe.isNull} && !${qe.isNull}) {
        ${ev.value} = $lk.deleted(${pe.value}, ${qe.value});
      }""", isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DvDeleted =
    copy(path = newLeft, pos = newRight)
}
