package graft

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import graft.table.{GraftTable, RowTracking}

/** Row tracking (Delta row-ID parity, metadata-only base-row-id
  * design): unique stable `_row_id`s with zero write-path cost.
  *
  * Stability contract under test: ids survive appends, merge-on-read
  * DELETEs, RESTORE and CLONE; copy-on-write rewrites (OPTIMIZE)
  * re-base — rewritten rows get fresh, still-unique ids (the documented
  * divergence from Delta's materialized ids).
  */
class RowTrackingSpec extends SparkSpec {

  private def tracked(prefix: String): (GraftTable, String) = {
    import spark.implicits._
    val path = graft.GraftTmp.dir(prefix).toString
    val t = GraftTable(spark, path)
    t.write(Seq((0L, "seed")).toDF("k", "s"))
    t.setProperties(Map(RowTracking.Prop -> "true"))
    (t, path)
  }

  /** keyed ids of the tracked rows (the pre-property seed row reads a
    * null id and is excluded). */
  private def idsByKey(t: GraftTable): Map[Long, Long] =
    t.readWithRowIds().select("k", "_row_id")
      .filter(col("_row_id").isNotNull).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("appends mint unique ids; pre-property rows read null") {
    import spark.implicits._
    val (t, _) = tracked("rt_append")
    t.write((1L to 100L).map(k => (k, "a")).toDF("k", "s"), SaveMode.Append)
    t.write((101L to 150L).map(k => (k, "b")).toDF("k", "s"), SaveMode.Append)
    val rows = t.readWithRowIds().select("k", "_row_id").collect()
    assert(rows.length == 151)
    // the seed row predates the property: no base, null id
    val (pre, post) = rows.partition(_.getLong(0) == 0L)
    assert(pre.head.isNullAt(1), "pre-property rows must read null _row_id")
    val ids = post.map(_.getLong(1))
    assert(ids.distinct.length == 150, "ids must be unique")
    assert(ids.min == 0L && ids.max == 149L,
      s"contiguous allocation from 0, got [${ids.min}, ${ids.max}]")
  }

  test("ids are stable under merge-on-read DELETE") {
    import spark.implicits._
    val (t, _) = tracked("rt_dv")
    t.write((1L to 100L).map(k => (k, "a")).toDF("k", "s"), SaveMode.Append)
    val before = idsByKey(t)
    t.delete(col("k") % 3 === 0, mergeOnRead = true)
    val after = idsByKey(t)
    assert(after.keySet == before.keySet.filter(_ % 3 != 0))
    after.foreach { case (k, id) =>
      assert(id == before(k), s"row $k changed id ${before(k)} -> $id")
    }
  }

  test("RESTORE and CLONE carry row ids; hwm clears carried ranges") {
    import spark.implicits._
    val (t, path) = tracked("rt_restore")
    t.write((1L to 50L).map(k => (k, "a")).toDF("k", "s"), SaveMode.Append)
    val v = t.currentVersion
    val before = idsByKey(t)
    // clone preserves ids
    val clonePath = graft.GraftTmp.dir("rt_clone").toString
    t.shallowClone(clonePath)
    val c = GraftTable(spark, clonePath)
    assert(idsByKey(c) == before, "clone must carry ids verbatim")
    // diverge, then restore: ids return with the file list
    t.write((51L to 60L).map(k => (k, "b")).toDF("k", "s"), SaveMode.Append)
    t.restore(v)
    assert(idsByKey(t) == before, "restore must carry ids verbatim")
    // and new appends allocate ABOVE every carried range
    t.write(Seq((999L, "z")).toDF("k", "s"), SaveMode.Append)
    val ids = idsByKey(t)
    assert(ids(999L) >= 50L, s"fresh id must clear carried ranges: ${ids(999L)}")
    assert(ids.values.toSeq.distinct.size == ids.size)
  }

  test("OPTIMIZE re-bases: fresh but still-unique ids (documented)") {
    import spark.implicits._
    val (t, _) = tracked("rt_opt")
    t.write((1L to 40L).map(k => (k, "a")).toDF("k", "s").repartition(4),
      SaveMode.Append)
    t.optimize(Nil)
    val rows = t.readWithRowIds().select("k", "_row_id")
      .filter(col("k") > 0).collect()
    val ids = rows.map(_.getLong(1))
    assert(ids.distinct.length == 40, "re-based ids must stay unique")
    assert(ids.min >= 40L, "re-based ids allocate above the old range")
  }

  test("format(graft) withRowIds option; property off is a clear error") {
    import spark.implicits._
    val (t, path) = tracked("rt_dsv1")
    t.write((1L to 10L).map(k => (k, "a")).toDF("k", "s"), SaveMode.Append)
    val df = spark.read.format("graft").option("withRowIds", "true").load(path)
    assert(df.columns.contains("_row_id"))
    assert(df.filter(col("_row_id").isNotNull).count() == 10)

    val bare = graft.GraftTmp.dir("rt_off").toString
    GraftTable(spark, bare).write(Seq((1L, "x")).toDF("k", "s"))
    val err = intercept[IllegalArgumentException] {
      GraftTable(spark, bare).readWithRowIds()
    }
    assert(err.getMessage.contains("rowTracking"))
    // the hwm is system-managed
    val err2 = intercept[IllegalArgumentException] {
      t.setProperties(Map(RowTracking.HwmProp -> "0"))
    }
    assert(err2.getMessage.contains("system-managed"))
  }
}
