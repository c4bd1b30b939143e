package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.ingest.BarSource
import graft.table.{GraftTable, MaterializedView => MV}
import graft.transform.Enrich

/** Incremental MV maintenance: every refresh must leave the view
  * EXACTLY equal to a full recompute of the aggregate at the source's
  * current version — across appends, copy-on-write deletes, DV deletes
  * and updates — while reading only the change feed. */
class MaterializedViewSpec extends SparkSpec {

  private def bars = Enrich.withTimeColumns(
    BarSource.harvest(spark, delayMs = 0))

  private def recompute(src: GraftTable) =
    src.read().groupBy("ticker")
      .agg(count(lit(1)).as("mv_cnt"), sum("volume").as("sum_volume"))

  private def assertCurrent(mv: GraftTable, src: GraftTable): Unit = {
    val got = mv.read().orderBy("ticker").collect()
    val want = recompute(src).orderBy("ticker").collect()
    assert(got.sameElements(want),
      s"mv=${got.mkString(",")} vs full=${want.mkString(",")}")
  }

  test("refresh tracks appends, deletes, DV deletes and updates exactly") {
    val srcPath = graft.GraftTmp.dir("mv_src").toString
    val src = GraftTable(spark, srcPath, Seq("ticker"))
    src.write(bars.filter(col("ticker") =!= "NVDA"))

    val mvPath = graft.GraftTmp.dir("mv_view").toString + "/mv"
    val mv = MV.create(spark, mvPath, src, Seq("ticker"), Seq("volume"))
    assertCurrent(mv, src)

    // append a new group + more rows of an existing group
    src.write(bars.filter(col("ticker").isin("NVDA", "AAPL")),
      org.apache.spark.sql.SaveMode.Append)
    // copy-on-write delete removes a whole group
    src.delete(col("ticker") === "MSFT")
    // DV (merge-on-read) delete shrinks a group without rewriting files
    src.delete(col("ticker") === "AMZN" && col("volume") % 2 === 0,
      mergeOnRead = true)
    val (from, to) = MV.refresh(spark, mvPath)
    assert(to > from)
    assertCurrent(GraftTable(spark, mvPath, Seq.empty), src)
    // deleted group is GONE from the view, not zero-counted
    assert(GraftTable(spark, mvPath, Seq.empty).read()
      .filter(col("ticker") === "MSFT").count() == 0)

    // update changes sums without changing counts (pre/post images)
    src.update(col("ticker") === "AAPL",
      Map("volume" -> (col("volume") + 7)))
    MV.refresh(spark, mvPath)
    assertCurrent(GraftTable(spark, mvPath, Seq.empty), src)

    // already-current refresh is a no-op commit-wise
    val vBefore = GraftTable(spark, mvPath, Seq.empty).currentVersion
    val (f2, t2) = MV.refresh(spark, mvPath)
    assert(f2 == t2)
    assert(GraftTable(spark, mvPath, Seq.empty).currentVersion == vBefore)
  }

  test("SQL CREATE / REFRESH MATERIALIZED VIEW round-trip") {
    val srcPath = graft.GraftTmp.dir("mv_sql_src").toString
    val src = GraftTable(spark, srcPath, Seq("ticker"))
    src.write(bars)
    val mvPath = graft.GraftTmp.dir("mv_sql").toString + "/mv"
    spark.sql(s"CREATE MATERIALIZED VIEW graft.`$mvPath` AS " +
      s"SELECT ticker, COUNT(*), SUM(volume) FROM graft.`$srcPath` " +
      "GROUP BY ticker")
    assertCurrent(GraftTable(spark, mvPath, Seq.empty), src)

    src.delete(col("ticker") === "GOOG")
    val w = spark.sql(s"REFRESH MATERIALIZED VIEW graft.`$mvPath`")
      .collect().head
    assert(w.getLong(1) > w.getLong(0))
    assertCurrent(GraftTable(spark, mvPath, Seq.empty), src)
  }

  test("torn refresh (merge landed, property commit lost) never double-applies") {
    val srcPath = graft.GraftTmp.dir("mv_torn_src").toString
    val src = GraftTable(spark, srcPath, Seq("ticker"))
    src.write(bars)
    val mvPath = graft.GraftTmp.dir("mv_torn").toString + "/mv"
    val mv = MV.create(spark, mvPath, src, Seq("ticker"), Seq("volume"))

    src.delete(col("ticker") === "TSLA")
    MV.refresh(spark, mvPath)
    // simulate the crash: rewind the PROPERTY to the pre-refresh value
    // while the merge commit (and its txn marker) stays landed
    val healthy = GraftTable(spark, mvPath, Seq.empty)
    val applied = healthy.properties(MV.VersionProp).toLong
    healthy.setProperties(Map(MV.VersionProp -> "0"))

    val (f, t) = MV.refresh(spark, mvPath) // must NOT re-apply 0..applied
    assert(f == applied && t == applied)
    assertCurrent(GraftTable(spark, mvPath, Seq.empty), src)
    // and the healed property is back in line
    assert(GraftTable(spark, mvPath, Seq.empty)
      .properties(MV.VersionProp).toLong == applied)
  }

  test("CDC opt-out: no sidecar written, feed falls back to inference") {
    val p = graft.GraftTmp.dir("cdc_off").toString
    val t = GraftTable(spark, p, Seq("ticker"))
    t.write(bars)
    t.setProperties(Map(GraftTable.ChangeDataFeedProp -> "false"))
    val v0 = t.currentVersion
    t.update(col("ticker") === "AAPL", Map("volume" -> lit(77L)))
    // no cdc sidecar landed for the update commit
    assert(!new java.io.File(s"$p/_graft_log/cdc").exists() ||
      new java.io.File(s"$p/_graft_log/cdc").list().isEmpty)
    // the feed still carries the exact row sets, inferred from the file
    // diff: delete+insert instead of update pre/post images
    val types = t.changes(v0, t.currentVersion)
      .select("_change_type").distinct().collect().map(_.getString(0)).toSet
    assert(types == Set("insert", "delete"))
    val ins = t.changes(v0, t.currentVersion)
      .filter(col("_change_type") === "insert" && col("ticker") === "AAPL")
    assert(ins.filter(col("volume") =!= 77L).count() == 0 && ins.count() > 0)
  }

  test("streaming ingest keeps the MV current per micro-batch") {
    val srcPath = graft.GraftTmp.dir("mv_stream_src").toString + "/t"
    val mvPath = graft.GraftTmp.dir("mv_stream_mv").toString + "/mv"
    val (table, _) = graft.streaming.Streaming.streamIntoTableWithMv(
      spark, sf, srcPath, mvPath)
    val got = GraftTable(spark, mvPath, Seq.empty).read()
      .select("event_type", "mv_cnt", "sum_value")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    val want = table.read().groupBy("event_type")
      .agg(count(lit(1)).as("c"), sum("value").as("s"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (k, (c, s)) =>
      assert(got(k)._1 == c, s"$k count")
      // double sums accumulate per-batch (non-associative): tolerance
      assert(math.abs(got(k)._2 - s) <= math.abs(s) * 1e-9 + 1e-9, s"$k sum")
    }
    // the MV applied at least one real incremental window
    assert(GraftTable(spark, mvPath, Seq.empty)
      .properties(MV.VersionProp).toLong >= 1)
  }

  test("refresh cost scales with the change, not the table: append window reads no base files") {
    val srcPath = graft.GraftTmp.dir("mv_cost_src").toString
    val src = GraftTable(spark, srcPath, Seq("ticker"))
    src.write(bars)
    val mvPath = graft.GraftTmp.dir("mv_cost").toString + "/mv"
    MV.create(spark, mvPath, src, Seq("ticker"), Seq("volume"))
    val appended = bars.filter(col("ticker") === "AAPL").limit(10)
    src.write(appended, org.apache.spark.sql.SaveMode.Append)
    // the change feed for a pure append window is exactly the appended
    // rows — the MV delta never rescans the base table
    val ch = src.changes(src.currentVersion - 1, src.currentVersion)
    assert(ch.count() == appended.count())
    assert(ch.filter(col("_change_type") =!= "insert").count() == 0)
    MV.refresh(spark, mvPath)
    assertCurrent(GraftTable(spark, mvPath, Seq.empty), src)
  }
}
