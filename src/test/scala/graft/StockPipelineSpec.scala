package graft

import java.nio.file.Files
import java.time.{Instant, LocalDate, ZoneId}

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.ingest.BarSource
import graft.model.Bar
import graft.table.{GraftTable, Maintenance}
import graft.transform.Enrich

class BarSourceSpec extends SparkSpec {

  test("harvest is deterministic for a fixed seed") {
    val a = BarSource.harvest(spark, seed = 7L, delayMs = 0)
      .agg(sum("volume"), count(lit(1))).collect()(0)
    val b = BarSource.harvest(spark, seed = 7L, delayMs = 0)
      .agg(sum("volume"), count(lit(1))).collect()(0)
    assert(a == b)
    val c = BarSource.harvest(spark, seed = 8L, delayMs = 0)
      .agg(sum("volume"), count(lit(1))).collect()(0)
    assert(a != c)
  }

  test("harvest covers 8 tickers x 5 days x 630 bars with null injection") {
    val df = Enrich.withTimeColumns(BarSource.harvest(spark, delayMs = 0)).cache()
    assert(df.count() == 8L * 5 * 630)
    assert(df.select("ticker").distinct().count() == 8)
    assert(df.select("trade_date").distinct().count() == 5)
    assert(df.filter(col("close").isNull).count() > 0)       // null coercion path
    assert(df.filter(col("ticker").isNull).count() == 0)     // non-null key
  }

  test("distributed harvest matches driver-side harvest content") {
    val days = BarSource.tradingDays(LocalDate.of(2024, 1, 8), 5)
    val a = BarSource.harvest(spark, Bar.Tickers, days, 42L, delayMs = 0)
    val b = BarSource.distributedHarvest(spark, Bar.Tickers, days, 42L)
    assert(a.count() == b.count())
    assert(a.exceptAll(b).count() == 0)
  }

  test("rate limiter: sleeps between calls, retries once on 429") {
    val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
    val sleeper = new BarSource.Sleeper {
      def nowMs(): Long = 0L
      def sleepMs(ms: Long): Unit = sleeps += ms
    }
    var calls = 0
    val flaky = new BarSource.FetchClient {
      def fetch(t: String, d: LocalDate): BarSource.FetchResult = {
        calls += 1
        if (calls == 2) BarSource.RateLimited
        else if (calls == 3) BarSource.Page(Nil) // retry succeeds
        else BarSource.Page(Nil)
      }
    }
    val limiter = new BarSource.RateLimiter(flaky, sleeper, delayMs = 13000, backoffMs = 60000)
    val (_, errors) = limiter.fetchAll(Seq("A", "B"), Seq(LocalDate.of(2024, 1, 8)))
    assert(errors.isEmpty)
    assert(calls == 3)                     // 2 fetches + 1 retry
    assert(sleeps.toSeq == Seq(13000L, 60000L)) // inter-call delay + backoff
  }
}

class EnrichSpec extends SparkSpec {

  test("trade_date matches java.time NY calendar across 2000-2030 (property sample)") {
    import spark.implicits._
    val ny = ZoneId.of("America/New_York")
    // seeded sample of epochs 2000..2030 plus DST-transition edges
    val rnd = new scala.util.Random(42)
    val lo = 946684800000L; val hi = 1893456000000L
    val dstEdges = Seq( // around US DST switches (2024-03-10, 2024-11-03)
      1710054000000L, 1710057600000L, 1730610000000L, 1730613600000L)
    val epochs = (Seq.fill(500)(lo + (rnd.nextLong().abs % (hi - lo))) ++ dstEdges).distinct
    val expected = epochs.map(ms =>
      ms -> Instant.ofEpochMilli(ms).atZone(ny).toLocalDate.toString).toMap
    val got = Enrich.withTimeColumns(
      epochs.map(ms => ("X", ms)).toDF("ticker", "timestamp_ms"))
      .select(col("timestamp_ms"), col("trade_date").cast("string"))
      .as[(Long, String)].collect()
    got.foreach { case (ms, d) =>
      assert(d == expected(ms), s"epoch $ms: spark=$d java.time=${expected(ms)}")
    }
  }

  test("bars after midnight UTC keep the NY trade date") {
    val df = graft.queries.StockPipeline.barTimezoneEdge(spark, sf)
    assert(df.count() > 0) // the edge is actually exercised
    assert(df.agg(sum("bars_past_utc_midnight")).collect()(0).getLong(0) > 0)
  }
}

class GraftTableSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(prefix: String): GraftTable = {
    val path = graft.GraftTmp.dir(prefix).toString
    GraftTable(spark, path, Seq("ticker", "trade_date"))
  }

  private def bars = Enrich.withTimeColumns(
    BarSource.harvest(spark, delayMs = 0)).cache()

  test("write/read roundtrip preserves rows and partition columns") {
    val t = freshTable("gt_rt")
    t.write(bars.repartition(4))
    val back = t.read()
    assert(back.count() == bars.count())
    assert(back.columns.toSet == bars.columns.toSet)
    assert(back.select("ticker").distinct().count() == 8)
  }

  test("append mode accumulates; overwrite replaces") {
    val t = freshTable("gt_modes")
    val day1 = bars.filter(col("trade_date") === "2024-01-08")
    val day2 = bars.filter(col("trade_date") === "2024-01-09")
    t.write(day1)
    t.write(day2, SaveMode.Append)
    assert(t.read().count() == day1.count() + day2.count())
    t.write(day1) // logical overwrite
    assert(t.read().count() == day1.count())
  }

  test("optimize compacts to one file per partition, preserves rows, clusters by ts") {
    val t = freshTable("gt_opt")
    t.write(bars.repartition(8))
    val before = t.health()
    t.optimize(Seq("timestamp_ms"))
    val after = t.health()
    assert(after.rowCount == before.rowCount)
    assert(after.numFiles == 40)         // 8 tickers x 5 days
    assert(after.numFiles < before.numFiles)
    // clustering: within each file rows are sorted by timestamp_ms —
    // check monotone within each (ticker, trade_date) input split
    val unsorted = t.read()
      .repartition(col("ticker"), col("trade_date"))
      .select("ticker", "trade_date", "timestamp_ms")
      .mapPartitions { it =>
        val rows = it.toSeq.groupBy(r => (r.getString(0), r.getDate(1)))
        Iterator.single(rows.values.forall { rs =>
          val ts = rs.map(_.getLong(2))
          ts == ts.sorted
        })
      }.collect()
    // NOTE: read order within a parquet file follows row order on disk
    assert(unsorted.forall(identity))
  }

  test("optimize bin-packs an oversized partition into ~target-size files with disjoint key ranges") {
    val path = graft.GraftTmp.dir("gt_binpack").toString
    val t = GraftTable(spark, path, Seq("grp"))
    val rnd = new scala.util.Random(7)
    // skew: "big" carries ~400x the bytes of "small"
    val big = Seq.tabulate(20000)(i => ("big", i.toLong, rnd.nextDouble()))
    val small = Seq.tabulate(50)(i => ("small", i.toLong, rnd.nextDouble()))
    t.write((big ++ small).toDF("grp", "k", "v").repartition(4))
    val liveBytes = t.detail().sizeInBytes
    val target = math.max(1L, liveBytes / 8) // expect ~8 bins
    t.optimize(Seq("k"), targetFileSizeBytes = target)
    assert(t.read().count() == 20050L)
    val perFile = t.read()
      .groupBy(col("_metadata.file_path").as("f"), col("grp"))
      .agg(min("k").as("lo"), max("k").as("hi"))
      .as[(String, String, Long, Long)].collect()
    val bigFiles = perFile.filter(_._2 == "big")
    val smallFiles = perFile.filter(_._2 == "small")
    assert(bigFiles.length >= 4 && bigFiles.length <= 16,
      s"expected ~8 files for the oversized partition, got ${bigFiles.length}")
    assert(smallFiles.length <= 2) // small partition is NOT shattered
    // range split, not salt: per-file [lo,hi] of the cluster key disjoint
    val ranges = bigFiles.map(f => (f._3, f._4)).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 < lo2, s"overlapping file ranges: $hi1 >= $lo2")
      case _ =>
    }
    // byte sizes near target (parquet overhead allows slack)
    val fsizes = t.read().groupBy(col("_metadata.file_path"))
      .agg(first(col("_metadata.file_size")).as("sz"))
      .select("sz").as[Long].collect()
    assert(fsizes.max <= 4 * target, s"file of ${fsizes.max} B vs target $target B")
  }

  test("partition-scoped optimize rewrites only the matching partitions") {
    val t = freshTable("gt_opt_where")
    t.write(bars.repartition(8))
    val before = t.manifestFiles().toSet
    t.optimize(Seq("timestamp_ms"), where = Some("ticker = 'AAPL'"))
    val after = t.manifestFiles().toSet
    val untouched = before.filterNot(_.contains("ticker=AAPL"))
    assert(untouched.subsetOf(after))                 // carried over verbatim
    assert(before.diff(after).forall(_.contains("ticker=AAPL")))
    assert(after.filter(_.contains("ticker=AAPL")).size == 5) // 5 trade dates, 1 file each
    assert(t.read().count() == bars.count())
    // predicate on a non-partition column is rejected (Delta contract)
    intercept[IllegalArgumentException] {
      t.optimize(Seq("timestamp_ms"), where = Some("close > 0"))
    }
  }

  test("convert adopts an existing parquet directory in place") {
    val path = graft.GraftTmp.dir("gt_convert").toString
    bars.write.mode("overwrite").partitionBy("ticker", "trade_date").parquet(path)
    val preexisting = GraftTable(spark, path).currentVersion
    assert(preexisting == -1L)
    val t = GraftTable.convert(spark, path, Seq("ticker", "trade_date"))
    assert(t.currentVersion == 0L)
    assert(t.read().count() == bars.count())
    // conversion referenced the files in place — nothing was rewritten
    assert(t.history().select("operation").collect().map(_.getString(0)).toSeq
      == Seq("CONVERT"))
    intercept[IllegalArgumentException] { GraftTable.convert(spark, path) }
    // the converted table is a full citizen: maintenance + DML work
    t.optimize(Seq("timestamp_ms"))
    assert(t.read().count() == bars.count())
  }

  test("vacuum dry run reports reclaimable files without deleting or committing") {
    val t = freshTable("gt_vac_dry")
    t.write(bars.repartition(4))
    t.optimize(Seq("timestamp_ms"))       // makes the v0 files orphans
    val vBefore = t.currentVersion
    val (v, n) = t.vacuum(0.0, retentionCheckEnabled = false, dryRun = true)
    assert(n > 0)
    assert(v == vBefore)                  // no commit
    assert(t.currentVersion == vBefore)
    assert(t.readVersion(0).count() == bars.count()) // orphans still readable
    val (_, deleted) = t.vacuum(0.0, retentionCheckEnabled = false)
    assert(deleted == n)                  // the dry run predicted exactly
  }

  test("vacuum respects retention guard and deletes only aged orphans") {
    val t = freshTable("gt_vac")
    t.write(bars.repartition(4))
    t.optimize(Seq("timestamp_ms"))
    intercept[IllegalArgumentException] { t.vacuum(0.0) } // guard on
    // retention in the future → nothing old enough
    val (_, deleted0) = t.vacuum(1.0, retentionCheckEnabled = false,
      nowMs = System.currentTimeMillis() - 3600 * 1000)
    assert(deleted0 == 0)
    val rowsBefore = t.read().count()
    val (_, deleted) = t.vacuum(0.0, retentionCheckEnabled = false)
    assert(deleted > 0)
    assert(t.read().count() == rowsBefore) // live files untouched
  }

  test("history records every operation with increasing versions") {
    val t = freshTable("gt_hist")
    t.write(bars.repartition(2))
    t.optimize(Seq("timestamp_ms"))
    t.vacuum(0.0, retentionCheckEnabled = false)
    val h = t.history().select("version", "operation")
      .as[(Long, String)].collect().sortBy(_._1)
    assert(h.map(_._2).toSeq == Seq("WRITE", "OPTIMIZE", "VACUUM"))
    assert(h.map(_._1).toSeq == Seq(0L, 1L, 2L))
  }

  test("maintenance report invariant: rows preserved, files reduced") {
    val df = graft.queries.StockPipeline.barMaintenanceReport(spark, sf)
    val m = df.as[(String, String)].collect().toMap
    assert(m("row_count_preserved") == "true")
    assert(m("rows_before") == m("rows_after"))
    assert(m("files_after").toLong < m("files_before").toLong)
    assert(m("files_after") == "40")
    assert(m("orphans_deleted").toLong > 0)
  }

  test("external table: DROP removes catalog entry, data survives") {
    val path = graft.GraftTmp.dir("gt_ext").toString
    val t = GraftTable(spark, path, Seq("ticker", "trade_date"))
    t.write(bars.repartition(2))
    val name = s"ext_spec_${System.nanoTime()}"
    graft.catalog.External.registerExternalTable(spark, name, path)
    assert(spark.table(name).count() == bars.count())
    spark.sql(s"DROP TABLE $name")
    assert(!spark.catalog.tableExists(name))
    assert(t.read().count() == bars.count()) // files still there
  }

  test("registerWithFallback: view fallback serves identical rows when table creation fails (D4)") {
    val path = graft.GraftTmp.dir("gt_fb").toString
    val t = GraftTable(spark, path, Seq("ticker", "trade_date"))
    t.write(bars.repartition(2))
    val n = bars.count()
    // free name → real external table
    val tblName = s"fb_tbl_${System.nanoTime()}"
    assert(graft.catalog.External.registerWithFallback(spark, tblName, path) == "table")
    assert(spark.table(tblName).count() == n)
    // name occupied by a permanent VIEW → DROP TABLE fails with a
    // wrong-object-type error → fallback registers a view instead
    // (the reference's table-then-view dance, external_table.py:71-87)
    val viewName = s"fb_view_${System.nanoTime()}"
    spark.sql(s"CREATE OR REPLACE VIEW $viewName AS SELECT 1 AS x")
    assert(graft.catalog.External.registerWithFallback(spark, viewName, path) == "view")
    assert(spark.table(viewName).count() == n) // identical data through the view
    assert(spark.table(viewName).columns.toSet == t.read().columns.toSet)
    spark.sql(s"DROP TABLE IF EXISTS $tblName")
    spark.sql(s"DROP VIEW IF EXISTS $viewName")
  }

  test("describe returns the table's columns (D6)") {
    val path = graft.GraftTmp.dir("gt_desc").toString
    GraftTable(spark, path, Seq("ticker", "trade_date")).write(bars.repartition(2))
    val name = s"desc_spec_${System.nanoTime()}"
    graft.catalog.External.registerExternalTable(spark, name, path)
    val cols = graft.catalog.External.describe(spark, name)
      .select("col_name").as[String].collect().toSet
    assert(Set("ticker", "trade_date", "close", "volume").subsetOf(cols))
    spark.sql(s"DROP TABLE $name")
  }

  test("external analytics query returns per-(ticker,date) rows") {
    val df = graft.queries.StockPipeline.barExternalAnalytics(spark, sf)
    assert(df.count() == 40)
    assert(df.filter(col("day_low") > col("day_high")).count() == 0)
  }
}
