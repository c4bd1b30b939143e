package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.ingest.BarSource
import graft.table.GraftTable
import graft.transform.Enrich

/** Column mapping (Delta column-mapping parity): RENAME/DROP COLUMN as
  * metadata-only commits — data files, stats and deletion vectors are
  * untouched because physical names are stable. Verifies reads under
  * the new names, time travel under the old, writes mapping back to
  * physical, no-resurrection on re-add after drop, pruning through the
  * map, guards, and RESTORE/CLONE/CDF interplay.
  */
class ColumnMappingSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(prefix: String): GraftTable = {
    val path = graft.GraftTmp.dir(prefix).toString
    GraftTable(spark, path, Seq("ticker", "trade_date"))
  }

  private def bars = Enrich.withTimeColumns(
    BarSource.harvest(spark, delayMs = 0)).cache()

  test("rename is metadata-only: same data under the new name, old name time-travels") {
    val t = freshTable("cm_rename")
    t.write(bars.repartition(3))
    val files = t.manifestFiles().sorted
    val closes = t.read().agg(sum("close")).collect().head.getDouble(0)

    val v = t.renameColumn("close", "close_px")
    assert(t.manifestFiles().sorted == files, "no data files rewritten")
    assert(t.read().columns.contains("close_px") && !t.read().columns.contains("close"))
    assert(t.read().agg(sum("close_px")).collect().head.getDouble(0) == closes)
    // time travel: the pre-rename version still shows the old name
    assert(t.readVersion(v - 1).columns.contains("close"))
    // rename-only CDF window is empty (no rows changed)
    assert(t.changes(v - 1, v).count() == 0)
  }

  test("writes after a rename map back to the stable physical name") {
    val t = freshTable("cm_write")
    t.write(bars.repartition(2))
    val n0 = t.read().count()
    t.renameColumn("close", "close_px")

    // append uses the NEW logical schema
    val extra = t.read().limit(10)
    t.write(extra, org.apache.spark.sql.SaveMode.Append)
    assert(t.read().count() == n0 + 10)
    // the physical files still store "close" — a raw parquet read of a
    // NEW file must show the physical name
    val newest = t.manifestFiles().map(f => (f, s"${t.path}/$f")).sortBy(_._1).last._2
    val raw = spark.read.parquet(newest)
    assert(raw.columns.contains("close") && !raw.columns.contains("close_px"))

    // appending with the OLD name is now a schema violation
    intercept[IllegalArgumentException] {
      t.write(bars.limit(5), org.apache.spark.sql.SaveMode.Append)
    }
  }

  test("mutations and OPTIMIZE operate on logical names after a rename") {
    val t = freshTable("cm_mut")
    t.write(bars.repartition(3))
    t.renameColumn("close", "close_px")
    val total = t.read().count()
    val aapl = t.read().filter(col("ticker") === "AAPL").count()

    t.delete(col("ticker") === "AAPL")
    assert(t.read().count() == total - aapl)

    t.update(col("close_px") > 0, Map("close_px" -> (col("close_px") + lit(0.0))))
    assert(t.read().count() == total - aapl)

    t.optimize(Seq("close_px"))
    assert(t.read().count() == total - aapl)
    assert(t.read().columns.contains("close_px"))

    // merge-on-read delete under the mapped name
    val msft = t.read().filter(col("ticker") === "MSFT").count()
    t.delete(col("ticker") === "MSFT", mergeOnRead = true)
    assert(t.read().count() == total - aapl - msft)
  }

  test("drop is metadata-only; re-added column starts empty (no resurrection)") {
    val t = freshTable("cm_drop")
    t.write(bars.repartition(2))
    val files = t.manifestFiles().sorted
    val n = t.read().count()

    t.dropColumn("close")
    assert(t.manifestFiles().sorted == files)
    assert(!t.read().columns.contains("close"))
    assert(t.read().count() == n)

    // re-add a column named close via mergeSchema: every pre-existing
    // row must read NULL (old physical values must not resurrect)
    val withClose = t.read().limit(5).withColumn("close", lit(123.5))
    t.write(withClose, org.apache.spark.sql.SaveMode.Append, mergeSchema = true)
    val readd = t.read()
    assert(readd.columns.contains("close"))
    assert(readd.filter(col("close").isNotNull).count() == 5)
    assert(readd.filter(col("close") === 123.5).count() == 5)
  }

  test("stats pruning keys through the map; DSv1/DSv2 read logical names") {
    val t = freshTable("cm_prune")
    // unpartitioned table with disjoint id ranges per file
    val path = graft.GraftTmp.dir("cm_prune_flat").toString
    val flat = GraftTable(spark, path, Nil)
    val df = spark.range(0, 4000).toDF("id").withColumn("v", col("id") * 2.0)
    flat.write(df.repartitionByRange(4, col("id")).sortWithinPartitions("id"))
    flat.renameColumn("id", "row_id")
    import org.apache.spark.sql.sources.LessThan
    // pruning on the LOGICAL name must reach the physical stats
    val kept = flat.dataSkippedFiles(flat.currentVersion, Seq(LessThan("row_id", 10)))
    assert(kept.size == 1, s"expected 1 of 4 files kept, got ${kept.size}")
    // DSv1 source reads logical names
    val viaSource = spark.read.format("graft").load(path)
    assert(viaSource.columns.contains("row_id"))
    assert(viaSource.filter(col("row_id") < 10).count() == 10)
    // DSv2 catalog too
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    assert(spark.sql(s"SELECT row_id FROM graft.`$path` WHERE row_id < 10").count() == 10)
    t.write(bars.limit(1)) // keep the partitioned fixture exercised
  }

  test("guards: partition columns and constraint/generated references are unrenameable") {
    val t = freshTable("cm_guard")
    t.write(bars.repartition(2))
    intercept[IllegalArgumentException] { t.renameColumn("ticker", "symbol") }
    intercept[IllegalArgumentException] { t.dropColumn("trade_date") }
    t.addConstraint("pos_vol", "volume >= 0")
    intercept[IllegalArgumentException] { t.renameColumn("volume", "vol") }
    intercept[IllegalArgumentException] { t.dropColumn("volume") }
    t.dropConstraint("pos_vol")
    t.renameColumn("volume", "vol") // now fine
    assert(t.read().columns.contains("vol"))
  }

  test("RESTORE and CLONE carry the map; CDF across a rename uses to-version names") {
    val t = freshTable("cm_restore")
    t.write(bars.repartition(2))
    val v0 = t.currentVersion
    t.renameColumn("close", "close_px")

    // clone sees the renamed schema
    val clonePath = graft.GraftTmp.dir("cm_clone").toString + "/c"
    val c = t.shallowClone(clonePath)
    assert(c.read().columns.contains("close_px"))
    assert(c.read().count() == t.read().count())

    // delete after the rename: CDF rows surface under to-version names
    val vPre = t.currentVersion
    val vDel = t.delete(col("ticker") === "AAPL")
    val feed = t.changes(vPre, vDel)
    assert(feed.columns.contains("close_px"))
    assert(feed.filter(col("_change_type") === "delete").count() > 0)

    // restore to v0 brings the old name back
    t.restore(v0)
    assert(t.read().columns.contains("close") && !t.read().columns.contains("close_px"))
  }
}
