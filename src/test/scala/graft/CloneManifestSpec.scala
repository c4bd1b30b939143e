package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.ingest.BarSource
import graft.table.GraftTable
import graft.transform.Enrich

/** DEEP CLONE independence and GENERATE symlink_format_manifest. */
class CloneManifestSpec extends SparkSpec {

  private def bars = Enrich.withTimeColumns(
    BarSource.harvest(spark, delayMs = 0))

  test("deep clone copies files, carries metadata, survives source vacuum") {
    val srcPath = graft.GraftTmp.dir("deep_src").toString
    val t = GraftTable(spark, srcPath, Seq("ticker"))
    t.write(bars)
    t.addConstraint("pos_vol", "volume >= 0")
    t.delete(col("ticker") === "MSFT") // a DV-free copy-on-write delete
    val expect = t.read().orderBy("ticker", "timestamp_ms").collect()

    val tgtPath = graft.GraftTmp.dir("deep_tgt").toString + "/c"
    val c = t.deepClone(tgtPath)
    // every clone manifest entry is clone-local (no path back to source)
    assert(c.manifestFiles().forall(!_.startsWith("/")))
    assert(c.read().orderBy("ticker", "timestamp_ms").collect().sameElements(expect))
    assert(c.constraints.contains("pos_vol"))

    // obliterate the source entirely: the deep clone must not notice
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(srcPath))
    assert(c.read().orderBy("ticker", "timestamp_ms").collect().sameElements(expect))

    // SQL form, cloning the clone at version 0
    val tgt2 = graft.GraftTmp.dir("deep_tgt2").toString + "/d"
    spark.sql(s"CREATE TABLE graft.`$tgt2` DEEP CLONE graft.`$tgtPath`")
    assert(GraftTable(spark, tgt2, Seq("ticker")).read().count() ==
      expect.length)
  }

  test("deep clone of a shallow clone localizes the absolute entries") {
    val srcPath = graft.GraftTmp.dir("deep_sh_src").toString
    val t = GraftTable(spark, srcPath, Seq("ticker"))
    t.write(bars)
    val sh = t.shallowClone(
      graft.GraftTmp.dir("deep_sh_mid").toString + "/s")
    assert(sh.manifestFiles().exists(_.startsWith("/"))) // references source
    val deep = sh.deepClone(
      graft.GraftTmp.dir("deep_sh_tgt").toString + "/d")
    assert(deep.manifestFiles().forall(!_.startsWith("/")))
    assert(deep.read().count() == t.read().count())
  }

  test("symlink manifest lists exactly the live files per partition dir") {
    val p = graft.GraftTmp.dir("symlink").toString
    val t = GraftTable(spark, p, Seq("ticker"))
    t.write(bars)
    val n = t.generateSymlinkManifest()
    assert(n > 1) // one manifest per ticker partition
    val rootAbs = new java.io.File(p).getCanonicalPath
    val listed = spark.read.textFile(s"$p/_symlink_format_manifest/*/manifest")
      .collect().toSet
    val live = t.manifestFiles().map(f => s"file:$rootAbs/$f").toSet
    assert(listed == live)
    // every URI resolves to a real parquet file
    listed.foreach { u =>
      assert(new java.io.File(u.stripPrefix("file:")).isFile, u)
    }

    // SQL form reports the manifest count; regeneration replaces stale dirs
    val m = spark.sql(s"GENERATE symlink_format_manifest FOR TABLE graft.`$p`")
      .collect().head.getLong(0)
    assert(m == n.toLong)
  }

  test("auto-regenerated manifest stays current across commits") {
    val p = graft.GraftTmp.dir("symlink_auto").toString
    val t = GraftTable(spark, p, Seq("ticker"))
    t.write(bars)
    t.setProperties(Map(GraftTable.SymlinkManifestProp -> "true"))
    def listed() = spark.read
      .textFile(s"$p/_symlink_format_manifest/*/manifest").collect().toSet
    val rootAbs = new java.io.File(p).getCanonicalPath
    def live() = t.manifestFiles().map(f => s"file:$rootAbs/$f").toSet
    assert(listed() == live()) // the property-set commit regenerated

    t.delete(col("ticker") === "TSLA") // copy-on-write rewrite
    assert(listed() == live())
    assert(!listed().exists(_.contains("ticker=TSLA")))

    // a DV delete would leave raw-parquet consumers reading ghosts: it
    // is refused BEFORE the commit lands — no DV state, no stale tree
    val vBefore = t.currentVersion
    val e = intercept[Exception](
      t.delete(col("ticker") === "AAPL", mergeOnRead = true))
    assert(e.getMessage.contains("deletion vectors"))
    assert(t.currentVersion == vBefore)
    assert(t.read().filter(col("ticker") === "AAPL").count() > 0)
    assert(listed() == live())
  }

  test("symlink manifest refuses a table with live deletion vectors") {
    val p = graft.GraftTmp.dir("symlink_dv").toString
    val t = GraftTable(spark, p, Seq("ticker"))
    t.write(bars)
    t.delete(col("ticker") === "AAPL", mergeOnRead = true)
    val e = intercept[IllegalArgumentException](t.generateSymlinkManifest())
    assert(e.getMessage.contains("deletion vectors"))
  }

  test("enabling the symlink property on a DV table fails BEFORE commit") {
    val p = graft.GraftTmp.dir("symlink_en_dv").toString
    val t = GraftTable(spark, p, Seq("ticker"))
    t.write(bars)
    t.delete(col("ticker") === "AAPL", mergeOnRead = true)
    val vBefore = t.currentVersion
    // the property-set commit would land and then throw from the auto
    // manifest regeneration (caller sees failure for a landed commit);
    // the post-state guard refuses it pre-claim instead
    val e = intercept[IllegalStateException](
      t.setProperties(Map(GraftTable.SymlinkManifestProp -> "true")))
    assert(e.getMessage.contains("deletion vectors"))
    assert(t.currentVersion == vBefore) // nothing landed
    assert(!t.properties.contains(GraftTable.SymlinkManifestProp))
  }

  test("enabling the symlink property on a column-mapped table fails") {
    val p = graft.GraftTmp.dir("symlink_en_cm").toString
    val t = GraftTable(spark, p, Seq("ticker"))
    t.write(bars)
    t.renameColumn("volume", "vol") // logical != physical from here on
    val vBefore = t.currentVersion
    val e = intercept[IllegalStateException](
      t.setProperties(Map(GraftTable.SymlinkManifestProp -> "true")))
    assert(e.getMessage.contains("column mapping"))
    assert(t.currentVersion == vBefore)
  }

  test("RENAME COLUMN on a symlink-enabled table fails BEFORE commit") {
    val p = graft.GraftTmp.dir("symlink_rename").toString
    val t = GraftTable(spark, p, Seq("ticker"))
    t.write(bars)
    t.setProperties(Map(GraftTable.SymlinkManifestProp -> "true"))
    val vBefore = t.currentVersion
    val e = intercept[IllegalStateException](t.renameColumn("volume", "vol"))
    assert(e.getMessage.contains("column mapping"))
    assert(t.currentVersion == vBefore)
    assert(t.read().columns.contains("volume")) // rename did not land
    // and the manifest tree is still the pre-attempt live set
    val rootAbs = new java.io.File(p).getCanonicalPath
    val listed = spark.read.textFile(s"$p/_symlink_format_manifest/*/manifest")
      .collect().toSet
    assert(listed == t.manifestFiles().map(f => s"file:$rootAbs/$f").toSet)
  }
}
