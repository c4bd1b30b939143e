package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.table.GraftTable

/** COPY INTO (Delta parity): idempotent bulk file ingestion — each
  * source file loads exactly once across re-runs, identified by path;
  * per-file markers ride the loading commit's txn map. */
class CopyIntoSpec extends SparkSpec {
  import spark.implicits._

  test("each source file loads once; re-runs no-op; new files load incrementally") {
    val srcDir = graft.GraftTmp.dir("ci_src").toString
    val tgt = graft.GraftTmp.dir("ci_tgt").toString
    (0 until 3).foreach { i =>
      Seq((i.toLong, s"f$i")).toDF("id", "s")
        .coalesce(1).write.parquet(s"$srcDir/part$i")
    }
    val t = GraftTable(spark, tgt, Nil)
    t.write(Seq((-1L, "seed")).toDF("id", "s")) // target must exist
    val (n1, _) = t.copyInto(srcDir)
    assert(n1 == 3, s"first run loads all 3 source files, got $n1")
    assert(t.read().count() == 4)
    // idempotent re-run: nothing new
    val (n2, _) = t.copyInto(srcDir)
    assert(n2 == 0 && t.read().count() == 4)
    // a NEW file loads; the old ones stay skipped
    Seq((100L, "new")).toDF("id", "s").coalesce(1)
      .write.parquet(s"$srcDir/part_new")
    val (n3, _) = t.copyInto(srcDir)
    assert(n3 == 1 && t.read().count() == 5)
    assert(t.read().select("id").as[Long].collect().sorted.toSeq ==
      Seq(-1L, 0L, 1L, 2L, 100L))
    // force reloads everything (explicit duplication, Delta contract)
    val (n4, _) = t.copyInto(srcDir, force = true)
    assert(n4 == 4 && t.read().count() == 9)
  }

  test("markers survive checkpoints and log-tail replay") {
    val srcDir = graft.GraftTmp.dir("ci_ckpt_src").toString
    val tgt = graft.GraftTmp.dir("ci_ckpt_tgt").toString
    Seq((1L, "a")).toDF("id", "s").coalesce(1).write.parquet(s"$srcDir/p0")
    val t = GraftTable(spark, tgt, Nil)
    t.write(Seq((0L, "seed")).toDF("id", "s"))
    assert(t.copyInto(srcDir)._1 == 1)
    // push past a checkpoint boundary: the marker must fold into the
    // txn checkpoint like streaming txns do
    (1 to GraftTable.CheckpointInterval.toInt + 1).foreach(i =>
      t.setProperties(Map(s"user.k$i" -> "v")))
    assert(t.copyInto(srcDir)._1 == 0,
      "marker must survive checkpoint folding")
  }

  test("SQL: COPY INTO with FORMAT_OPTIONS and COPY_OPTIONS") {
    val srcDir = graft.GraftTmp.dir("ci_sql_src").toString
    val tgt = graft.GraftTmp.dir("ci_sql_tgt").toString
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(srcDir, "a.csv"), "id,s\n7,x\n8,y\n")
    val t = GraftTable(spark, tgt, Nil)
    t.write(Seq((0, "seed")).toDF("id", "s")) // int id: csv inferSchema parity
    val r = spark.sql(
      s"""COPY INTO graft.`$tgt` FROM '$srcDir' FILEFORMAT = CSV
         |FORMAT_OPTIONS ('header' = 'true', 'inferSchema' = 'true')
         |""".stripMargin).collect()(0)
    assert(r.getInt(0) == 1, r.toString)
    assert(t.read().count() == 3)
    // second run: loaded file skipped
    val r2 = spark.sql(
      s"""COPY INTO graft.`$tgt` FROM '$srcDir' FILEFORMAT = CSV
         |FORMAT_OPTIONS ('header' = 'true', 'inferSchema' = 'true')
         |""".stripMargin).collect()(0)
    assert(r2.getInt(0) == 0 && t.read().count() == 3)
    // unknown copy option fails clearly
    val e = intercept[Exception] {
      spark.sql(s"COPY INTO graft.`$tgt` FROM '$srcDir' FILEFORMAT = CSV " +
        "COPY_OPTIONS ('bogus' = 'true')").collect()
    }
    assert(e.getMessage.contains("bogus"), e.getMessage)
  }

  test("COPY INTO a nonexistent target fails with the CREATE TABLE contract") {
    val srcDir = graft.GraftTmp.dir("ci_missing_src").toString
    Seq((1L, "a")).toDF("id", "s").coalesce(1).write.parquet(s"$srcDir/p0")
    val tgt = graft.GraftTmp.dir("ci_missing_tgt").toString
    val e = intercept[IllegalArgumentException] {
      GraftTable(spark, tgt, Nil).copyInto(srcDir)
    }
    assert(e.getMessage.contains("CREATE TABLE"), e.getMessage)
  }
}
