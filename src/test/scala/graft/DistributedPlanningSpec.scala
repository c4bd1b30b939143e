package graft

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import graft.table.GraftTable

/** Distributed scan planning: pruning evaluated as a Spark job over the
  * manifest-checkpoint parquet plus a broadcast action-tail override
  * map, never materializing the live-file list on the driver. The
  * contract: `spark.graft.distributedPlanning=always` must produce
  * byte-identical results to `never` (the driver path) across every
  * tail shape — pure appends, DV deletes, OPTIMIZE remove+add,
  * RESTORE re-adds — because both paths share the one statsMayMatch
  * predicate.
  */
class DistributedPlanningSpec extends SparkSpec {

  import org.apache.spark.sql.sources._

  private def fresh(prefix: String): (GraftTable, String) = {
    val path = graft.GraftTmp.dir(prefix).toString
    (GraftTable(spark, path), path)
  }

  private def seed(lo: Int, hi: Int) = {
    import spark.implicits._
    (lo to hi).map(i => (i.toLong, s"k_$i", (i % 10).toString))
      .toDF("id", "name", "bucket")
  }

  /** Rows of `t` at `version` under `filters`, with planning forced to
    * `mode`; returned as a sorted seq of (id, name, bucket). */
  private def planned(t: GraftTable, version: Long,
      filters: Seq[Filter], mode: String): Seq[(Long, String, String)] = {
    spark.conf.set("spark.graft.distributedPlanning", mode)
    try {
      import spark.implicits._
      t.readVersionPruned(version, filters)
        .select("id", "name", "bucket").as[(Long, String, String)]
        .collect().toSeq.sorted
    } finally spark.conf.set("spark.graft.distributedPlanning", "never")
  }

  private def bothAgree(t: GraftTable, filters: Seq[Filter]): Unit = {
    val v = t.currentVersion
    val driver = planned(t, v, filters, "never")
    val dist = planned(t, v, filters, "always")
    assert(dist == driver,
      s"distributed plan diverged for $filters: " +
      s"driver=${driver.size} rows, distributed=${dist.size} rows")
  }

  test("pure-append tail: distributed equals driver across predicate shapes") {
    val (t, _) = fresh("dp_append")
    // four disjoint id ranges → four commits → distinct per-file stats
    t.write(seed(1, 100).repartition(1))
    t.checkpoint()
    t.write(seed(101, 200).repartition(1), SaveMode.Append)
    t.write(seed(201, 300).repartition(1), SaveMode.Append)
    for (f <- Seq(
        Seq[Filter](EqualTo("id", 150L)),          // tail-file point hit
        Seq[Filter](EqualTo("id", 50L)),           // checkpoint-file hit
        Seq[Filter](LessThan("id", 120L)),
        Seq[Filter](GreaterThanOrEqual("id", 250L)), // prunes ckpt + 1 tail file
        Seq[Filter](EqualTo("id", 9999L)),         // prunes everything
        Seq[Filter](In("id", Array[Any](10L, 210L))),
        Seq[Filter](And(GreaterThan("id", 90L), LessThanOrEqual("id", 110L))),
        Seq.empty[Filter]))
      bothAgree(t, f)
  }

  test("DV-delete and OPTIMIZE in the tail: overrides applied in the job") {
    val (t, _) = fresh("dp_dv")
    t.write(seed(1, 100).repartition(2))
    t.checkpoint()
    // merge-on-read delete AFTER the checkpoint: the checkpoint row's dv
    // is stale and the tail override must win
    t.delete(col("id") <= 10, mergeOnRead = true)
    t.write(seed(101, 160).repartition(1), SaveMode.Append)
    // OPTIMIZE rewrites everything: checkpoint rows all dead, live set
    // is entirely tail-owned
    bothAgree(t, Seq(LessThan("id", 50L)))
    bothAgree(t, Seq.empty)
    t.optimize(Seq("id"))
    bothAgree(t, Seq(LessThan("id", 50L)))
    bothAgree(t, Seq(EqualTo("id", 5L))) // deleted row stays deleted
    assert(!planned(t, t.currentVersion, Seq.empty, "always").exists(_._1 <= 10))
  }

  test("RESTORE re-adds in the tail: removed-then-readded files live again") {
    val (t, _) = fresh("dp_restore")
    t.write(seed(1, 100).repartition(2))
    t.write(seed(101, 200).repartition(1), SaveMode.Append)
    val target = t.currentVersion
    t.checkpoint()
    t.delete(col("id") > 100) // drops the second commit's file
    t.restore(target)         // re-adds it (a tail re-add with carried stats)
    bothAgree(t, Seq(GreaterThan("id", 150L)))
    bothAgree(t, Seq.empty)
  }

  test("empty prune returns an empty frame with the full schema") {
    val (t, _) = fresh("dp_empty")
    t.write(seed(1, 50).repartition(1))
    t.checkpoint()
    spark.conf.set("spark.graft.distributedPlanning", "always")
    try {
      val out = t.readVersionPruned(t.currentVersion,
        Seq(EqualTo("id", -1L)))
      assert(out.isEmpty && out.columns.toSeq == Seq("id", "name", "bucket"))
    } finally spark.conf.set("spark.graft.distributedPlanning", "never")
  }

  test("no checkpoint or mode=never: driver path serves unchanged") {
    val (t, _) = fresh("dp_fallback")
    t.write(seed(1, 50).repartition(1))
    // no checkpoint exists — always-mode must still answer (fallback)
    spark.conf.set("spark.graft.distributedPlanning", "always")
    try assert(t.readVersionPruned(t.currentVersion,
      Seq(EqualTo("id", 25L))).count() >= 1)
    finally spark.conf.set("spark.graft.distributedPlanning", "never")
  }

  test("column mapping: renamed logical filters reach physical stats") {
    val (t, _) = fresh("dp_colmap")
    t.write(seed(1, 100).repartition(1))
    t.write(seed(101, 200).repartition(1), SaveMode.Append)
    t.renameColumn("id", "row_id")
    t.checkpoint()
    t.write(seed(201, 300).repartition(1)
      .withColumnRenamed("id", "row_id"), SaveMode.Append)
    // file pruning only — the scan layer applies the row filter, so do
    // the same here before comparing against the exact range
    spark.conf.set("spark.graft.distributedPlanning", "always")
    try {
      import spark.implicits._
      val dist = t.readVersionPruned(t.currentVersion,
          Seq(GreaterThan("row_id", 250L)))
        .filter(col("row_id") > 250)
        .select("row_id").as[Long].collect().toSeq.sorted
      assert(dist == (251L to 300L))
    } finally spark.conf.set("spark.graft.distributedPlanning", "never")
    // and the two planning paths agree on the pruned frame itself
    val v = t.currentVersion
    def rows(mode: String) = {
      spark.conf.set("spark.graft.distributedPlanning", mode)
      try {
        import spark.implicits._
        t.readVersionPruned(v, Seq(GreaterThan("row_id", 250L)))
          .select("row_id", "name", "bucket").as[(Long, String, String)]
          .collect().toSeq.sorted
      } finally spark.conf.set("spark.graft.distributedPlanning", "never")
    }
    assert(rows("always") == rows("never"))
  }
}
