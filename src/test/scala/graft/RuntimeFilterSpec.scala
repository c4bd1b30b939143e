package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._
import graft.table.GraftTable

/** Spark's runtime bloom-filter injection (`InjectRuntimeFilter`) must
  * cooperate with graft scans: when a selective dimension filters a
  * shuffle join, Spark builds a bloom filter on the dimension's join
  * keys and pre-filters the fact side — at 100 TB that is the
  * difference between shuffling the whole fact table and shuffling the
  * matching fraction. The injection decision reads the scan's size
  * estimate, which for graft tables comes from the manifest
  * ([[graft.sources.GraftCatalog]] stats path) — so this is a contract
  * test on our stats, not on Spark.
  *
  * The filter lands ABOVE the scan (bloom_filter_might_contain is not a
  * translatable source predicate) — correctness must be unchanged, only
  * the shuffled row count drops.
  */
class RuntimeFilterSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  private def withConfs[A](kvs: (String, String)*)(body: => A): A = {
    val prev = kvs.map { case (k, _) =>
      k -> util.Try(spark.conf.get(k)).toOption }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("bloom runtime filter injects over a graft fact scan and preserves results") {
    import spark.implicits._
    val factPath = graft.GraftTmp.dir("rf_fact").toString
    val dimPath = graft.GraftTmp.dir("rf_dim").toString
    // fact: 50k rows over 500 keys; dim: 500 keys, 10 of them 'hot'
    val fact = GraftTable(spark, factPath)
    fact.write((1 to 50000).map(i => (i.toLong % 500, i.toLong))
      .toDF("key", "v"))
    val dim = GraftTable(spark, dimPath)
    dim.write((0 until 500).map(i =>
      (i.toLong, if (i < 10) "hot" else "cold")).toDF("key", "tag"))

    def join() = fact.read().as("f")
      .join(dim.read().filter(col("tag") === "hot").as("d"), Seq("key"))
      .groupBy("key").agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .orderBy("key")

    val expected = join().collect().toSeq

    val injected = withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // bench-scale tables are KB-sized; drop the 10 GB/10 MB production
      // thresholds so the injection decision runs on our stats at all
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      // force the shuffle join: injection only targets non-broadcast joins
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val df = join()
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") && plan.contains("bloom_filter_agg"),
        s"runtime filter not injected:\n$plan")
      df.collect().toSeq
    }
    assert(injected == expected,
      "bloom-filtered join must return exactly the unfiltered-join result")
  }

  test("injection stays off when the dimension is not selective") {
    import spark.implicits._
    val factPath = graft.GraftTmp.dir("rf_fact2").toString
    val fact = GraftTable(spark, factPath)
    fact.write((1 to 10000).map(i => (i.toLong % 100, i.toLong))
      .toDF("key", "v"))
    val dimDf = (0 until 100).map(i => (i.toLong, s"t$i")).toDF("key", "tag")
    withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      // no filter on the creation side → nothing to gain → no injection
      val plan = fact.read().join(dimDf, Seq("key"))
        .queryExecution.optimizedPlan.toString
      assert(!plan.contains("might_contain"))
    }
  }
}
