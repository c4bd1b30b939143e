package graft

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.EqualTo
import graft.table.GraftTable

/** Manifest-backed statistics drive join strategy.
  *
  * Without them, `BaseRelation.sizeInBytes` defaults to
  * `spark.sql.defaultSizeInBytes` (≈Long.Max) and a kilobyte-sized graft
  * dimension table NEVER auto-broadcasts — every join against a graft
  * table shuffles both sides. The contract under test:
  *
  *  - DSv1 (`format("graft")`): relation size = manifest byte sum of
  *    the pinned version → a small table auto-broadcasts with no hint;
  *  - DSv2 (catalog): the SCAN reports post-pruning stats, so a
  *    selective filter over a table too big to broadcast still puts the
  *    filtered scan on the build side;
  *  - `scanStats` itself: bytes shrink with data skipping, rows come
  *    from footer counts minus deletion-vector cardinality.
  *
  * AQE is disabled inside the join tests: adaptive runtime re-planning
  * can convert to broadcast from OBSERVED sizes, which would mask a
  * broken static estimate — the point here is the STATIC plan.
  */
class RelationStatsSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  private def staticBhjCount(df: org.apache.spark.sql.DataFrame): Int =
    collect(df.queryExecution.executedPlan) {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
    }.size

  private def withoutAqe[A](body: => A): A = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("DSv1: small graft table auto-broadcasts without a hint") {
    import spark.implicits._
    val path = graft.GraftTmp.dir("stats_v1").toString
    val t = GraftTable(spark, path)
    t.write((1 to 100).map(i => (i.toLong, s"name_$i")).toDF("id", "name"))
    assert(t.sizeInBytes() > 0)
    assert(t.sizeInBytes() < (1 << 20), "100 rows must be well under the 10MB default")

    withoutAqe {
      val dim = spark.read.format("graft").load(path)
      val fact = spark.range(0, 10000).select(
        (col("id") % 100 + 1).as("id"), (col("id") * 2).as("v"))
      val joined = fact.join(dim, "id")
      assert(staticBhjCount(joined) == 1,
        "manifest sizeInBytes must qualify the dim side for auto-broadcast")
      assert(joined.count() == 10000)
    }
  }

  test("DSv2: filter-pruned scan stats unlock broadcast on a big table") {
    import spark.implicits._
    val path = graft.GraftTmp.dir("stats_v2").toString
    // 10 range-partitioned files: a probe on one id prunes to ~1 file
    // via min/max skipping, so post-pruning bytes << total bytes.
    // Payload is random-ish hex so parquet can't compress it away.
    val t = GraftTable(spark, path)
    t.write((1 to 100000).map(i =>
        (i.toLong, f"${i * 2654435761L}%016x${i * 0x9E3779B97F4A7C15L}%016x" +
          f"${i * 0xC2B2AE3D27D4EB4FL}%016x${i * 0x165667B19E3779F9L}%016x"))
      .toDF("id", "payload").repartitionByRange(10, col("id")),
      SaveMode.Overwrite)
    val total = t.sizeInBytes()
    val (prunedBytes, prunedRows) =
      t.scanStats(t.currentVersion, Seq(EqualTo("id", 5L)))
    assert(prunedBytes < total / 4,
      s"point probe must prune most bytes: $prunedBytes of $total")
    assert(prunedRows.exists(r => r >= 2000 && r <= 40000),
      s"rows must reflect the surviving file(s), got $prunedRows")

    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try withoutAqe {
      // threshold between the pruned estimate and the table's total:
      // only POST-PRUNING stats can qualify the graft side
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
        ((prunedBytes + total) / 2).toString)
      val dim = spark.sql(s"SELECT * FROM graft.`$path` WHERE id = 5")
      val fact = spark.range(0, 50000).select(
        (col("id") % 10 + 1).as("id"), col("id").as("v"))
      val joined = fact.join(dim, "id")
      assert(staticBhjCount(joined) >= 1,
        "post-pruning scan stats must put the filtered graft scan on the build side")
      assert(joined.count() == 5000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
  }

  test("ANALYZE column NDV flips a 3-table join to broadcast builds") {
    import spark.implicits._
    val dir = graft.GraftTmp.dir("stats_ndv").toString
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    // two dims, one file each (a point filter can NOT file-prune, so
    // bytes stay big), unique join keys: only a distinct-count estimate
    // can prove `k = const` selects ~1 row
    def writeDim(name: String): GraftTable = {
      val t = GraftTable(spark, s"$dir/$name")
      t.write(spark.range(20000).select(col("id").as(s"k_$name"),
        concat(lit("payload_payload_payload_"), col("id")).as(s"s_$name"))
        .repartition(1))
      t
    }
    val ta = writeDim("a")
    val tb = writeDim("b")
    val tf = GraftTable(spark, s"$dir/f")
    tf.write(spark.range(20000).select((col("id") % 20000).as("k_a"),
      (col("id") % 17000).as("k_b"), (col("id") * 2).as("v")).repartition(1))
    assert(ta.sizeInBytes() > 100 * 1024, "dim must be too big for the threshold")

    def threeWay() = {
      val fact = spark.sql(s"SELECT * FROM graft.`$dir/f`")
      val a = spark.sql(s"SELECT * FROM graft.`$dir/a`").filter(col("k_a") === 1234L)
      val b = spark.sql(s"SELECT * FROM graft.`$dir/b`").filter(col("k_b") === 77L)
      fact.join(a, "k_a").join(b, "k_b")
    }

    val prevCbo = spark.conf.get("spark.sql.cbo.enabled")
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try withoutAqe {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (20 * 1024).toString)
      assert(staticBhjCount(threeWay()) == 0,
        "without NDV stats no side may qualify for broadcast (bytes too big)")

      ta.analyzeColumns(Seq("k_a"))
      // the other dim goes through the SQL surface (Delta parity)
      assert(spark.sql(s"ANALYZE TABLE graft.`$dir/b` COMPUTE STATISTICS " +
        "FOR ALL COLUMNS").collect()(0).getLong(0) == tb.currentVersion)
      val ndv = ta.columnNdv()
      assert(ndv.get("k_a").exists(n => n > 19000 && n < 21000),
        s"HLL estimate must be ~20000, got $ndv")
      // both filtered dims now estimate ~1 row through distinctCount →
      // both joins pick the dim as a broadcast build side
      assert(staticBhjCount(threeWay()) == 2,
        "NDV stats must qualify both filtered dims for broadcast:\n" +
          threeWay().queryExecution.executedPlan.toString.take(1500))
      // correctness unchanged: exactly the rows matching both filters
      assert(threeWay().count() ==
        (0 until 20000).count(i => i % 20000 == 1234 && i % 17000 == 77))
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", prevCbo)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
    }
  }

  test("scanStats rows subtract deletion-vector cardinality") {
    import spark.implicits._
    val path = graft.GraftTmp.dir("stats_dv").toString
    val t = GraftTable(spark, path)
    t.write((1 to 1000).map(i => (i.toLong, i % 7)).toDF("id", "bucket"))
    val (_, before) = t.scanStats(t.currentVersion, Nil)
    assert(before.contains(1000L))
    t.delete(col("id") <= 250, mergeOnRead = true)
    val (_, after) = t.scanStats(t.currentVersion, Nil)
    assert(after.contains(750L),
      s"row estimate must see through the DV: got $after")
    assert(t.read().count() == 750)
  }
}
