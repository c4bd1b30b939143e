package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.EqualTo
import graft.table.{BloomIndex, GraftTable}
import graft.tables.Tables._

/** Point lookups through the bloom-filter file index.
  *
  * The reference's consumers do key lookups against Delta tables
  * (`stock_harvester.py`'s per-ticker reads); at 100 TB a point probe
  * on a high-cardinality key must NOT open every file whose [min, max]
  * happens to span the key. This query seeds a graft table from the
  * orders table ROUND-ROBIN'd into interleaved files — every file's
  * interval spans every key, so min/max skipping proves nothing — then
  * answers a batch of single-key lookups through the indexed scan.
  * An engine-side guard asserts the index actually pruned the file
  * list per probe; the DuckDB oracle replays the same lookups over the
  * raw parquet, proving the pruned scans lost no rows.
  */
object Indexing {

  /** Probe offsets into the ordered key list — spread across the key
    * domain so each probe lands in a different data file. The oracle
    * selects the same keys with `LIMIT 1 OFFSET n`. */
  private val ProbeOffsets = Seq(10, 100, 400, 800, 1200)
  private val NumFiles = 8

  def indexedLookup(spark: SparkSession, dir: String): DataFrame = {
    val base = graft.GraftTmp.dir("graft_bloom_lookup").toString
    val src = orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        round(col("o_totalprice"), 2).as("price"))
    val t = GraftTable(spark, base)
    t.write(src.repartition(NumFiles))
    t.setProperties(Map(BloomIndex.ColumnsProp -> "o_orderkey"))
    t.buildBloomIndex()

    val keys = src.select("o_orderkey").orderBy("o_orderkey")
      .limit(ProbeOffsets.max + 1).collect().map(_.getLong(0))
    val probes = ProbeOffsets.map(keys(_))

    // the scale property under test: each single-key probe keeps ~1 of
    // the interleaved files (fpp survivors allowed), where interval
    // stats alone would keep all of them
    val v = t.currentVersion
    val kept = probes.map(k =>
      t.dataSkippedFiles(v, Seq(EqualTo("o_orderkey", k))).size)
    require(kept.sum <= probes.size * 3,
      s"bloom index failed to prune interleaved files: kept $kept of $NumFiles each")

    val reader = spark.read.format("graft").load(base)
    probes.map(k => reader.filter(col("o_orderkey") === k))
      .reduce(_.unionAll(_))
      .orderBy("o_orderkey")
  }

  /** Time-range scan through timestamp footer-stats file pruning: seed a
    * graft table from lineitem range-partitioned by l_shipdate (files
    * cover disjoint time slices, like any time-ordered ingest), then
    * aggregate a six-month window through the pruned scan. The engine
    * guard asserts the window kept a fraction of the files — at 100 TB
    * this is the difference between scanning seven years and scanning
    * the months asked for. The oracle replays the window over the raw
    * parquet. */
  def prunedTimeScan(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.sources.{GreaterThanOrEqual, LessThan}
    val base = graft.GraftTmp.dir("graft_time_scan").toString
    val t = GraftTable(spark, base)
    val src = lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"),
        col("l_shipdate"))
    t.write(src.repartitionByRange(8, col("l_shipdate"))
      .sortWithinPartitions("l_shipdate"))

    val lo = java.time.LocalDateTime.of(1997, 1, 1, 0, 0)
    val hi = java.time.LocalDateTime.of(1997, 7, 1, 0, 0)
    val v = t.currentVersion
    val kept = t.dataSkippedFiles(v,
      Seq(GreaterThanOrEqual("l_shipdate", lo), LessThan("l_shipdate", hi)))
    require(kept.size <= 4,
      s"timestamp stats must prune a six-month window to a few of 8 " +
      s"time-sliced files, kept ${kept.size}")

    spark.read.format("graft").load(base)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp_ntz") &&
        col("l_shipdate") < lit("1997-07-01").cast("timestamp_ntz"))
      .groupBy(month(col("l_shipdate")).as("m"))
      .agg(count(lit(1)).as("n"),
        round(sum("l_quantity"), 2).as("qty"),
        round(sum("l_extendedprice"), 2).as("revenue"))
      .orderBy("m")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "indexed_lookup" -> indexedLookup _,
    "pruned_time_scan" -> prunedTimeScan _)

  val oracles: Map[String, String] = Map(
    "indexed_lookup" -> {
      val keySelects = ProbeOffsets.map(n =>
        s"SELECT o_orderkey FROM (SELECT o_orderkey FROM orders " +
          s"ORDER BY o_orderkey LIMIT 1 OFFSET $n)")
        .mkString("\n      UNION ALL ")
      s"""WITH k AS (
         |      $keySelects)
         |SELECT o.o_orderkey, o.o_custkey, o.o_orderstatus,
         |       ROUND(o.o_totalprice, 2) AS price
         |FROM orders o JOIN k USING (o_orderkey)
         |ORDER BY o_orderkey""".stripMargin
    },
    "pruned_time_scan" ->
      """SELECT CAST(month(l_shipdate) AS INTEGER) AS m,
        |       COUNT(*) AS n,
        |       ROUND(SUM(l_quantity), 2) AS qty,
        |       ROUND(SUM(l_extendedprice), 2) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-07-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin)
}
