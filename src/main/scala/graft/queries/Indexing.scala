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
    val base = Files.createTempDirectory("graft_bloom_lookup").toString
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "indexed_lookup" -> indexedLookup _)

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
    })
}
