package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.table.GraftTable
import graft.tables.Tables

/** Sync-shaped MERGE over testdata (the Delta `WHEN NOT MATCHED BY
  * SOURCE` flow a warehouse sync runs nightly): the target table is
  * seeded from `orders`, the source is the "current" snapshot (open
  * orders, reforecast price), and one MERGE statement reconciles —
  * matched rows take the source price, target rows absent from the
  * source are retired (small ones deleted, large ones flagged). Unlike
  * the bar-table mutation queries this one derives from a testdata
  * table, so the END STATE is relationally expressible and DuckDB
  * hash-verifies the whole clause algebra (matched update + conditional
  * NOT MATCHED BY SOURCE delete + fallback NOT MATCHED BY SOURCE
  * update) rather than a rows-only count.
  */
object MergeOps {

  def mergeSync(spark: SparkSession, dir: String): DataFrame = {
    val path = graft.GraftTmp.dir("graft_merge_sync")
    try {
      val t = GraftTable(spark, path.toString)
      val seed = Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice").cast("double").as("o_totalprice"))
        .withColumn("state", lit("active"))
      t.write(seed.repartition(4))
      // current snapshot: open orders only, price doubled (×2 is exact in
      // binary, so round-to-2-decimals never lands on a HALF_UP/.005
      // boundary where Spark and DuckDB round differently; ×1.1 did)
      val source = seed.filter(col("o_orderstatus") === "O")
        .withColumn("o_totalprice", col("o_totalprice") * 2)
      t.mergeInto(source, Seq("o_orderkey"))
        .whenMatchedUpdate(Map("o_totalprice" -> col("source.o_totalprice")))
        .whenNotMatchedBySourceDelete(col("target.o_totalprice") < 100000)
        .whenNotMatchedBySourceUpdate(Map("state" -> lit("retired")))
        .execute()
      val out = t.read()
        .select(col("o_orderkey"),
          round(col("o_totalprice"), 2).as("price"),
          col("state"))
      // materialize before the temp table goes out of scope — via a
      // JVM-lifetime parquet dump, not a driver collect; the total order
      // goes on the RETURNED frame (the driver sorts-and-hashes what
      // this plan produces)
      Materialize.beyondSource(out, "graft_merge_sync_out")
        .orderBy("o_orderkey")
    } finally {
      scala.util.Try(
        org.apache.commons.io.FileUtils.deleteDirectory(path.toFile))
    }
  }

  /** Arbitrary-condition MERGE: differently-named keys plus a residual.
    * The target is seeded from `orders` under renamed columns; the
    * source carries the ORIGINAL column names, so the merge condition
    * `target.okey = source.o_orderkey AND source.o_totalprice >= 200000`
    * exercises both the key-pair decomposition and the residual path.
    * Matched rows (open orders whose doubled price clears the residual)
    * take that price; key-matched rows failing it stay untouched. */
  def mergeCond(spark: SparkSession, dir: String): DataFrame = {
    val path = graft.GraftTmp.dir("graft_merge_cond")
    try {
      val t = GraftTable(spark, path.toString)
      val orders = Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice").cast("double").as("o_totalprice"))
      val seed = orders.select(col("o_orderkey").as("okey"),
        col("o_orderstatus").as("status"),
        col("o_totalprice").as("price"))
      t.write(seed.repartition(4))
      val source = orders.filter(col("o_orderstatus") === "O")
        .withColumn("o_totalprice", col("o_totalprice") * 2)
      t.mergeInto(source,
          col("target.okey") === col("source.o_orderkey") &&
          col("source.o_totalprice") >= 200000)
        .whenMatchedUpdate(Map("price" -> col("source.o_totalprice")))
        .execute()
      val out = t.read()
        .select(col("okey"), col("status"),
          round(col("price"), 2).as("price"))
      Materialize.beyondSource(out, "graft_merge_cond_out")
        .orderBy("okey")
    } finally {
      scala.util.Try(
        org.apache.commons.io.FileUtils.deleteDirectory(path.toFile))
    }
  }

  /** Targeted overwrite (Delta `replaceWhere`): seed from `orders`
    * hive-partitioned by status, then (1) replace the 'O' partition
    * wholesale via the partition-predicate fast path — files resolved
    * from hive paths alone, nothing read — and (2) replace a
    * key-derived row slice via the data-predicate path — only files
    * holding matching rows rewritten, their other rows kept. The end
    * state is relational, so DuckDB hash-verifies both paths. */
  def replaceWhere(spark: SparkSession, dir: String): DataFrame = {
    val path = graft.GraftTmp.dir("graft_replace_where")
    try {
      val t = GraftTable(spark, path.toString, Seq("status"))
      val seed = Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_orderstatus").as("status"),
          col("o_totalprice").cast("double").as("price"))
      t.write(seed.repartition(4))
      // partition fast path: swap the whole 'O' slice, prices doubled
      t.write(seed.filter(col("status") === "O")
          .withColumn("price", col("price") * 2),
        org.apache.spark.sql.SaveMode.Overwrite,
        replaceWhere = Some("status = 'O'"))
      // data-predicate path: +1 on a key-derived slice across partitions
      t.write(t.read().filter(col("o_orderkey") % 10 === 3)
          .withColumn("price", col("price") + 1),
        org.apache.spark.sql.SaveMode.Overwrite,
        replaceWhere = Some("o_orderkey % 10 = 3"))
      val out = t.read()
        .select(col("o_orderkey"), col("status"),
          round(col("price"), 2).as("price"))
      Materialize.beyondSource(out, "graft_merge_out")
        .orderBy("o_orderkey")
    } finally {
      scala.util.Try(
        org.apache.commons.io.FileUtils.deleteDirectory(path.toFile))
    }
  }

  /** Dynamic partition overwrite (`partitionOverwriteMode=dynamic`):
    * rewrite ONLY the partitions the incoming frame lands in — here the
    * 'F' slice at tripled price — while untouched partitions carry over
    * unread. */
  def dynamicOverwrite(spark: SparkSession, dir: String): DataFrame = {
    val path = graft.GraftTmp.dir("graft_dyn_overwrite")
    try {
      val t = GraftTable(spark, path.toString, Seq("status"))
      val seed = Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_orderstatus").as("status"),
          col("o_totalprice").cast("double").as("price"))
      t.write(seed.repartition(4))
      t.write(seed.filter(col("status") === "F")
          .withColumn("price", col("price") * 3),
        org.apache.spark.sql.SaveMode.Overwrite,
        dynamicPartitionOverwrite = true)
      val out = t.read()
        .select(col("o_orderkey"), col("status"),
          round(col("price"), 2).as("price"))
      Materialize.beyondSource(out, "graft_merge_out")
        .orderBy("o_orderkey")
    } finally {
      scala.util.Try(
        org.apache.commons.io.FileUtils.deleteDirectory(path.toFile))
    }
  }

  /** Column DEFAULT lifecycle (ANSI/Delta `ALTER COLUMN … SET DEFAULT`):
    * seed 2/3 of `part` with explicit batch/priority values, declare
    * defaults (one through the API, one through the SQL grammar), then
    * append the remaining third OMITTING both columns — the engine
    * completes them from the defaults. The end state is relational:
    * DuckDB re-derives which rows carry defaulted values from the key
    * split alone. */
  def columnDefaults(spark: SparkSession, dir: String): DataFrame = {
    val path = graft.GraftTmp.dir("graft_col_defaults")
    try {
      val t = GraftTable(spark, path.toString)
      val base = Tables.part(spark, dir)
        .select(col("p_partkey"),
          round(col("p_retailprice").cast("double"), 2).as("price"))
      t.write(base.filter(col("p_partkey") % 3 =!= 0)
        .withColumn("batch", lit("old"))
        .withColumn("priority", (col("p_partkey") % 5).cast("int"))
        .repartition(4))
      // both through the API — the SQL grammar form needs the session
      // extension, which the driver's bare Verify session doesn't
      // install; DefaultsSpec exercises the parser path
      t.setColumnDefault("priority", "9")
      t.setColumnDefault("batch", "'backfill'")
      t.write(base.filter(col("p_partkey") % 3 === 0),
        org.apache.spark.sql.SaveMode.Append)
      val out = t.read()
        .select(col("p_partkey"), col("price"), col("batch"), col("priority"))
      Materialize.beyondSource(out, "graft_col_defaults_out")
        .orderBy("p_partkey")
    } finally {
      scala.util.Try(
        org.apache.commons.io.FileUtils.deleteDirectory(path.toFile))
    }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "merge_sync" -> mergeSync _,
    "merge_cond" -> mergeCond _,
    "replace_where" -> replaceWhere _,
    "dynamic_overwrite" -> dynamicOverwrite _,
    "column_defaults" -> columnDefaults _)

  val oracles: Map[String, String] = Map(
    "column_defaults" ->
      """SELECT p_partkey,
        |       round(CAST(p_retailprice AS DOUBLE), 2) AS price,
        |       CASE WHEN p_partkey % 3 = 0 THEN 'backfill' ELSE 'old' END
        |         AS batch,
        |       CAST(CASE WHEN p_partkey % 3 = 0 THEN 9
        |                 ELSE p_partkey % 5 END AS INTEGER) AS priority
        |FROM part
        |ORDER BY p_partkey""".stripMargin,
    "replace_where" ->
      """SELECT o_orderkey,
        |       o_orderstatus AS status,
        |       round(CASE WHEN o_orderstatus = 'O'
        |                  THEN CAST(o_totalprice AS DOUBLE) * 2
        |                  ELSE CAST(o_totalprice AS DOUBLE) END
        |             + CASE WHEN o_orderkey % 10 = 3 THEN 1 ELSE 0 END,
        |             2) AS price
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,
    "dynamic_overwrite" ->
      """SELECT o_orderkey,
        |       o_orderstatus AS status,
        |       round(CASE WHEN o_orderstatus = 'F'
        |                  THEN CAST(o_totalprice AS DOUBLE) * 3
        |                  ELSE CAST(o_totalprice AS DOUBLE) END, 2) AS price
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,
    "merge_cond" ->
      """SELECT o_orderkey AS okey,
        |       o_orderstatus AS status,
        |       CASE WHEN o_orderstatus = 'O'
        |                 AND CAST(o_totalprice AS DOUBLE) * 2 >= 200000
        |            THEN round(CAST(o_totalprice AS DOUBLE) * 2, 2)
        |            ELSE round(CAST(o_totalprice AS DOUBLE), 2) END AS price
        |FROM orders
        |ORDER BY okey""".stripMargin,
    "merge_sync" ->
      """SELECT o_orderkey,
        |       CASE WHEN o_orderstatus = 'O'
        |            THEN round(CAST(o_totalprice AS DOUBLE) * 2, 2)
        |            ELSE round(CAST(o_totalprice AS DOUBLE), 2) END AS price,
        |       CASE WHEN o_orderstatus = 'O' THEN 'active'
        |            ELSE 'retired' END AS state
        |FROM orders
        |WHERE o_orderstatus = 'O' OR o_totalprice >= 100000
        |ORDER BY o_orderkey""".stripMargin)
}
