package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog surface (D1–D7, external_table.py): register a path-backed
  * dataset as an external table — catalog entry only, data stays at the
  * location, DROP removes the entry not the files
  * (external_table.py:7-14, DESIGN.md:67-78) — with the reference's
  * fallback-to-view dance (external_table.py:71-87) when table creation
  * is unavailable.
  */
object External {

  /** `CREATE TABLE … LOCATION …` (the reference's USING DELTA LOCATION,
    * external_table.py:136-140). Idempotent via DROP IF EXISTS (D1).
    *
    * A path carrying a graft log MUST be registered `USING graft`: the
    * directory physically retains files the log has removed (OPTIMIZE
    * rewrites, DV purges, overwritten partitions) until VACUUM, so a raw
    * parquet scan double-counts. Plain parquet directories register as
    * parquet with hive-partition discovery (MSCK equivalent). */
  def registerExternalTable(spark: SparkSession, name: String, path: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    if (graft.table.GraftTable(spark, path).currentVersion >= 0) {
      spark.sql(s"CREATE TABLE $name USING graft OPTIONS (path '$path')")
    } else {
      spark.sql(s"CREATE TABLE $name USING parquet LOCATION '$path'")
      // partitioned layout → discover hive partitions
      try spark.catalog.recoverPartitions(name)
      catch { case _: Exception => () } // unpartitioned tables have none
    }
  }

  /** Fallback: a view over the path when an external table can't be
    * created (external_table.py:71-87). */
  def registerView(spark: SparkSession, name: String, path: String): Unit = {
    spark.sql(s"DROP VIEW IF EXISTS $name")
    spark.sql(s"CREATE OR REPLACE TEMP VIEW $name AS SELECT * FROM parquet.`$path`")
  }

  /** Register with table-then-view fallback, reporting which was used. */
  def registerWithFallback(spark: SparkSession, name: String, path: String): String =
    try { registerExternalTable(spark, name, path); "table" }
    catch { case _: Exception => registerView(spark, name, path); "view" }

  /** D6: DESCRIBE as a DataFrame. */
  def describe(spark: SparkSession, name: String): DataFrame =
    spark.sql(s"DESCRIBE TABLE $name")
}
