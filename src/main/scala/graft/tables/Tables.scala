package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Readers for the driver-provided testdata tables (TESTDATA.md).
  *
  * Each sf dir holds one parquet file per table. At 100 TB these would be
  * partitioned datasets; `spark.read.parquet` on a directory works
  * identically, so nothing here assumes single-file inputs.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.parquet carries TIMESTAMP(NANOS) which Spark 4 refuses by
    // default; read nanos as Long and convert below. Runtime-settable, so
    // this also covers driver-owned sessions we didn't configure.
    try spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    catch { case _: Throwable => () }
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  def region(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "lineitem")
  /** `ts` lands as Long (epoch nanos) via nanosAsLong; convert to a real
    * timestamp with integer division — epoch-ns (~1.7e18) exceeds double's
    * exact range, so `DIV 1000` (exact long math) → timestamp_micros. This
    * truncation matches DuckDB's own ns→µs conversion of the same files. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = table(spark, dir, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    else raw
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
