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
  /** `ts` normalization across the encodings the driver has shipped:
    *  - TIMESTAMP(NANOS) read as Long under nanosAsLong → exact integer
    *    `DIV 1000` to micros (epoch-ns ~1.7e18 exceeds double's exact
    *    range) — matches DuckDB's own ns→µs conversion;
    *  - timestamp[us] with isAdjustedToUTC=false (inferred TIMESTAMP_NTZ)
    *    → cast to session-zone timestamp; sessions here run UTC, so the
    *    wall-clock values keep the same epoch meaning DuckDB reads. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
