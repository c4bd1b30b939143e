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

  /** Scale-adaptive parallelism guard for CPU-heavy in-scan work
    * (optimization guide §2.5 input skew, §1.2 "the distributed
    * algorithm first"): the sf fixtures are single-row-group parquet
    * files, so a bare scan plans ONE task and every expensive per-row
    * kernel above it (md5 sketches, shingle explodes, tokenizers, IVF
    * assignment) runs on one core of local[N] while N−1 idle. When the
    * scan's actual split count is below the session's parallelism,
    * redistribute by `key` (deterministic hash — safe under retries,
    * §2.5) before the heavy work; when the input already carries at
    * least one split per core — every real multi-file dataset, and any
    * 100 TB table — this returns `df` UNCHANGED, so no extra exchange
    * ever reaches a production plan. Apply ONLY above kernel/explode
    * work whose cost dominates the row bytes moved: for plain
    * scan→aggregate queries the exchange would ship raw rows for no
    * CPU win. */
  def spread(df: DataFrame, key: org.apache.spark.sql.Column,
      minBytesPerCore: Long = 0L): DataFrame = {
    val sc = df.sparkSession.sparkContext
    val parts = df.rdd.getNumPartitions
    if (parts * 2 >= sc.defaultParallelism) return df
    // volume gate for MODERATE per-byte kernels (vector math, token
    // splits): below `minBytesPerCore` of input per core the exchange +
    // 32-task scheduling costs more than the serialized kernel (bench-
    // measured: +0.3-0.7 s per query at the 2.5 MB sf0.1 fixtures),
    // while at the sf1/sf10 decades the same sites win. md5-class
    // kernels (~200 ops/byte) pass 0 — they win even on MB-sized input.
    if (minBytesPerCore > 0L) {
      val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
      if (est < BigInt(minBytesPerCore) * sc.defaultParallelism) return df
    }
    // partition count pinned (derived from the session's cores, never a
    // constant): an unpinned repartition(key) is AQE-coalescible, and
    // with KB-sized inputs AQE folds it straight back to one partition —
    // re-serializing the very kernel work this exchange exists to spread
    df.repartition(sc.defaultParallelism, key)
  }
}
