package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.tables.Tables._

/** Ranking / frame window surface beyond Windows.scala: NTILE bucketing,
  * the rank family (rank / dense_rank / percent_rank / cume_dist) over a
  * tie-heavy key, and explicit ROWS / RANGE frames with first / last /
  * nth_value.
  *
  * Parity discipline: tie-producing keys are built with FLOOR division
  * (identical in both engines) rather than round-half-up; percent_rank
  * and cume_dist are exact integer ratios → IEEE-identical doubles.
  * Scale: every window partitions by a key (event_type / user_id) — one
  * hash shuffle, per-partition sort, no global order until the final
  * output orderBy.
  */
object Ranking {

  /** NTILE(4) quartiles per event_type, then per-bucket aggregates. */
  def ntileBuckets(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy(col("value"), col("event_id"))
    events(spark, dir)
      .withColumn("quartile", ntile(4).over(w))
      .groupBy("event_type", "quartile")
      .agg(
        count(lit(1)).as("cnt"),
        round(sum("value"), 2).as("total"),
        min("value").as("min_value"),
        max("value").as("max_value"))
      .orderBy("event_type", "quartile")
  }

  /** rank / dense_rank / percent_rank / cume_dist over a coarse (tied)
    * key — pins tie semantics of all four against DuckDB. */
  def rankFamily(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy(desc("bucket"))
    events(spark, dir)
      .withColumn("bucket", floor(col("value") / 10).cast("int"))
      .withColumn("rk", rank().over(w))
      .withColumn("drk", dense_rank().over(w))
      .withColumn("prk", percent_rank().over(w))
      .withColumn("cd", cume_dist().over(w))
      .select("event_type", "event_id", "bucket", "rk", "drk", "prk", "cd")
      .orderBy("event_type", "rk", "event_id")
  }

  /** Explicit frames: RANGE (trailing 1 h by epoch-seconds) and full-
    * partition ROWS with first / last / nth_value. */
  def windowFrames(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
      .withColumn("ts_s", expr("unix_micros(ts) DIV 1000000"))
    val range1h = Window.partitionBy("user_id").orderBy("ts_s")
      .rangeBetween(-3600, 0)
    val full = Window.partitionBy("user_id").orderBy(col("ts_s"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ev
      .withColumn("cnt_1h", count(lit(1)).over(range1h))
      .withColumn("sum_1h", round(sum("value").over(range1h), 2))
      .withColumn("first_ev", first("event_id").over(full))
      .withColumn("last_ev", last("event_id").over(full))
      .withColumn("second_ev", nth_value(col("event_id"), 2).over(full))
      .select("user_id", "event_id", "ts_s", "cnt_1h", "sum_1h",
        "first_ev", "last_ev", "second_ev")
      .orderBy("user_id", "event_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ntile_buckets" -> ntileBuckets _,
    "rank_family"   -> rankFamily _,
    "window_frames" -> windowFrames _)

  val oracles: Map[String, String] = Map(
    "ntile_buckets" ->
      """SELECT event_type, quartile, COUNT(*) AS cnt,
        |       ROUND(SUM(value), 2) AS total,
        |       MIN(value) AS min_value, MAX(value) AS max_value
        |FROM (SELECT event_type, value,
        |             CAST(NTILE(4) OVER (PARTITION BY event_type
        |               ORDER BY value, event_id) AS INTEGER) AS quartile
        |      FROM events)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "rank_family" ->
      """SELECT event_type, event_id, bucket,
        |       CAST(RANK() OVER w AS INTEGER) AS rk,
        |       CAST(DENSE_RANK() OVER w AS INTEGER) AS drk,
        |       PERCENT_RANK() OVER w AS prk,
        |       CUME_DIST() OVER w AS cd
        |FROM (SELECT event_type, event_id,
        |             CAST(FLOOR(value / 10) AS INTEGER) AS bucket FROM events)
        |WINDOW w AS (PARTITION BY event_type ORDER BY bucket DESC)
        |ORDER BY event_type, rk, event_id""".stripMargin,
    "window_frames" ->
      """SELECT user_id, event_id, ts_s,
        |       COUNT(*) OVER r AS cnt_1h,
        |       ROUND(SUM(value) OVER r, 2) AS sum_1h,
        |       FIRST_VALUE(event_id) OVER f AS first_ev,
        |       LAST_VALUE(event_id) OVER f AS last_ev,
        |       NTH_VALUE(event_id, 2) OVER f AS second_ev
        |FROM (SELECT user_id, event_id, value,
        |             epoch_us(ts) // 1000000 AS ts_s FROM events)
        |WINDOW r AS (PARTITION BY user_id ORDER BY ts_s
        |             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW),
        |       f AS (PARTITION BY user_id ORDER BY ts_s, event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY user_id, event_id""".stripMargin)
}
