package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.tables.Tables._

/** Time-series resampling — the reference's actual domain (minute bars →
  * daily rollups, stock_harvester.py's OHLCV schema) generalized to the
  * events stream: OHLC resampling (first/last/min/max per bucket) and
  * grid gap-filling with forward fill.
  *
  * Open/close use row_number over (ts, event_id) — an argmin/argmax with
  * a total tie-break, engine-independent. Forward fill uses the
  * standard "cumulative count of non-nulls" grouping trick (COUNT(col)
  * ignores nulls) + MAX over the derived group — both expressible
  * identically in Spark and DuckDB, no IGNORE NULLS dialect needed.
  *
  * Scale: ohlc_daily is one shuffle on (event_type, day) — both window
  * passes and the final aggregate share it (two in-partition sorts, no
  * extra exchange). gap_fill joins a generated in-memory grid (types ×
  * hours — tiny, broadcast) against the hourly aggregate, then one
  * window pass per type; the grid never touches the fact shuffle.
  */
object TimeSeries {

  /** Daily OHLC + volume per event_type. */
  def ohlcDaily(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir).withColumn("day", to_date(col("ts")))
    val part = Window.partitionBy("event_type", "day")
    val asc = part.orderBy(col("ts").asc, col("event_id").asc)
    val desc = part.orderBy(col("ts").desc, col("event_id").desc)
    ev
      .withColumn("rn_a", row_number().over(asc))
      .withColumn("rn_d", row_number().over(desc))
      .groupBy("event_type", "day")
      .agg(
        max(when(col("rn_a") === 1, col("value"))).as("open"),
        max("value").as("high"),
        min("value").as("low"),
        max(when(col("rn_d") === 1, col("value"))).as("close"),
        count(lit(1)).as("n_bars"),
        round(sum("value"), 2).as("total"))
      .orderBy("event_type", "day")
  }

  /** Hourly grid per event_type over the data's fixed range; empty hours
    * get cnt=0 and carry the last observed hourly total forward. */
  def gapFillHourly(spark: SparkSession, dir: String): DataFrame = {
    val grid = spark.range(1).select(explode(sequence(
      lit("2024-01-01 00:00:00").cast("timestamp"),
      lit("2024-01-30 23:00:00").cast("timestamp"),
      expr("INTERVAL 1 HOUR"))).as("hr"))
    val types = events(spark, dir).select("event_type").distinct()
    val hourly = events(spark, dir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("hr_total"))
    val byType = Window.partitionBy("event_type").orderBy("hr")
    types.crossJoin(grid)
      .join(hourly, Seq("event_type", "hr"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
      // COUNT(col) skips nulls → every gap row shares its predecessor's
      // group id; MAX over that group is the forward-filled value
      .withColumn("grp", count(col("hr_total"))
        .over(byType.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("filled_total",
        max("hr_total").over(Window.partitionBy("event_type", "grp")))
      .select(col("event_type"), unix_micros(col("hr")).as("hr_us"),
        col("cnt"), col("hr_total"), col("filled_total"))
      .orderBy("event_type", "hr_us")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ohlc_daily"      -> ohlcDaily _,
    "gap_fill_hourly" -> gapFillHourly _)

  val oracles: Map[String, String] = Map(
    "ohlc_daily" ->
      """WITH e AS (SELECT event_type, CAST(ts AS DATE) AS day, ts, event_id, value
        |           FROM events),
        |r AS (SELECT *,
        |        ROW_NUMBER() OVER (PARTITION BY event_type, day
        |          ORDER BY ts, event_id) AS rn_a,
        |        ROW_NUMBER() OVER (PARTITION BY event_type, day
        |          ORDER BY ts DESC, event_id DESC) AS rn_d
        |      FROM e)
        |SELECT event_type, day,
        |       MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
        |       MAX(value) AS high, MIN(value) AS low,
        |       MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
        |       COUNT(*) AS n_bars, ROUND(SUM(value), 2) AS total
        |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "gap_fill_hourly" ->
      """WITH grid AS (SELECT unnest(generate_series(
        |                TIMESTAMP '2024-01-01 00:00:00',
        |                TIMESTAMP '2024-01-30 23:00:00',
        |                INTERVAL 1 HOUR)) AS hr),
        |t AS (SELECT DISTINCT event_type FROM events),
        |a AS (SELECT event_type, date_trunc('hour', ts) AS hr,
        |             COUNT(*) AS cnt, ROUND(SUM(value), 2) AS hr_total
        |      FROM events GROUP BY 1, 2),
        |j AS (SELECT t.event_type, grid.hr,
        |             COALESCE(a.cnt, 0) AS cnt, a.hr_total
        |      FROM t CROSS JOIN grid
        |      LEFT JOIN a ON a.event_type = t.event_type AND a.hr = grid.hr),
        |g AS (SELECT *, COUNT(hr_total) OVER (PARTITION BY event_type
        |        ORDER BY hr ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
        |      FROM j)
        |SELECT event_type, epoch_us(hr) AS hr_us, cnt, hr_total,
        |       MAX(hr_total) OVER (PARTITION BY event_type, grp) AS filled_total
        |FROM g ORDER BY event_type, hr_us""".stripMargin)
}
