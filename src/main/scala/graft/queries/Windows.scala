package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.tables.Tables._

/** Window-function surface — the canonical stock-analytics extension the
  * reference motivates but never implements (SURVEY.md §2.7): running
  * aggregates, moving averages, ranking, lag deltas, and the as-of join.
  *
  * Scale notes: every window here partitions by a key (user_id /
  * event_type) — one shuffle on the partition key, then a within-partition
  * sort; no global sort. Window ordering is always (ts, event_id) so ties
  * on the µs-truncated timestamp stay deterministic. Moving averages use
  * round(sum,2)/count over the frame (bit-identical across engines, see
  * Joins doc).
  *
  * The as-of join uses the union+window technique: tag both streams, sort
  * each user's rows by (ts, tag), carry the last view attributes forward
  * with last(..., ignoreNulls), keep the purchase rows. This is a single
  * shuffle on user_id regardless of stream sizes — the scalable plan for
  * "match each trade to the latest quote ≤ its timestamp" (the classic
  * stock as-of semantics), versus a range join that would explode.
  */
object Windows {

  private def byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
  private def byType = Window.partitionBy("event_type").orderBy(col("ts"), col("event_id"))

  /** Running count + running sum per user. */
  def runningTotals(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .withColumn("rn", row_number().over(byUser))
      .withColumn("running_sum",
        round(sum("value").over(byUser.rowsBetween(Window.unboundedPreceding, 0)), 2))
      .select("user_id", "rn", "event_id", "running_sum")
      .orderBy("user_id", "rn")

  /** 7-row moving average per event_type (6 preceding + current). */
  def movingAvg(spark: SparkSession, dir: String): DataFrame = {
    val frame = byType.rowsBetween(-6, 0)
    events(spark, dir)
      .withColumn("mov_avg",
        round(sum("value").over(frame), 2) / count(lit(1)).over(frame))
      .select("event_type", "event_id", "mov_avg")
      .orderBy("event_type", "event_id")
  }

  /** Top-3 events by value within each type (ranking + filter). */
  def top3PerType(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .withColumn("rk",
        row_number().over(Window.partitionBy("event_type")
          .orderBy(desc("value"), col("event_id"))))
      .filter(col("rk") <= 3)
      .select("event_type", "rk", "event_id", "value")
      .orderBy("event_type", "rk")

  /** Per-user delta vs previous event (lag). */
  def lagDelta(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .withColumn("prev_value", lag("value", 1).over(byUser))
      .withColumn("delta", round(col("value") - col("prev_value"), 2))
      .select("user_id", "event_id", "value", "prev_value", "delta")
      .orderBy("user_id", "event_id")

  /** As-of join: each purchase matched to the user's latest view at or
    * before the purchase timestamp (union + last-ignoreNulls window). */
  def asofPurchaseView(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), lit(0).as("tag"),
        col("event_id").as("view_id"), col("value").as("view_value"),
        lit(null).cast("long").as("event_id"), lit(null).cast("double").as("value"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), lit(1).as("tag"),
        lit(null).cast("long").as("view_id"), lit(null).cast("double").as("view_value"),
        col("event_id"), col("value"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("tag"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    views.unionByName(purchases)
      .withColumn("matched_view_id", last("view_id", ignoreNulls = true).over(w))
      .withColumn("matched_view_value", last("view_value", ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select(
        col("event_id"), col("user_id"),
        to_date(col("ts")).as("purchase_date"),
        col("value").as("purchase_value"),
        col("matched_view_id"),
        round(col("value") - col("matched_view_value"), 2).as("value_delta"))
      .orderBy("event_id")
  }

  /** As-of join with tolerance: a matched view older than `TolUs` is
    * nulled out (classic max-staleness semantics; DuckDB's ASOF JOIN has
    * no tolerance parameter, so the oracle post-filters with CASE). */
  val TolUs: Long = 6L * 3600 * 1000000 // 6 hours

  def asofTolerance(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), lit(0).as("tag"),
        col("event_id").as("view_id"),
        lit(null).cast("long").as("event_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), lit(1).as("tag"),
        lit(null).cast("long").as("view_id"), col("event_id"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("tag"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    views.unionByName(purchases)
      .withColumn("m_view_id", last("view_id", ignoreNulls = true).over(w))
      .withColumn("m_view_ts",
        last(when(col("tag") === 0, col("ts")), ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .withColumn("stale",
        unix_micros(col("ts")) - unix_micros(col("m_view_ts")) > TolUs)
      .select(
        col("event_id"), col("user_id"),
        when(col("stale") || col("m_view_id").isNull, lit(null).cast("long"))
          .otherwise(col("m_view_id")).as("matched_view_id"),
        when(col("stale") || col("m_view_id").isNull, lit(null).cast("long"))
          .otherwise(unix_micros(col("ts")) - unix_micros(col("m_view_ts")))
          .as("staleness_us"))
      .orderBy("event_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "running_totals"     -> runningTotals _,
    "moving_avg"         -> movingAvg _,
    "top3_per_type"      -> top3PerType _,
    "lag_delta"          -> lagDelta _,
    "asof_purchase_view" -> asofPurchaseView _,
    "asof_tolerance"     -> asofTolerance _)

  val oracles: Map[String, String] = Map(
    "running_totals" ->
      """SELECT user_id,
        |       CAST(ROW_NUMBER() OVER w AS INTEGER) AS rn, event_id,
        |       ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_sum
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, rn""".stripMargin,
    "moving_avg" ->
      """SELECT event_type, event_id,
        |       ROUND(SUM(value) OVER w, 2) / COUNT(*) OVER w AS mov_avg
        |FROM events
        |WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
        |             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY event_type, event_id""".stripMargin,
    "top3_per_type" ->
      """SELECT event_type, rk, event_id, value FROM (
        |  SELECT event_type, event_id, value,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY event_type
        |           ORDER BY value DESC, event_id) AS INTEGER) AS rk
        |  FROM events) WHERE rk <= 3
        |ORDER BY event_type, rk""".stripMargin,
    "lag_delta" ->
      """SELECT user_id, event_id, value,
        |       LAG(value, 1) OVER w AS prev_value,
        |       ROUND(value - LAG(value, 1) OVER w, 2) AS delta
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, event_id""".stripMargin,
    "asof_purchase_view" ->
      """SELECT t.event_id, t.user_id, CAST(t.ts AS DATE) AS purchase_date,
        |       t.value AS purchase_value,
        |       v.event_id AS matched_view_id,
        |       ROUND(t.value - v.value, 2) AS value_delta
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') t
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
        |  ON t.user_id = v.user_id AND t.ts >= v.ts
        |ORDER BY t.event_id""".stripMargin,
    "asof_tolerance" ->
      """SELECT t.event_id, t.user_id,
        |       CASE WHEN epoch_us(t.ts) - epoch_us(v.ts) <= 21600000000
        |            THEN v.event_id ELSE NULL END AS matched_view_id,
        |       CASE WHEN epoch_us(t.ts) - epoch_us(v.ts) <= 21600000000
        |            THEN epoch_us(t.ts) - epoch_us(v.ts) ELSE NULL END AS staleness_us
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') t
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
        |  ON t.user_id = v.user_id AND t.ts >= v.ts
        |ORDER BY t.event_id""".stripMargin)
}
