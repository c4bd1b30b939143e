package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables._

/** Product-analytics pack over `events`: retention cohorts and an
  * ordered conversion funnel — the two aggregate shapes every
  * warehouse-on-events workload runs.
  *
  * Scale notes: both queries reduce events to per-user aggregates
  * first (one hash shuffle on user_id — the natural key), then join
  * those small per-user frames; nothing ever joins raw-event to
  * raw-event. The funnel's stage-N-after-stage-(N−1) ordering uses
  * conditional min-timestamps rather than window sorts, so each stage
  * is one partial-aggregable pass.
  */
object Cohorts {

  /** Daily retention: for each signup cohort (a user's first active
    * day), how many of its users were active again k days later
    * (k ≤ 7). */
  def retentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    val active = events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val cohorts = active.groupBy("user_id").agg(min("day").as("cohort_day"))
    active.join(cohorts, "user_id")
      .withColumn("offset", datediff(col("day"), col("cohort_day")).cast("int"))
      .filter(col("offset") <= 7)
      .groupBy("cohort_day", "offset")
      .agg(count(lit(1)).as("n_users")) // (user, day) distinct already
      .orderBy("cohort_day", "offset")
  }

  /** Ordered funnel view → click → purchase: a user reaches stage 2
    * only with a click strictly after their first view, stage 3 only
    * with a purchase strictly after that first qualifying click. */
  def funnelSteps(spark: SparkSession, dir: String): DataFrame = {
    val e = events(spark, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("ts_us"))
    val v = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts_us").as("t1"))
    val c = e.join(v, "user_id")
      .filter(col("event_type") === "click" && col("ts_us") > col("t1"))
      .groupBy("user_id").agg(min("ts_us").as("t2"))
    val p = e.join(c, "user_id")
      .filter(col("event_type") === "purchase" && col("ts_us") > col("t2"))
      .groupBy("user_id").agg(min("ts_us").as("t3"))
    // single-row scalar aggregates cross-joined (1-row broadcast, not a
    // driver-side action), unpivoted to one row per stage
    v.agg(count(lit(1)).as("n1"))
      .crossJoin(c.agg(count(lit(1)).as("n2")))
      .crossJoin(p.agg(count(lit(1)).as("n3")))
      .selectExpr(
        """stack(3,
          |  '1_view', n1, 1.0D,
          |  '2_click_after_view', n2, if(n1 = 0, 0.0D, cast(n2 as double) / n1),
          |  '3_purchase_after_click', n3, if(n2 = 0, 0.0D, cast(n3 as double) / n2)
          |) as (stage, n_users, conversion)""".stripMargin)
      .orderBy("stage")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "retention_cohorts" -> retentionCohorts _,
    "funnel_steps" -> funnelSteps _)

  val oracles: Map[String, String] = Map(
    "retention_cohorts" ->
      """WITH a AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |c AS (SELECT user_id, MIN(day) AS cohort_day FROM a GROUP BY user_id)
        |SELECT c.cohort_day,
        |       CAST(date_diff('day', c.cohort_day, a.day) AS INTEGER) AS "offset",
        |       COUNT(*) AS n_users
        |FROM a JOIN c ON a.user_id = c.user_id
        |WHERE date_diff('day', c.cohort_day, a.day) <= 7
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "funnel_steps" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
        |v AS (SELECT user_id, MIN(ts_us) AS t1 FROM e
        |      WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, MIN(e.ts_us) AS t2
        |      FROM e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts_us > v.t1 GROUP BY e.user_id),
        |p AS (SELECT e.user_id, MIN(e.ts_us) AS t3
        |      FROM e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts_us > c.t2 GROUP BY e.user_id),
        |n AS (SELECT (SELECT COUNT(*) FROM v) AS n1,
        |             (SELECT COUNT(*) FROM c) AS n2,
        |             (SELECT COUNT(*) FROM p) AS n3)
        |SELECT stage, n_users, conversion FROM (
        |  SELECT '1_view' AS stage, CAST(n1 AS BIGINT) AS n_users, 1.0 AS conversion FROM n
        |  UNION ALL
        |  SELECT '2_click_after_view', CAST(n2 AS BIGINT),
        |         CASE WHEN n1 = 0 THEN 0.0 ELSE CAST(n2 AS DOUBLE) / n1 END FROM n
        |  UNION ALL
        |  SELECT '3_purchase_after_click', CAST(n3 AS BIGINT),
        |         CASE WHEN n2 = 0 THEN 0.0 ELSE CAST(n3 AS DOUBLE) / n2 END FROM n)
        |ORDER BY stage""".stripMargin)
}
