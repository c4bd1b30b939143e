package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.tables.Tables._

/** Statistical aggregation surface: sample variance / stddev / Pearson
  * correlation via explicit moment sums, mode, boolean aggregates, and
  * ordered string aggregation.
  *
  * Parity discipline: built-in stddev/corr accumulate doubles in
  * partition order, so their last bits differ between engines. Instead
  * each statistic is composed from grid-rounded moment sums
  * (sum x @ 2, sum x² @ 4 — the data's decimal grids) with the SAME
  * arithmetic expression on both sides: identical exact inputs →
  * bit-identical IEEE results, no tolerance needed. Integer moments
  * (hour sums) are exact outright.
  *
  * Scale: all are single-shuffle partial aggregations; the mode query
  * adds one narrow window over the (group, bucket) aggregate — tiny
  * relative to the scan.
  */
object Stats {

  /** n / mean / sample variance / stddev per event_type from rounded
    * moment sums. */
  def statsMoments(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        round(sum("value"), 2).as("sx"),
        round(sum(col("value") * col("value")), 4).as("sx2"))
      .withColumn("mean", col("sx") / col("n"))
      .withColumn("svar",
        (col("sx2") - col("sx") * col("sx") / col("n")) / (col("n") - 1))
      .withColumn("sd", sqrt(col("svar")))
      .select("event_type", "n", "mean", "svar", "sd")
      .orderBy("event_type")

  /** Pearson correlation between value and hour-of-day, from exact /
    * grid-rounded moments (cross moment at the value grid). */
  def corrValueHour(spark: SparkSession, dir: String): DataFrame = {
    val h = hour(col("ts"))
    events(spark, dir)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        round(sum("value"), 2).as("sx"),
        sum(h).as("sy"),
        round(sum(col("value") * h), 2).as("sxy"),
        round(sum(col("value") * col("value")), 4).as("sx2"),
        sum(h * h).as("sy2"))
      .withColumn("corr_vh",
        (col("n") * col("sxy") - col("sx") * col("sy")) /
          (sqrt(col("n") * col("sx2") - col("sx") * col("sx")) *
            sqrt((col("n") * col("sy2") - col("sy") * col("sy")).cast("double"))))
      .select("event_type", "n", "corr_vh")
      .orderBy("event_type")
  }

  /** Mode of the integer value bucket per event_type — deterministic
    * tie-break (smallest bucket wins). */
  def modeValue(spark: SparkSession, dir: String): DataFrame = {
    val counts = events(spark, dir)
      .withColumn("bucket", floor(col("value")).cast("int"))
      .groupBy("event_type", "bucket")
      .agg(count(lit(1)).as("cnt"))
    counts
      .withColumn("rn", row_number().over(
        Window.partitionBy("event_type").orderBy(desc("cnt"), col("bucket"))))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("bucket").as("mode_bucket"), col("cnt"))
      .orderBy("event_type")
  }

  /** count_if / bool_and / bool_or per event_type. */
  def boolAggs(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        count_if(col("value") > 150).as("n_high"),
        bool_and(col("value") >= 0).as("all_nonneg"),
        bool_or(col("value") > 290).as("any_extreme"))
      .orderBy("event_type")

  /** Ordered string aggregation of each type's distinct users. */
  def stringAggUsers(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .select(col("event_type"), col("user_id").cast("string").as("u"))
      .distinct()
      .groupBy("event_type")
      .agg(
        array_join(array_sort(collect_list("u")), ",").as("users"),
        count(lit(1)).as("n_users"))
      .orderBy("event_type")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stats_moments"    -> statsMoments _,
    "corr_value_hour"  -> corrValueHour _,
    "mode_value"       -> modeValue _,
    "bool_aggs"        -> boolAggs _,
    "string_agg_users" -> stringAggUsers _)

  val oracles: Map[String, String] = Map(
    "stats_moments" ->
      """WITH a AS (SELECT event_type, COUNT(*) AS n,
        |                  ROUND(SUM(value), 2) AS sx,
        |                  ROUND(SUM(value * value), 4) AS sx2
        |           FROM events GROUP BY 1)
        |SELECT event_type, n, sx / n AS mean,
        |       (sx2 - sx * sx / n) / (n - 1) AS svar,
        |       SQRT((sx2 - sx * sx / n) / (n - 1)) AS sd
        |FROM a ORDER BY event_type""".stripMargin,
    "corr_value_hour" ->
      """WITH a AS (SELECT event_type, COUNT(*) AS n,
        |                  ROUND(SUM(value), 2) AS sx,
        |                  CAST(SUM(hour(ts)) AS BIGINT) AS sy,
        |                  ROUND(SUM(value * hour(ts)), 2) AS sxy,
        |                  ROUND(SUM(value * value), 4) AS sx2,
        |                  CAST(SUM(hour(ts) * hour(ts)) AS BIGINT) AS sy2
        |           FROM events GROUP BY 1)
        |SELECT event_type, n,
        |       (n * sxy - sx * sy) /
        |         (SQRT(n * sx2 - sx * sx) * SQRT(CAST(n * sy2 - sy * sy AS DOUBLE)))
        |         AS corr_vh
        |FROM a ORDER BY event_type""".stripMargin,
    "mode_value" ->
      """WITH c AS (SELECT event_type, CAST(FLOOR(value) AS INTEGER) AS bucket,
        |                  COUNT(*) AS cnt
        |           FROM events GROUP BY 1, 2),
        |     r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
        |                       ORDER BY cnt DESC, bucket) AS rn FROM c)
        |SELECT event_type, bucket AS mode_bucket, cnt FROM r WHERE rn = 1
        |ORDER BY event_type""".stripMargin,
    "bool_aggs" ->
      """SELECT event_type, COUNT(*) AS n,
        |       COUNT(*) FILTER (WHERE value > 150) AS n_high,
        |       BOOL_AND(value >= 0) AS all_nonneg,
        |       BOOL_OR(value > 290) AS any_extreme
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "string_agg_users" ->
      """WITH d AS (SELECT DISTINCT event_type, CAST(user_id AS VARCHAR) AS u
        |           FROM events)
        |SELECT event_type, STRING_AGG(u, ',' ORDER BY u) AS users,
        |       COUNT(*) AS n_users
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin)
}
