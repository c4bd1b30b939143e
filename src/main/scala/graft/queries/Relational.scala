package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables._

/** Remaining relational surface beyond the reference (§2.7 gap list):
  * set operations, grouping sets (rollup/cube), distinct aggregation,
  * HAVING, and pivot — each with an exact DuckDB oracle. All are
  * single-shuffle shapes at scale (set ops hash-partition both sides on
  * the full row; rollup/cube expand grouping sets before the partial
  * aggregation, so the shuffle still moves partial aggregates only).
  */
object Relational {

  private def week1(spark: SparkSession, dir: String) =
    events(spark, dir).filter(to_date(col("ts")).between("2024-01-01", "2024-01-07"))
  private def week2(spark: SparkSession, dir: String) =
    events(spark, dir).filter(to_date(col("ts")).between("2024-01-08", "2024-01-14"))

  /** UNION / INTERSECT / EXCEPT over weekly active-user sets. */
  def setOpsUsers(spark: SparkSession, dir: String): DataFrame = {
    val u1 = week1(spark, dir).select("user_id").distinct()
    val u2 = week2(spark, dir).select("user_id").distinct()
    u1.intersect(u2).withColumn("op", lit("both"))
      .unionByName(u1.exceptAll(u2).withColumn("op", lit("only_w1")))
      .unionByName(u2.exceptAll(u1).withColumn("op", lit("only_w2")))
      .select("op", "user_id")
      .orderBy("op", "user_id")
  }

  /** ROLLUP (event_type, day-of-week) with grouping_id — subtotals and
    * grand total in one pass. */
  def rollupCounts(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .select(col("event_type"), dayofweek(col("ts")).as("dow"))
      .rollup("event_type", "dow")
      .agg(count(lit(1)).as("cnt"), grouping_id().cast("int").as("gid"))
      .orderBy(col("gid"), col("event_type").asc_nulls_first,
        col("dow").asc_nulls_first)

  /** CUBE over (l_returnflag, l_linestatus). */
  def cubeQuantity(spark: SparkSession, dir: String): DataFrame =
    lineitem(spark, dir)
      .cube("l_returnflag", "l_linestatus")
      .agg(round(sum("l_quantity"), 2).as("sum_qty"),
        count(lit(1)).as("cnt"), grouping_id().cast("int").as("gid"))
      .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  /** Distinct aggregation: exact distinct counts alongside plain ones. */
  def distinctAgg(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy("event_type")
      .agg(
        countDistinct(col("user_id")).as("n_users"),
        countDistinct(to_date(col("ts"))).as("n_days"),
        count(lit(1)).as("n_events"))
      .orderBy("event_type")

  /** GROUP BY … HAVING via post-aggregation filter. */
  def havingFilter(spark: SparkSession, dir: String): DataFrame =
    orders(spark, dir)
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("spend"))
      .filter(col("n_orders") >= 12)
      .orderBy("o_custkey")

  /** Exact linear-interpolation percentiles (Spark `percentile` and
    * DuckDB `quantile_cont` share the definition; interpolation of
    * identical doubles is bit-identical, so outputs go unrounded). */
  def percentiles(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy("event_type")
      .agg(
        expr("percentile(value, 0.25)").as("q25"),
        expr("percentile(value, 0.5)").as("q50"),
        expr("percentile(value, 0.75)").as("q75"))
      .orderBy("event_type")

  /** Approximate distinct count (HLL++) next to the exact count — the
    * scale-path cardinality estimator. The HLL sketch value itself is
    * query emits the exact count plus the BOUND ASSERTION (approx
    * within 10% of exact at rsd=0.02 — a ~5-sigma margin): DuckDB then
    * hash-verifies that Spark's sketch actually met its contract,
    * instead of the query being unverifiable rows-only. */
  def approxDistinct(spark: SparkSession, dir: String): DataFrame =
    lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_orderkey"), rsd = 0.02).as("approx_orders"),
        countDistinct(col("l_orderkey")).as("exact_orders"))
      .select(col("l_returnflag"), col("exact_orders"),
        (abs(col("approx_orders") - col("exact_orders")) <=
          col("exact_orders") * 0.10).as("approx_within_10pct"))
      .orderBy("l_returnflag")

  /** Pivot: per-user event-type counts as columns. */
  def pivotCounts(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy("user_id")
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("user_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "setops_users"  -> setOpsUsers _,
    "rollup_counts" -> rollupCounts _,
    "cube_quantity" -> cubeQuantity _,
    "distinct_agg"  -> distinctAgg _,
    "having_filter" -> havingFilter _,
    "percentiles"   -> percentiles _,
    "approx_distinct" -> approxDistinct _,
    "pivot_counts"  -> pivotCounts _)

  val oracles: Map[String, String] = Map(
    "setops_users" ->
      """WITH u1 AS (SELECT DISTINCT user_id FROM events
        |            WHERE CAST(ts AS DATE) BETWEEN '2024-01-01' AND '2024-01-07'),
        |     u2 AS (SELECT DISTINCT user_id FROM events
        |            WHERE CAST(ts AS DATE) BETWEEN '2024-01-08' AND '2024-01-14')
        |SELECT 'both' AS op, user_id FROM (SELECT user_id FROM u1 INTERSECT SELECT user_id FROM u2)
        |UNION ALL
        |SELECT 'only_w1', user_id FROM (SELECT user_id FROM u1 EXCEPT SELECT user_id FROM u2)
        |UNION ALL
        |SELECT 'only_w2', user_id FROM (SELECT user_id FROM u2 EXCEPT SELECT user_id FROM u1)
        |ORDER BY op, user_id""".stripMargin,
    "rollup_counts" ->
      """SELECT event_type, CAST(dayofweek(ts) + 1 AS INTEGER) AS dow,
        |       COUNT(*) AS cnt, CAST(GROUPING(event_type) * 2 + GROUPING(dayofweek(ts) + 1) AS INTEGER) AS gid
        |FROM events GROUP BY ROLLUP(event_type, dayofweek(ts) + 1)
        |ORDER BY gid, event_type NULLS FIRST, dow NULLS FIRST""".stripMargin,
    "cube_quantity" ->
      """SELECT l_returnflag, l_linestatus, ROUND(SUM(l_quantity), 2) AS sum_qty,
        |       COUNT(*) AS cnt,
        |       CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INTEGER) AS gid
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "distinct_agg" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS n_users,
        |       COUNT(DISTINCT CAST(ts AS DATE)) AS n_days, COUNT(*) AS n_events
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "approx_distinct" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_orderkey) AS exact_orders,
        |       TRUE AS approx_within_10pct
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "having_filter" ->
      """SELECT o_custkey, COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS spend
        |FROM orders GROUP BY 1 HAVING COUNT(*) >= 12 ORDER BY 1""".stripMargin,
    "percentiles" ->
      """SELECT event_type, quantile_cont(value, 0.25) AS q25,
        |       quantile_cont(value, 0.5) AS q50, quantile_cont(value, 0.75) AS q75
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "pivot_counts" ->
      """SELECT user_id,
        |       COUNT(*) FILTER (WHERE event_type = 'click') AS click,
        |       COUNT(*) FILTER (WHERE event_type = 'error') AS error,
        |       COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |       COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
        |       COUNT(*) FILTER (WHERE event_type = 'view') AS view
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)
}
