package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables._

/** Core analytics surface of the reference pipeline, re-expressed over the
  * driver testdata (`events` is the time-series analog of the stock-bar
  * table: event_type ≈ ticker, value ≈ price, ts ≈ event_time_utc).
  *
  * Reference shapes covered (SURVEY.md §2):
  *  - A1 ungrouped count            (stock_harvester.py:200)
  *  - A2/A3 groupBy().count()       (stock_harvester.py:205,208)
  *  - A4 min/max bounds             (stock_harvester.py:185-186)
  *  - A5 distinct count             (stock_harvester.py:184)
  *  - A6 daily OHLC-style summary   (external_table.py:105-111)
  *  - A7 top-k by aggregate         (external_table.py:113-122)
  *  - P1-P5 projection + derived time columns (stock_harvester.py:160-163)
  *  - filter/partition-prune shape  (DESIGN.md:29-33 — described, not coded,
  *    in the reference; implemented here as a first-class query)
  *  - O1-O3 sorts and order-by-limit top-k
  *
  * Scale notes (100 TB): every query is a scan → (optional filter, pushed
  * to parquet) → partial hash-agg → single shuffle on the group keys →
  * final agg → order. Group-key cardinality is low (types × dates), so the
  * shuffle moves only partial aggregates, not rows. Top-k plans as
  * TakeOrderedAndProject (no global sort). All rounding happens at the
  * data's decimal grid (0.01) so double summation order cannot flip the
  * rounded result between engines.
  */
object Analytics {

  /** A6 flagship: per (event_type, day) count/min/max — the shape of the
    * reference's daily OHLC summary (external_table.py:105-111). */
  def dailySummary(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("event_date"))
      .agg(
        count(lit(1)).as("bar_count"),
        min("value").as("day_min"),
        max("value").as("day_max"))
      .orderBy("event_type", "event_date")

  /** A7: top-5 (type, day) by total value — external_table.py:113-122.
    * Plans as TakeOrderedAndProject; at scale no global sort happens. */
  def topkByValue(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("event_date"))
      .agg(
        round(sum("value"), 2).as("total_value"),
        (round(sum("value"), 2) / count(lit(1))).as("avg_value"))
      .orderBy(desc("total_value"), col("event_type"), col("event_date"))
      .limit(5)

  /** A1: ungrouped count (stock_harvester.py:200) as a 1-row DataFrame. */
  def countRows(spark: SparkSession, dir: String): DataFrame =
    lineitem(spark, dir).agg(count(lit(1)).as("n_rows"))

  /** A2: per-key counts (stock_harvester.py:204-205). */
  def countByType(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir).groupBy("event_type").agg(count(lit(1)).as("cnt"))
      .orderBy("event_type")

  /** A5: distinct key count (stock_harvester.py:184). */
  def distinctTypes(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir).agg(countDistinct(col("event_type")).as("n_types"))

  /** A4: date-range bounds (stock_harvester.py:185-186) — one job, not two. */
  def dateBounds(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir).agg(
      min(to_date(col("ts"))).as("min_date"),
      max(to_date(col("ts"))).as("max_date"))

  /** P2-P5: the reference's derived-time-column chain
    * (stock_harvester.py:160-163): epoch→UTC ts→NY wall time→trade date.
    * `ts` is already a timestamp here, so the epoch→ts step appears in the
    * ingest module (graft.ingest.BarSource); the tz-convert + to_date steps
    * are identical. Output avoids raw timestamps (engine-dependent
    * nanosecond handling); dates and ints are byte-identical across engines.
    */
  def deriveTime(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .select(
        col("event_id"),
        to_date(col("ts")).as("utc_date"),
        to_date(from_utc_timestamp(col("ts"), "America/New_York")).as("ny_date"),
        hour(col("ts")).as("utc_hour"),
        unix_micros(col("ts")).as("epoch_us"))
      .orderBy("event_id")

  /** P1 + filter: predicate + projection, the reference's motivating query
    * pattern (DESIGN.md:29-33). Both predicates reach the parquet scan as
    * PushedFilters; only 5 of 11 columns are read (ReadSchema pruning). */
  def filterProject(spark: SparkSession, dir: String): DataFrame =
    lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1999-06-01").cast("timestamp") &&
        col("l_discount") > lit(0.08))
      .select(
        col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), to_date(col("l_shipdate")).as("ship_date"))
      .orderBy("l_orderkey", "l_linenumber")

  /** TPC-H Q1 shape: the canonical scan-heavy aggregation. Whole-table
    * sums into a handful of groups get BIG — measures aggregate in
    * exact scaled-integer space ([[graft.functions.ExactDecimal]]) so no
    * summation-order ulp can ever cross a rounding boundary at scale. */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.ExactDecimal._
    lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("2000-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum2(col("l_quantity")).as("sum_qty"),
        sum2(col("l_extendedprice")).as("sum_base_price"),
        sumRevenue(col("l_extendedprice"), col("l_discount")).as("sum_disc_price"),
        sumCharge(col("l_extendedprice"), col("l_discount"), col("l_tax"))
          .as("sum_charge"),
        (sum2(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        (sum2(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
        (sum2(col("l_discount")) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** JSON property extraction over events.props (extension surface —
    * SURVEY.md §7.5): parse `{"k": <int>}` and aggregate per type. */
  def jsonExtractAgg(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(sum("k").as("sum_k"), max("k").as("max_k"),
        count(lit(1)).as("cnt"))
      .orderBy("event_type")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "daily_summary"   -> dailySummary _,
    "topk_by_value"   -> topkByValue _,
    "count_rows"      -> countRows _,
    "count_by_type"   -> countByType _,
    "distinct_types"  -> distinctTypes _,
    "date_bounds"     -> dateBounds _,
    "derive_time"     -> deriveTime _,
    "filter_project"  -> filterProject _,
    "pricing_summary" -> pricingSummary _,
    "json_extract_agg" -> jsonExtractAgg _)

  val oracles: Map[String, String] = Map(
    "daily_summary" ->
      """SELECT event_type, CAST(ts AS DATE) AS event_date,
        |       COUNT(*) AS bar_count, MIN(value) AS day_min, MAX(value) AS day_max
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "topk_by_value" ->
      """SELECT event_type, CAST(ts AS DATE) AS event_date,
        |       ROUND(SUM(value), 2) AS total_value,
        |       ROUND(SUM(value), 2) / COUNT(*) AS avg_value
        |FROM events GROUP BY 1, 2
        |ORDER BY total_value DESC, event_type, event_date LIMIT 5""".stripMargin,
    "count_rows" -> "SELECT COUNT(*) AS n_rows FROM lineitem",
    "count_by_type" ->
      "SELECT event_type, COUNT(*) AS cnt FROM events GROUP BY 1 ORDER BY 1",
    "distinct_types" ->
      "SELECT COUNT(DISTINCT event_type) AS n_types FROM events",
    "date_bounds" ->
      """SELECT MIN(CAST(ts AS DATE)) AS min_date, MAX(CAST(ts AS DATE)) AS max_date
        |FROM events""".stripMargin,
    "derive_time" ->
      """SELECT event_id, CAST(ts AS DATE) AS utc_date,
        |       CAST(timezone('America/New_York', timezone('UTC', ts)) AS DATE) AS ny_date,
        |       CAST(EXTRACT(hour FROM ts) AS INTEGER) AS utc_hour,
        |       epoch_us(ts) AS epoch_us
        |FROM events ORDER BY event_id""".stripMargin,
    "filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
        |       CAST(l_shipdate AS DATE) AS ship_date
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1999-06-01' AND l_discount > 0.08
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "pricing_summary" -> {
      import graft.functions.ExactDecimal._
      s"""SELECT l_returnflag, l_linestatus,
         |       ${sqlSum2("l_quantity")} AS sum_qty,
         |       ${sqlSum2("l_extendedprice")} AS sum_base_price,
         |       ${sqlSumRevenue("l_extendedprice", "l_discount")} AS sum_disc_price,
         |       ${sqlSumCharge("l_extendedprice", "l_discount", "l_tax")} AS sum_charge,
         |       ${sqlSum2("l_quantity")} / COUNT(*) AS avg_qty,
         |       ${sqlSum2("l_extendedprice")} / COUNT(*) AS avg_price,
         |       ${sqlSum2("l_discount")} / COUNT(*) AS avg_disc,
         |       COUNT(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-02'
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    },
    "json_extract_agg" ->
      """SELECT event_type,
        |       CAST(SUM(CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
        |       MAX(CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT)) AS max_k,
        |       COUNT(*) AS cnt
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)
}
