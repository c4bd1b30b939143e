package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables._

/** Source/sink format breadth + scalar-function families beyond the
  * reference's parquet-only, arithmetic-only surface.
  */
object IoAndScalars {

  /** Round-trip the events table through csv, json, and orc, proving
    * each format preserves row counts and the key column. The oracle
    * checks counts (a faithful round-trip is exactly "same rows"). */
  def ioRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val base = graft.GraftTmp.dir("graft_io").toString
    val ev = events(spark, dir)
      .select(col("event_id"), col("event_type"), col("value"),
        // csv has no native timestamp-with-nanos; write epoch micros
        unix_micros(col("ts")).as("ts_us"))
    ev.write.mode("overwrite").option("header", "true").csv(s"$base/csv")
    ev.write.mode("overwrite").json(s"$base/json")
    ev.write.mode("overwrite").orc(s"$base/orc")
    val back = Seq(
      ("csv", spark.read.option("header", "true").option("inferSchema", "true")
        .csv(s"$base/csv")),
      ("json", spark.read.json(s"$base/json")),
      ("orc", spark.read.orc(s"$base/orc")))
    import spark.implicits._
    back.map { case (fmt, df) =>
      val n = df.count()
      val ids = df.agg(sum("event_id")).collect()(0).getLong(0)
      (fmt, n, ids)
    }.toDF("format", "n_rows", "sum_event_id").orderBy("format")
  }

  /** COALESCE / NULLIF / null-safe comparison family. */
  def nullHandling(spark: SparkSession, dir: String): DataFrame =
    lineitem(spark, dir)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        coalesce(nullif(col("l_discount"), lit(0.0)), lit(-1.0)).as("disc_or_flag"),
        when(col("l_tax") <=> lit(0.0), "tax_free").otherwise("taxed").as("tax_class"))
      .orderBy("l_orderkey", "l_linenumber")

  /** Date/time function family over l_shipdate. */
  def datetimeFunctions(spark: SparkSession, dir: String): DataFrame =
    lineitem(spark, dir)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        to_date(col("l_shipdate")).as("ship_date"),
        date_add(to_date(col("l_shipdate")), 30).as("due_date"),
        last_day(to_date(col("l_shipdate"))).as("month_end"),
        dayofyear(col("l_shipdate")).as("doy"),
        year(col("l_shipdate")).as("yr"),
        quarter(col("l_shipdate")).as("qtr"))
      .orderBy("l_orderkey", "l_linenumber")

  /** Array aggregation/manipulation family: collect, sort, slice, size. */
  def arrayFunctions(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .filter(col("user_id") < 5)
      .groupBy("user_id")
      .agg(sort_array(collect_list(col("event_id"))).as("all_ids"))
      .select(
        col("user_id"),
        size(col("all_ids")).as("n"),
        // joined to a string: the driver's compare sorts rows in pandas,
        // which cannot order array cells — scalar output, same functions
        expr("array_join(transform(slice(all_ids, 1, 5), x -> cast(x AS string)), ',')")
          .as("first5"),
        element_at(col("all_ids"), -1).as("last_id"),
        array_contains(col("all_ids"), 0L).as("has_zero"))
      .orderBy("user_id")

  /** Map-function family: build a per-user map event_type → count with
    * map_from_entries, then read it back with map_keys / map_values /
    * element_at and a fold over the values. The oracle reproduces each
    * scalar output relationally (maps stay Spark-side; pandas cannot
    * sort map cells — same constraint as array_functions). */
  def mapFunctions(spark: SparkSession, dir: String): DataFrame = {
    val counts = events(spark, dir)
      .groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("cnt"))
    counts
      .groupBy("user_id")
      .agg(map_from_entries(
        sort_array(collect_list(struct(col("event_type"), col("cnt")))))
        .as("m"))
      .select(
        col("user_id"),
        size(map_keys(col("m"))).as("n_keys"),
        array_join(map_keys(col("m")), ",").as("keys"),
        element_at(col("m"), "view").as("views"),
        aggregate(map_values(col("m")), lit(0L), (acc, x) => acc + x).as("total"))
      .orderBy("user_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "array_functions"    -> arrayFunctions _,
    "map_functions"      -> mapFunctions _,
    "io_roundtrip"       -> ioRoundtrip _,
    "null_handling"      -> nullHandling _,
    "datetime_functions" -> datetimeFunctions _)

  val oracles: Map[String, String] = Map(
    "map_functions" ->
      """WITH c AS (SELECT user_id, event_type, COUNT(*) AS cnt
        |           FROM events GROUP BY 1, 2)
        |SELECT user_id,
        |       CAST(COUNT(*) AS INTEGER) AS n_keys,
        |       STRING_AGG(event_type, ',' ORDER BY event_type) AS keys,
        |       MAX(CASE WHEN event_type = 'view' THEN cnt END) AS views,
        |       CAST(SUM(cnt) AS BIGINT) AS total
        |FROM c GROUP BY user_id ORDER BY user_id""".stripMargin,
    "array_functions" ->
      """WITH a AS (
        |  SELECT user_id, list_sort(list(event_id)) AS all_ids
        |  FROM events WHERE user_id < 5 GROUP BY user_id)
        |SELECT user_id, CAST(len(all_ids) AS INTEGER) AS n,
        |       array_to_string(all_ids[1:5], ',') AS first5,
        |       all_ids[-1] AS last_id,
        |       list_contains(all_ids, 0) AS has_zero
        |FROM a ORDER BY user_id""".stripMargin,
    "io_roundtrip" ->
      """SELECT fmt AS format, COUNT(*) AS n_rows,
        |       CAST(SUM(event_id) AS BIGINT) AS sum_event_id
        |FROM events, (VALUES ('csv'), ('json'), ('orc')) AS f(fmt)
        |GROUP BY fmt ORDER BY fmt""".stripMargin,
    "null_handling" ->
      """SELECT l_orderkey, l_linenumber,
        |       COALESCE(NULLIF(l_discount, 0.0), -1.0) AS disc_or_flag,
        |       CASE WHEN l_tax IS NOT DISTINCT FROM 0.0 THEN 'tax_free'
        |            ELSE 'taxed' END AS tax_class
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "datetime_functions" ->
      """SELECT l_orderkey, l_linenumber,
        |       CAST(l_shipdate AS DATE) AS ship_date,
        |       CAST(l_shipdate AS DATE) + 30 AS due_date,
        |       last_day(CAST(l_shipdate AS DATE)) AS month_end,
        |       CAST(dayofyear(l_shipdate) AS INTEGER) AS doy,
        |       CAST(year(l_shipdate) AS INTEGER) AS yr,
        |       CAST(quarter(l_shipdate) AS INTEGER) AS qtr
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)
}
