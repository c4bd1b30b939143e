package graft

import org.apache.spark.sql.functions._

class AnalyticsSpec extends SparkSpec {
  import graft.queries.Analytics

  test("daily_summary: one row per (type, day), bounds ordered") {
    val df = Analytics.dailySummary(spark, sf).cache()
    val n = df.count()
    assert(n > 0)
    assert(df.select("event_type", "event_date").distinct().count() == n)
    assert(df.filter(col("day_min") > col("day_max")).count() == 0)
    // 5 event types present in testdata
    assert(df.select("event_type").distinct().count() == 5)
  }

  test("topk_by_value returns exactly 5 rows, descending") {
    val rows = Analytics.topkByValue(spark, sf).collect()
    assert(rows.length == 5)
    val totals = rows.map(_.getAs[Double]("total_value"))
    assert(totals.sliding(2).forall(p => p(0) >= p(1)))
  }

  test("count_rows matches direct count") {
    val n = Analytics.countRows(spark, sf).collect()(0).getAs[Long]("n_rows")
    assert(n == graft.tables.Tables.lineitem(spark, sf).count())
  }

  test("count_by_type sums to total events") {
    val df = Analytics.countByType(spark, sf)
    val total = df.agg(sum("cnt")).collect()(0).getLong(0)
    assert(total == graft.tables.Tables.events(spark, sf).count())
  }

  test("derive_time: ny_date is utc_date or the day before (UTC ahead of NY)") {
    val df = Analytics.deriveTime(spark, sf)
    val bad = df.filter(
      !(col("ny_date") === col("utc_date")) &&
      !(datediff(col("utc_date"), col("ny_date")) === 1)).count()
    assert(bad == 0)
    // near-midnight rows must actually shift (tz edge exercised)
    assert(df.filter(col("ny_date") < col("utc_date")).count() > 0)
  }

  test("filter_project only returns matching rows") {
    val df = Analytics.filterProject(spark, sf)
    assert(df.filter(col("ship_date") < lit("1999-06-01")).count() == 0)
  }

  test("pricing_summary groups cover all flag/status combos in data") {
    val df = Analytics.pricingSummary(spark, sf)
    assert(df.count() > 0 && df.count() <= 9)
    assert(df.filter(col("count_order") <= 0).count() == 0)
  }

  test("json_extract_agg parses props.k") {
    val df = Analytics.jsonExtractAgg(spark, sf)
    assert(df.filter(col("sum_k").isNull).count() == 0)
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query key has either an oracle or is documented rows-only") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"oracle keys without query: ${os -- qs}")
  }
}
