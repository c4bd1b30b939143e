package graft

import org.apache.spark.sql.functions._

class JoinsWindowsSpec extends SparkSpec {
  import graft.queries.{Joins, Windows}
  import graft.tables.Tables

  test("orders_by_segment covers every segment, totals positive") {
    val df = Joins.ordersBySegment(spark, sf).cache()
    assert(df.count() == Tables.customer(spark, sf)
      .select("c_mktsegment").distinct().count())
    assert(df.filter(col("total_revenue") <= 0).count() == 0)
  }

  test("orders_by_segment plans a broadcast join") {
    val plan = Joins.ordersBySegment(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join in:\n$plan")
  }

  test("binned range join: same result as nested-loop plan, no BNLJ in plan") {
    val nested = graft.queries.Joins.rangeBandJoin(spark, sf)
    val binned = graft.queries.Joins.rangeBandJoinBinned(spark, sf)
    assert(binned.collect().toSeq == nested.collect().toSeq)
    val plan = binned.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(500))
  }

  test("late_priority_count counts orders, not lineitems (semi join)") {
    val counted = Joins.latePriorityCount(spark, sf)
      .agg(sum("order_count")).collect()(0).getLong(0)
    assert(counted <= Tables.orders(spark, sf).count())
  }

  test("customers_without_orders is the complement of customers with orders") {
    val without = Joins.customersWithoutOrders(spark, sf).count()
    val withOrders = Tables.orders(spark, sf)
      .select("o_custkey").distinct().count()
    assert(without + withOrders == Tables.customer(spark, sf).count())
  }

  test("revenue_by_nation only includes ASIA/EUROPE") {
    val df = Joins.revenueByNation(spark, sf)
    assert(df.filter(!col("r_name").isin("ASIA", "EUROPE")).count() == 0)
    assert(df.count() > 0)
  }

  test("running_totals: rn is dense 1..n per user") {
    val df = Windows.runningTotals(spark, sf)
    val perUser = df.groupBy("user_id")
      .agg(count(lit(1)).as("n"), max("rn").as("mx"), min("rn").as("mn"))
    assert(perUser.filter(col("mx") =!= col("n") || col("mn") =!= 1).count() == 0)
  }

  test("moving_avg stays within min/max of the type") {
    val df = Windows.movingAvg(spark, sf)
    val ev = Tables.events(spark, sf)
      .groupBy("event_type").agg(min("value").as("lo"), max("value").as("hi"))
    val joined = df.join(ev, "event_type")
    assert(joined.filter(col("mov_avg") < col("lo") - 0.01 ||
      col("mov_avg") > col("hi") + 0.01).count() == 0)
  }

  test("top3_per_type: at most 3 per type, value descending within type") {
    val df = Windows.top3PerType(spark, sf).cache()
    assert(df.groupBy("event_type").count().filter(col("count") > 3).count() == 0)
    val rows = df.collect().groupBy(_.getAs[String]("event_type"))
    rows.values.foreach { rs =>
      val vals = rs.sortBy(_.getAs[Int]("rk")).map(_.getAs[Double]("value"))
      assert(vals.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    }
  }

  test("asof: matched view is the latest view at or before each purchase") {
    val df = Windows.asofPurchaseView(spark, sf).cache()
    val ev = Tables.events(spark, sf).cache()
    val purchases = ev.filter(col("event_type") === "purchase").count()
    assert(df.count() == purchases)
    // cross-check a brute-force reimplementation on the small sf
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("v_id"))
    val brute = ev.filter(col("event_type") === "purchase")
      .join(views, col("user_id") === col("v_user") && col("v_ts") <= col("ts"), "left")
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("event_id").orderBy(desc("v_ts"), desc("v_id"))))
      .filter(col("rk") === 1)
      .select(col("event_id"), col("v_id"))
    val mismatch = df.select(col("event_id"), col("matched_view_id"))
      .join(brute, "event_id")
      .filter(!(col("matched_view_id") <=> col("v_id")))
      .count()
    assert(mismatch == 0)
  }
}
