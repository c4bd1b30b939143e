package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables._

/** Join surface. The reference executes no joins (SURVEY.md §2.7) — these
  * are the star-schema extension queries, designed for the shapes Spark
  * executes well at 100 TB:
  *
  *  - dimension tables (region/nation/customer/supplier/part) are tiny
  *    relative to the facts → `broadcast()` them explicitly, so the plan is
  *    a BroadcastHashJoin chain over a single pass of the fact scan — no
  *    shuffle of the fact table at all;
  *  - fact-to-fact (lineitem ⋈ orders) is a shuffle join on the join key;
  *    at scale both sides hash-partition on l_orderkey/o_orderkey and AQE
  *    handles skew. With bucketed storage this becomes shuffle-free — see
  *    graft.table.GraftTable bucketing support;
  *  - semi/anti joins use Spark's left_semi/left_anti (no row duplication,
  *    broadcast-able when the filtering side is small).
  *
  * Average outputs use round(sum,grid)/count rather than round(avg,…):
  * the rounded sum is an exact decimal in both engines, so the division
  * produces bit-identical doubles — no rounding-boundary parity risk.
  */
object Joins {

  /** Broadcast join: orders ⋈ customer, revenue per market segment. */
  def ordersBySegment(spark: SparkSession, dir: String): DataFrame =
    orders(spark, dir)
      .join(broadcast(customer(spark, dir)),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(
        count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 2).as("total_revenue"),
        (round(sum("o_totalprice"), 2) / count(lit(1))).as("avg_order_value"))
      .orderBy("c_mktsegment")

  /** TPC-H Q3 shape: unshipped-revenue top-10. customer is broadcast;
    * orders ⋈ lineitem shuffles on the order key. */
  def topUnshippedOrders(spark: SparkSession, dir: String): DataFrame =
    lineitem(spark, dir).filter(col("l_shipdate") > lit("1998-06-15").cast("timestamp"))
      .join(orders(spark, dir).filter(col("o_orderdate") < lit("1998-06-15").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), to_date(col("o_orderdate")).as("order_date"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
        .as("revenue"))
      .orderBy(desc("revenue"), col("l_orderkey"))
      .limit(10)

  /** TPC-H Q4 shape: left-semi join with a non-equi conjunct — orders with
    * at least one late lineitem, counted per priority. */
  def latePriorityCount(spark: SparkSession, dir: String): DataFrame = {
    val o = orders(spark, dir)
    val l = lineitem(spark, dir)
    o.join(l, o("o_orderkey") === l("l_orderkey") &&
        l("l_shipdate") > o("o_orderdate"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** Left-anti join: customers with no orders at all. */
  def customersWithoutOrders(spark: SparkSession, dir: String): DataFrame =
    customer(spark, dir)
      .join(orders(spark, dir), col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")

  /** TPC-H Q5 shape: star join through supplier → nation → region, all
    * dimensions broadcast; the lineitem scan is the only large input. */
  def revenueByNation(spark: SparkSession, dir: String): DataFrame =
    lineitem(spark, dir)
      .join(broadcast(supplier(spark, dir)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA" || col("r_name") === "EUROPE")
      .groupBy("r_name", "n_name")
      .agg(
        graft.functions.ExactDecimal.sumRevenue(
          col("l_extendedprice"), col("l_discount")).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("r_name"), desc("revenue"), col("n_name"))

  /** Fact-to-fact shuffle join: lineitem ⋈ orders rolled up by priority.
    * At 100 TB this is the canonical sort-merge/shuffle-hash join; AQE
    * coalesces post-shuffle partitions and splits skewed ones. */
  def lineitemByPriority(spark: SparkSession, dir: String): DataFrame =
    lineitem(spark, dir)
      .join(orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("n_lineitems"),
        round(sum("l_quantity"), 2).as("sum_qty"),
        (round(sum("l_extendedprice"), 2) / count(lit(1))).as("avg_price"))
      .orderBy("o_orderpriority")

  /** Part join with grouping on two dimension attributes (join + rollup). */
  def partTypeStats(spark: SparkSession, dir: String): DataFrame =
    lineitem(spark, dir)
      .join(broadcast(part(spark, dir)), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_type")
      .agg(
        count(lit(1)).as("n_items"),
        round(sum("l_quantity"), 2).as("sum_qty"))
      .orderBy("p_brand", "p_type")

  /** Non-equi range join: classify events into value bands from a small
    * boundary dimension. Plans as BroadcastNestedLoopJoin — correct for a
    * broadcast-able dimension; with a large band table, rewrite to
    * width_bucket-style equi-bucketing (noted here deliberately: the
    * range join is the operator demo, the bucketed rewrite is the
    * 100 TB path). */
  def rangeBandJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bands = Seq(
      ("low", 0.0, 50.0), ("mid", 50.0, 150.0),
      ("high", 150.0, 300.0), ("extreme", 300.0, 1e9))
      .toDF("band", "lo", "hi")
    events(spark, dir)
      .join(broadcast(bands), col("value") >= col("lo") && col("value") < col("hi"))
      .groupBy("band")
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("total"))
      .orderBy("band")
  }

  /** The same band classification through [[graft.operators.RangeJoin]]'s
    * binned equi-join — identical rows (same oracle), but planned as a
    * shuffle hash/sort-merge join instead of BroadcastNestedLoopJoin:
    * the shape that survives a band table too large to broadcast.
    * JoinsSpec asserts the plan has no nested-loop join. */
  def rangeBandJoinBinned(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bands = Seq(
      ("low", 0.0, 50.0), ("mid", 50.0, 150.0),
      ("high", 150.0, 300.0), ("extreme", 300.0, 1e9))
      .toDF("band", "lo", "hi")
    // domainMax must bound the value domain (points past the clamp would
    // miss their band's bins); values top out ~560, clamp at 1e4 → the
    // open-ended band replicates into 200 bins, not 2e7
    graft.operators.RangeJoin.binned(
        events(spark, dir), "value", bands, "lo", "hi",
        binSize = 50.0, domainMax = 1e4)
      .groupBy("band")
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("total"))
      .orderBy("band")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "range_band_join"          -> rangeBandJoin _,
    "range_band_join_binned"   -> rangeBandJoinBinned _,
    "orders_by_segment"        -> ordersBySegment _,
    "top_unshipped_orders"     -> topUnshippedOrders _,
    "late_priority_count"      -> latePriorityCount _,
    "customers_without_orders" -> customersWithoutOrders _,
    "revenue_by_nation"        -> revenueByNation _,
    "lineitem_by_priority"     -> lineitemByPriority _,
    "part_type_stats"          -> partTypeStats _)

  val oracles: Map[String, String] = Map(
    "range_band_join" ->
      """WITH bands(band, lo, hi) AS (VALUES
        |  ('low', 0.0, 50.0), ('mid', 50.0, 150.0),
        |  ('high', 150.0, 300.0), ('extreme', 300.0, 1e9))
        |SELECT band, COUNT(*) AS cnt, ROUND(SUM(value), 2) AS total
        |FROM events JOIN bands ON value >= lo AND value < hi
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "range_band_join_binned" ->
      """WITH bands(band, lo, hi) AS (VALUES
        |  ('low', 0.0, 50.0), ('mid', 50.0, 150.0),
        |  ('high', 150.0, 300.0), ('extreme', 300.0, 1e9))
        |SELECT band, COUNT(*) AS cnt, ROUND(SUM(value), 2) AS total
        |FROM events JOIN bands ON value >= lo AND value < hi
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "orders_by_segment" ->
      """SELECT c_mktsegment, COUNT(*) AS n_orders,
        |       ROUND(SUM(o_totalprice), 2) AS total_revenue,
        |       ROUND(SUM(o_totalprice), 2) / COUNT(*) AS avg_order_value
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "top_unshipped_orders" ->
      """SELECT l_orderkey, CAST(o_orderdate AS DATE) AS order_date,
        |       ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE l_shipdate > TIMESTAMP '1998-06-15'
        |  AND o_orderdate < TIMESTAMP '1998-06-15'
        |  AND c_mktsegment = 'BUILDING'
        |GROUP BY 1, 2 ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "late_priority_count" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate > o.o_orderdate)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "customers_without_orders" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "revenue_by_nation" ->
      s"""SELECT r_name, n_name,
         |       ${graft.functions.ExactDecimal.sqlSumRevenue(
                    "l_extendedprice", "l_discount")} AS revenue,
         |       COUNT(*) AS n_items
         |FROM lineitem
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name IN ('ASIA', 'EUROPE')
         |GROUP BY 1, 2 ORDER BY r_name, revenue DESC, n_name""".stripMargin,
    "lineitem_by_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS n_lineitems,
        |       ROUND(SUM(l_quantity), 2) AS sum_qty,
        |       ROUND(SUM(l_extendedprice), 2) / COUNT(*) AS avg_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "part_type_stats" ->
      """SELECT p_brand, p_type, COUNT(*) AS n_items,
        |       ROUND(SUM(l_quantity), 2) AS sum_qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
}
