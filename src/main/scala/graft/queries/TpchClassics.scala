package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables._

/** Further TPC-H classic shapes (Q12/Q14/Q18 adapted to the testdata
  * schema): conditional aggregation inside a fact join, a ratio of
  * conditional sums, and a having-filtered aggregate subquery joined
  * back to its facts.
  *
  * Scale: q12/q14 are one fact shuffle with the dimension broadcast;
  * q18's inner aggregate reuses the join key's hash partitioning, so
  * the subsequent joins add no extra fact shuffle (the aggregate and
  * the join co-partition on l_orderkey / o_orderkey).
  */
object TpchClassics {

  /** Q12 shape: per return flag, how many late-shipped lineitems belong
    * to critical (1-URGENT / 2-HIGH) vs other orders. */
  def q12ShipPriority(spark: SparkSession, dir: String): DataFrame = {
    val critical = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp"))
      .join(orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate"))
      .groupBy("l_returnflag")
      .agg(
        sum(when(critical, 1L).otherwise(0L)).as("critical_count"),
        sum(when(!critical, 1L).otherwise(0L)).as("other_count"))
      .orderBy("l_returnflag")
  }

  /** Q14 shape: revenue share of a part-type family (ratio of rounded
    * conditional sums — exact decimals, bit-identical division). */
  def q14TypeShare(spark: SparkSession, dir: String): DataFrame =
    lineitem(spark, dir)
      .join(broadcast(part(spark, dir)), col("l_partkey") === col("p_partkey"))
      .groupBy(year(col("l_shipdate")).as("l_year"))
      .agg(
        round(sum(when(col("p_type").startsWith("STANDARD"),
          col("l_extendedprice") * (lit(1) - col("l_discount"))).otherwise(0.0)), 4)
          .as("standard_revenue"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
          .as("total_revenue"))
      .withColumn("standard_share",
        lit(100.0) * col("standard_revenue") / col("total_revenue"))
      .orderBy("l_year")

  /** Q18 shape: large orders — the quantity aggregate filters order
    * keys, then joins back to orders and customer for the report. */
  val LargeOrderQty = 120.0

  def q18LargeOrders(spark: SparkSession, dir: String): DataFrame = {
    val big = lineitem(spark, dir)
      .groupBy("l_orderkey")
      .agg(round(sum("l_quantity"), 2).as("total_qty"))
      .filter(col("total_qty") > LargeOrderQty)
    big
      .join(orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer(spark, dir)), col("o_custkey") === col("c_custkey"))
      .select(
        col("c_custkey"), col("c_name"), col("o_orderkey"),
        to_date(col("o_orderdate")).as("order_date"),
        col("o_totalprice"), col("total_qty"))
      .orderBy(desc("total_qty"), col("o_orderkey"))
      .limit(100)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q12_ship_priority" -> q12ShipPriority _,
    "q14_type_share"    -> q14TypeShare _,
    "q18_large_orders"  -> q18LargeOrders _)

  val oracles: Map[String, String] = Map(
    "q12_ship_priority" ->
      """SELECT l_returnflag,
        |       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS critical_count,
        |       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                     THEN 0 ELSE 1 END) AS BIGINT) AS other_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate > o_orderdate
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q14_type_share" ->
      """SELECT CAST(year(l_shipdate) AS INTEGER) AS l_year,
        |       ROUND(SUM(CASE WHEN p_type LIKE 'STANDARD%'
        |                      THEN l_extendedprice * (1 - l_discount)
        |                      ELSE 0.0 END), 4) AS standard_revenue,
        |       ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS total_revenue,
        |       100.0 * ROUND(SUM(CASE WHEN p_type LIKE 'STANDARD%'
        |                      THEN l_extendedprice * (1 - l_discount)
        |                      ELSE 0.0 END), 4)
        |         / ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS standard_share
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q18_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey, ROUND(SUM(l_quantity), 2) AS total_qty
        |  FROM lineitem GROUP BY 1 HAVING ROUND(SUM(l_quantity), 2) > 120.0)
        |SELECT c_custkey, c_name, o_orderkey,
        |       CAST(o_orderdate AS DATE) AS order_date,
        |       o_totalprice, total_qty
        |FROM big
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY total_qty DESC, o_orderkey LIMIT 100""".stripMargin)
}
