package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables._

/** Multi-table join shapes beyond Joins.scala: a TPC-H Q7-style
  * six-table star with the same dimension joined twice under different
  * roles, FULL OUTER over disjoint aggregates, and an explicit CROSS
  * join of two tiny aggregates.
  *
  * Scale notes: volume_shipping touches lineitem (the only large input)
  * exactly once — orders co-shuffles on the order key while supplier /
  * customer / both nation roles broadcast, so the whole six-table join
  * is one fact shuffle plus map-side hash joins. The FULL OUTER and
  * CROSS shapes run over already-aggregated (tiny) inputs, which is the
  * only place a cross join belongs at 100 TB.
  */
object MultiJoins {

  /** TPC-H Q7 shape: revenue flow between (supplier nation, customer
    * nation) pairs per ship-year; nation joined twice under two roles. */
  def volumeShipping(spark: SparkSession, dir: String): DataFrame = {
    val n = nation(spark, dir)
    val suppNation = n.select(col("n_nationkey").as("sn_key"),
      col("n_name").as("supp_nation"))
    val custNation = n.select(col("n_nationkey").as("cn_key"),
      col("n_name").as("cust_nation"))
    lineitem(spark, dir)
      .join(orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supplier(spark, dir)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(customer(spark, dir)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(suppNation), col("s_nationkey") === col("sn_key"))
      .join(broadcast(custNation), col("c_nationkey") === col("cn_key"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
          .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** FULL OUTER join of per-user purchase counts vs error counts —
    * users active on only one side keep NULL on the other (outer
    * semantics pinned, no fill). */
  def fullOuterActivity(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val p = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id").as("p_user")).agg(count(lit(1)).as("purchase_cnt"))
    val e = ev.filter(col("event_type") === "error")
      .groupBy(col("user_id").as("e_user")).agg(count(lit(1)).as("error_cnt"))
    p.join(e, col("p_user") === col("e_user"), "full_outer")
      .select(
        coalesce(col("p_user"), col("e_user")).as("user_id"),
        col("purchase_cnt"), col("error_cnt"))
      .orderBy("user_id")
  }

  /** CROSS join of two tiny aggregates: event_type × order priority with
    * the count product as the pair weight. */
  def crossJoinMatrix(spark: SparkSession, dir: String): DataFrame = {
    val t = events(spark, dir).groupBy("event_type")
      .agg(count(lit(1)).as("n_events"))
    val o = orders(spark, dir).groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
    t.crossJoin(o)
      .select(col("event_type"), col("o_orderpriority"),
        (col("n_events") * col("n_orders")).as("pair_weight"))
      .orderBy("event_type", "o_orderpriority")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "volume_shipping"     -> volumeShipping _,
    "full_outer_activity" -> fullOuterActivity _,
    "cross_join_matrix"   -> crossJoinMatrix _)

  val oracles: Map[String, String] = Map(
    "volume_shipping" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |       CAST(year(l_shipdate) AS INTEGER) AS l_year,
        |       ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,
        |       COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "full_outer_activity" ->
      """WITH p AS (SELECT user_id, COUNT(*) AS purchase_cnt FROM events
        |           WHERE event_type = 'purchase' GROUP BY 1),
        |     e AS (SELECT user_id, COUNT(*) AS error_cnt FROM events
        |           WHERE event_type = 'error' GROUP BY 1)
        |SELECT COALESCE(p.user_id, e.user_id) AS user_id,
        |       purchase_cnt, error_cnt
        |FROM p FULL OUTER JOIN e ON p.user_id = e.user_id
        |ORDER BY user_id""".stripMargin,
    "cross_join_matrix" ->
      """WITH t AS (SELECT event_type, COUNT(*) AS n_events FROM events GROUP BY 1),
        |     o AS (SELECT o_orderpriority, COUNT(*) AS n_orders FROM orders GROUP BY 1)
        |SELECT event_type, o_orderpriority, n_events * n_orders AS pair_weight
        |FROM t CROSS JOIN o
        |ORDER BY event_type, o_orderpriority""".stripMargin)
}
