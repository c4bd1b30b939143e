package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.tables.Tables._

/** The remaining TPC-H classic shapes, adapted to the testdata star schema
  * (no partsupp table — the lineitem part↔supplier link plays its role, so
  * "supply cost" is the minimum observed unit price and "availability" is
  * shipped quantity).
  *
  * Each query exercises a distinct optimizer/execution muscle the rest of
  * the repo doesn't already cover:
  *   - q2:  argmin-per-group over a multi-dim join (correlated MIN subquery,
  *          decorrelated as ONE window min — no second shuffle).
  *   - q7:  the same dimension joined twice under different roles
  *          (supplier nation vs customer nation) with a symmetric pair
  *          predicate.
  *   - q9:  the widest join in the suite (5 tables) with an arithmetic
  *          profit measure, kept in exact scaled-integer space.
  *   - q10: returned-revenue report — fact filter → 3 dim joins → top-k.
  *   - q11: HAVING against a global scalar (value share threshold).
  *   - q13: outer join with a join-condition predicate feeding a
  *          double aggregation (distribution of group sizes).
  *   - q17: per-group average threshold applied back to the group's own
  *          rows (the classic broadcast-agg-then-rejoin decorrelation).
  *   - q19: a 3-way disjunction of conjunctive ranges — the predicate-
  *          pushdown-through-join stress shape.
  *   - q20: dominance semi-join — suppliers holding >30% of a part's
  *          shipped quantity, counted per supplier.
  *
  * Exactness discipline (see ExactDecimal): every revenue/profit sum runs
  * in scaled-integer space so summation order cannot move a bit; the only
  * floating-point ops that survive are single correctly-rounded IEEE
  * multiplies/divides applied identically by both engines.
  *
  * Scale notes, per the 100 TB contract: every dimension join is an
  * explicit broadcast (part/supplier/nation stay millions of rows at
  * 100 TB lineitem); the fact table shuffles at most once per query, and
  * q2/q17's decorrelations reuse the aggregation's own hash partitioning
  * instead of adding an exchange.
  */
object TpchAdvanced {

  /** Q2: cheapest in-region supplier per scoped part. The correlated
    * `unit_cost = (SELECT MIN ...)` is a window MIN over the per-(part,
    * supplier) aggregate — the agg already hash-partitions by
    * (l_partkey, l_suppkey), and the window only needs p_partkey, so AQE
    * sees one fact shuffle plus one small exchange on the 2k-row scoped
    * set, never a second pass over lineitem. */
  def q2MinCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    val scopedParts = part(spark, dir)
      .filter(col("p_type") === "PROMO" && col("p_size") <= 10)
    // scope the fact BEFORE the (partkey, suppkey) aggregate: the
    // semi-join broadcasts the filtered part keys, so only the scoped
    // fraction of lineitem enters the shuffle — aggregating the whole
    // table first would move every (part, supplier) pair at 100 TB
    val costs = lineitem(spark, dir)
      .join(broadcast(scopedParts.select("p_partkey")),
        col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy("l_partkey", "l_suppkey")
      .agg(min(col("l_extendedprice") / col("l_quantity")).as("unit_cost"))
    val regionSupp = supplier(spark, dir)
      .join(broadcast(nation(spark, dir).filter(col("n_regionkey") === 0)),
        col("s_nationkey") === col("n_nationkey"))
    val scoped = costs
      .join(broadcast(scopedParts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(regionSupp), col("l_suppkey") === col("s_suppkey"))
    scoped
      .withColumn("best", min("unit_cost").over(Window.partitionBy("p_partkey")))
      .filter(col("unit_cost") === col("best"))
      .select(col("p_partkey"), col("p_name"), col("s_suppkey"), col("s_name"),
        col("s_acctbal"), col("n_name"), col("unit_cost"))
      .orderBy(desc("s_acctbal"), col("n_name"), col("s_name"), col("p_partkey"))
      .limit(100)
  }

  /** Q7: shipping volume between two nations, by direction and year. The
    * nation dimension participates twice (supplier side, customer side)
    * under disambiguated names; both filters reach their scans before any
    * join, so only the two nations' rows enter the fact shuffles. */
  def q7NationVolume(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.ExactDecimal._
    val n = nation(spark, dir).filter(col("n_name").isin("NATION_1", "NATION_2"))
    val supp = supplier(spark, dir)
      .join(broadcast(n.select(col("n_nationkey"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "supp_nation")
    val cust = customer(spark, dir)
      .join(broadcast(n.select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))),
        col("c_nationkey") === col("cn_key"))
      .select("c_custkey", "cust_nation")
    lineitem(spark, dir)
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(sumRevenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** Q9: profit per supplier nation per year over a 'bolt' part family.
    * Cost proxy (no partsupp): 10% of the part's retail price per unit.
    * The whole measure stays in scaled-integer space: revenue at the 1e4
    * grid, cost folded in at the same grid (retail·qty·0.1 → 10·s2·qty). */
  def q9ProductProfit(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.ExactDecimal._
    val amountScaled =
      s2(col("l_extendedprice")) * (lit(100L) - s2(col("l_discount"))) -
        lit(10L) * s2(col("p_retailprice")) * col("l_quantity").cast("long")
    lineitem(spark, dir)
      .join(broadcast(part(spark, dir).filter(col("p_name").endsWith("bolt"))),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(supplier(spark, dir)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .join(orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
      .agg((sum(amountScaled) / lit(10000.0)).as("sum_profit"))
      .orderBy(col("nation"), desc("o_year"))
  }

  /** Q10: customers who returned the most revenue in a half-year window —
    * the classic "fact filter, three dimension hops, top-k" report. */
  def q10ReturnedItems(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.ExactDecimal._
    lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .join(orders(spark, dir)
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-07-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer(spark, dir)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
      .agg(sumRevenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy(desc("revenue"), col("c_custkey"))
      .limit(20)
  }

  /** Q11: parts that carry an outsized share of one nation's shipped
    * value — per-part value vs a scalar share threshold of the total
    * (HAVING against a global aggregate). The scalar reuses the per-part
    * aggregate (no second fact scan) and rides a broadcast. */
  def q11ImportantParts(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.ExactDecimal._
    val natSupp = supplier(spark, dir)
      .join(broadcast(nation(spark, dir).filter(col("n_name") === "NATION_3")),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey")
    val perPart = lineitem(spark, dir)
      .join(broadcast(natSupp), col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy("l_partkey")
      .agg(sum2(col("l_extendedprice")).as("value"))
    // share cut relative to the MEAN part value (2×), not the total: the
    // mean keeps the predicate scale-invariant — a fixed total fraction
    // empties the result as the part count grows with the corpus
    val threshold = perPart
      .agg((sum(s2(col("value"))) / lit(100.0) / count(lit(1)) * lit(2.0))
        .as("cut"))
    perPart.join(broadcast(threshold), col("value") > col("cut"))
      .select(col("l_partkey").as("p_partkey"), col("value"))
      .orderBy(desc("value"), col("p_partkey"))
  }

  /** Q13: distribution of per-customer order counts, excluding urgent
    * orders INSIDE the join condition (customers with only urgent orders
    * must still appear with count 0 — the predicate cannot be a WHERE). */
  def q13OrderDistribution(spark: SparkSession, dir: String): DataFrame = {
    val perCust = customer(spark, dir)
      .join(orders(spark, dir),
        col("c_custkey") === col("o_custkey") &&
          col("o_orderpriority") =!= "1-URGENT", "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
    perCust.groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(desc("custdist"), desc("c_count"))
  }

  /** Q17: revenue lost to small-quantity orders of one brand — each
    * part's rows compared against 20% of that part's own average
    * quantity. Both sides of the comparison partition on l_partkey, so
    * the rejoin reuses the aggregate's exchange. avg is computed as
    * exact-integer sum / count (one IEEE divide, identical bits in both
    * engines). */
  def q17SmallQuantity(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.ExactDecimal._
    val brandParts = part(spark, dir)
      .filter(col("p_brand") === "Brand#5").select("p_partkey")
    val scoped = lineitem(spark, dir)
      .join(broadcast(brandParts), col("l_partkey") === col("p_partkey"), "left_semi")
    val thresholds = scoped.groupBy("l_partkey")
      .agg((lit(0.2) * (sum(col("l_quantity").cast("long")) / count(lit(1))))
        .as("qty_cut"))
    scoped.join(thresholds, Seq("l_partkey"))
      .filter(col("l_quantity") < col("qty_cut"))
      .agg((sum2(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"),
        count(lit(1)).as("n_small"))
  }

  /** Q19: disjunction of three (brand, size-range, quantity-range)
    * conjunctions evaluated across the part join. The part side is
    * pre-filtered to the disjunction's envelope (3 brands, size ≤ 15) so
    * the broadcast stays minimal; the exact OR runs as the join residual. */
  def q19Disjunctive(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.ExactDecimal._
    val p = part(spark, dir)
      .filter(col("p_brand").isin("Brand#12", "Brand#23", "Brand#34") &&
        col("p_size").between(1, 15))
    val matches =
      (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
        col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
          col("l_quantity").between(20, 30))
    lineitem(spark, dir)
      .join(broadcast(p), col("l_partkey") === col("p_partkey") && matches)
      .agg(sumRevenue(col("l_extendedprice"), col("l_discount")).as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  /** Q20: dominant suppliers of 'red' parts — a supplier qualifies for a
    * part when it shipped >3× the part's mean per-supplier quantity
    * (mean-relative, so the predicate survives any corpus scale; the
    * comparison is qty·n_suppliers > 3·total — pure integers, no float
    * anywhere). One fact aggregate feeds both sides: per-pair quantity
    * and, via window sums over the SAME partitioning column, the
    * per-part total and supplier count. */
  def q20DominantSupplier(spark: SparkSession, dir: String): DataFrame = {
    val redParts = part(spark, dir)
      .filter(col("p_name").startsWith("red")).select("p_partkey")
    val pairQty = lineitem(spark, dir)
      .join(broadcast(redParts), col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy("l_partkey", "l_suppkey")
      .agg(sum(col("l_quantity").cast("long")).as("qty"))
    val w = Window.partitionBy("l_partkey")
    val withTotal = pairQty
      .withColumn("total", sum("qty").over(w))
      .withColumn("n_supp", count(lit(1)).over(w))
    withTotal
      .filter(col("qty") * col("n_supp") > lit(3L) * col("total"))
      .groupBy("l_suppkey")
      .agg(count(lit(1)).as("n_dominated"), sum("qty").as("qty_shipped"))
      .join(broadcast(supplier(spark, dir)), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_dominated"), col("qty_shipped"))
      .orderBy(desc("n_dominated"), col("s_suppkey"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q2_min_cost_supplier"  -> q2MinCostSupplier _,
    "q7_nation_volume"      -> q7NationVolume _,
    "q9_product_profit"     -> q9ProductProfit _,
    "q10_returned_items"    -> q10ReturnedItems _,
    "q11_important_parts"   -> q11ImportantParts _,
    "q13_order_distribution" -> q13OrderDistribution _,
    "q17_small_quantity"    -> q17SmallQuantity _,
    "q19_disjunctive"       -> q19Disjunctive _,
    "q20_dominant_supplier" -> q20DominantSupplier _)

  val oracles: Map[String, String] = {
    import graft.functions.ExactDecimal._
    Map(
      "q2_min_cost_supplier" ->
        """WITH costs AS (
          |  SELECT l_partkey, l_suppkey,
          |         MIN(l_extendedprice / l_quantity) AS unit_cost
          |  FROM lineitem GROUP BY 1, 2),
          |scoped AS (
          |  SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name,
          |         unit_cost
          |  FROM costs
          |  JOIN part ON l_partkey = p_partkey
          |  JOIN supplier ON l_suppkey = s_suppkey
          |  JOIN nation ON s_nationkey = n_nationkey
          |  WHERE p_type = 'PROMO' AND p_size <= 10 AND n_regionkey = 0)
          |SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name,
          |       unit_cost
          |FROM (SELECT *, MIN(unit_cost) OVER (PARTITION BY p_partkey) AS best
          |      FROM scoped)
          |WHERE unit_cost = best
          |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""".stripMargin,
      "q7_nation_volume" ->
        s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           |       CAST(year(l_shipdate) AS INTEGER) AS l_year,
           |       ${sqlSumRevenue("l_extendedprice", "l_discount")} AS revenue
           |FROM lineitem
           |JOIN supplier ON l_suppkey = s_suppkey
           |JOIN nation n1 ON s_nationkey = n1.n_nationkey
           |JOIN orders ON l_orderkey = o_orderkey
           |JOIN customer ON o_custkey = c_custkey
           |JOIN nation n2 ON c_nationkey = n2.n_nationkey
           |WHERE n1.n_name IN ('NATION_1', 'NATION_2')
           |  AND n2.n_name IN ('NATION_1', 'NATION_2')
           |  AND n1.n_name <> n2.n_name
           |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
      "q9_product_profit" ->
        s"""SELECT n_name AS nation,
           |       CAST(year(o_orderdate) AS INTEGER) AS o_year,
           |       CAST(SUM(${sql2("l_extendedprice")} * (100 - ${sql2("l_discount")})
           |                - 10 * ${sql2("p_retailprice")} * CAST(l_quantity AS BIGINT))
           |            AS BIGINT) / 10000.0 AS sum_profit
           |FROM lineitem
           |JOIN part ON l_partkey = p_partkey
           |JOIN supplier ON l_suppkey = s_suppkey
           |JOIN nation ON s_nationkey = n_nationkey
           |JOIN orders ON l_orderkey = o_orderkey
           |WHERE p_name LIKE '%bolt'
           |GROUP BY 1, 2 ORDER BY 1, 2 DESC""".stripMargin,
      "q10_returned_items" ->
        s"""SELECT c_custkey, c_name, c_acctbal, n_name,
           |       ${sqlSumRevenue("l_extendedprice", "l_discount")} AS revenue
           |FROM lineitem
           |JOIN orders ON l_orderkey = o_orderkey
           |JOIN customer ON o_custkey = c_custkey
           |JOIN nation ON c_nationkey = n_nationkey
           |WHERE l_returnflag = 'R'
           |  AND o_orderdate >= TIMESTAMP '1997-01-01'
           |  AND o_orderdate < TIMESTAMP '1997-07-01'
           |GROUP BY 1, 2, 3, 4
           |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
      "q11_important_parts" ->
        s"""WITH per_part AS (
           |  SELECT l_partkey, ${sqlSum2("l_extendedprice")} AS value
           |  FROM lineitem
           |  WHERE l_suppkey IN (
           |    SELECT s_suppkey FROM supplier JOIN nation
           |    ON s_nationkey = n_nationkey WHERE n_name = 'NATION_3')
           |  GROUP BY 1)
           |SELECT l_partkey AS p_partkey, value
           |FROM per_part
           |WHERE value > (SELECT CAST(SUM(${sql2("value")}) AS BIGINT) / 100.0
           |                      / COUNT(*) * 2.0
           |               FROM per_part)
           |ORDER BY value DESC, p_partkey""".stripMargin,
      "q13_order_distribution" ->
        """SELECT c_count, COUNT(*) AS custdist
          |FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
          |      FROM customer LEFT OUTER JOIN orders
          |        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
          |      GROUP BY 1)
          |GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin,
      "q17_small_quantity" ->
        s"""WITH scoped AS (
           |  SELECT l_partkey, l_quantity, l_extendedprice
           |  FROM lineitem
           |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#5')),
           |cuts AS (
           |  SELECT l_partkey,
           |         0.2 * (CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / COUNT(*))
           |           AS qty_cut
           |  FROM scoped GROUP BY 1)
           |SELECT ${sqlSum2("l_extendedprice")} / 7.0 AS avg_yearly,
           |       COUNT(*) AS n_small
           |FROM scoped JOIN cuts USING (l_partkey)
           |WHERE l_quantity < qty_cut""".stripMargin,
      "q19_disjunctive" ->
        s"""SELECT ${sqlSumRevenue("l_extendedprice", "l_discount")} AS revenue,
           |       COUNT(*) AS n_lines
           |FROM lineitem JOIN part ON l_partkey = p_partkey
           |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           |       AND l_quantity BETWEEN 1 AND 11)
           |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           |       AND l_quantity BETWEEN 10 AND 20)
           |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
      "q20_dominant_supplier" ->
        """WITH pair_qty AS (
          |  SELECT l_partkey, l_suppkey,
          |         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
          |  FROM lineitem
          |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
          |  GROUP BY 1, 2),
          |with_total AS (
          |  SELECT *,
          |         CAST(SUM(qty) OVER (PARTITION BY l_partkey) AS BIGINT) AS total,
          |         COUNT(*) OVER (PARTITION BY l_partkey) AS n_supp
          |  FROM pair_qty)
          |SELECT s_suppkey, s_name,
          |       COUNT(*) AS n_dominated,
          |       CAST(SUM(qty) AS BIGINT) AS qty_shipped
          |FROM with_total JOIN supplier ON l_suppkey = s_suppkey
          |WHERE qty * n_supp > 3 * total
          |GROUP BY 1, 2 ORDER BY n_dominated DESC, s_suppkey""".stripMargin)
  }
}
