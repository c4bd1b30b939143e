package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.tables.Tables

/** The SQL entry path: temp views + `spark.sql`, exercising parser →
  * analyzer → optimizer on scalar subqueries, correlated EXISTS, and
  * CTE + window composition. The SQL text is ANSI enough to run verbatim
  * on DuckDB — each oracle IS the executed query, so this pack also
  * pins Spark's SQL dialect against a second implementation.
  */
object SqlInterface {

  private def registerViews(spark: SparkSession, dir: String): Unit = {
    Seq("orders", "customer", "lineitem", "part").foreach(t =>
      Tables.table(spark, dir, t).createOrReplaceTempView(t))
    Tables.events(spark, dir).createOrReplaceTempView("events")
  }

  // scalar subquery over MAX (not AVG): min/max are summation-order-free,
  // so the comparison threshold is the identical double in both engines
  val ScalarSubquerySql: String =
    """SELECT o_orderpriority, COUNT(*) AS n_above_half_max
      |FROM orders
      |WHERE o_totalprice > (SELECT MAX(o_totalprice) FROM orders) / 2
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  val CorrelatedExistsSql: String =
    """SELECT c_mktsegment, COUNT(*) AS n_customers
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey
      |                AND o.o_totalprice > 150000)
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  val CteWindowSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, ROUND(SUM(value), 2) AS tot
      |  FROM events GROUP BY event_type, CAST(ts AS DATE))
      |SELECT event_type, day, tot,
      |       ROUND(tot - LAG(tot) OVER (PARTITION BY event_type ORDER BY day), 2) AS delta
      |FROM daily ORDER BY event_type, day""".stripMargin

  val GroupingSetsSql: String =
    """SELECT event_type, user_id, COUNT(*) AS cnt,
      |       CAST(GROUPING(event_type) * 2 + GROUPING(user_id) AS INTEGER) AS gid
      |FROM events GROUP BY GROUPING SETS ((event_type), (user_id), ())
      |ORDER BY gid, event_type NULLS FIRST, user_id NULLS FIRST""".stripMargin

  // NOT IN subquery — Spark plans a null-aware anti join; the list here
  // is provably non-null so both engines return the anti-join set (the
  // empty-on-NULL three-valued case is pinned in SqlInterfaceSpec).
  val NotInSql: String =
    """SELECT p_partkey, p_brand FROM part
      |WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem
      |                        WHERE l_quantity >= 49)
      |ORDER BY p_partkey""".stripMargin

  // Recursive CTE (Spark 4 + DuckDB share the syntax): integer-recursion
  // date spine left-joined to daily counts — zero-filled calendar without
  // a generator function. DATE + int is a date in both dialects.
  val RecursiveSpineSql: String =
    """WITH RECURSIVE n(i) AS (
      |  SELECT 0
      |  UNION ALL
      |  SELECT i + 1 FROM n WHERE i < 29),
      |spine AS (SELECT DATE '2024-01-01' + i AS day FROM n),
      |daily AS (SELECT CAST(ts AS DATE) AS day, COUNT(*) AS cnt
      |          FROM events GROUP BY 1)
      |SELECT s.day, COALESCE(d.cnt, CAST(0 AS BIGINT)) AS cnt
      |FROM spine s LEFT JOIN daily d ON d.day = s.day
      |ORDER BY s.day""".stripMargin

  private def run(sql: String)(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(sql)
  }

  /** Custom expressions through their registered SQL names — no DuckDB
    * equivalent (rows-only); SqlInterfaceSpec pins SQL-path ≡ Column-path. */
  def sqlCustomFunctions(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    Tables.documents(spark, dir).createOrReplaceTempView("documents")
    org.apache.spark.sql.graft.GraftFunctions.registerAll(spark)
    spark.sql(
      """SELECT doc_id, text_fingerprint(text) AS fp,
        |       sketch_agreement(minhash_sketch(text), minhash_sketch(text)) AS self_agreement
        |FROM documents ORDER BY doc_id""".stripMargin)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sql_scalar_subquery"   -> run(ScalarSubquerySql) _,
    "sql_correlated_exists" -> run(CorrelatedExistsSql) _,
    "sql_cte_window"        -> run(CteWindowSql) _,
    "sql_grouping_sets"     -> run(GroupingSetsSql) _,
    "sql_not_in"            -> run(NotInSql) _,
    "sql_recursive_spine"   -> run(RecursiveSpineSql) _,
    "sql_custom_functions"  -> sqlCustomFunctions _)

  val oracles: Map[String, String] = Map(
    "sql_scalar_subquery"   -> ScalarSubquerySql,
    "sql_correlated_exists" -> CorrelatedExistsSql,
    "sql_cte_window"        -> CteWindowSql,
    "sql_grouping_sets"     -> GroupingSetsSql,
    "sql_not_in"            -> NotInSql,
    "sql_recursive_spine"   -> RecursiveSpineSql)
}
