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

  // sql_custom_functions constants: small numPerm keeps the DuckDB
  // replay (one md5 per shingle × a 16-lane permutation cross join)
  // cheap while still exercising the registered arg plumbing
  private val FnPerm = 16
  private val FnBands = 4
  private val FnRows = FnPerm / FnBands
  private val FnHeadChars = 40

  /** Custom Catalyst expressions through their registered SQL names.
    * Since r16 the query runs the md5-affine kernel family
    * (min_md5_shingle / md5_perm_sketch / md5_band_keys /
    * sketch_agreement_int / simhash_md5), whose definitions DuckDB
    * replays from md5() + integer arithmetic — the registration path
    * itself is hash-oracled, not just rows-counted (the pre-r16 shape
    * used the OPH/xxhash functions no SQL engine can reassemble; those
    * stay registered and SqlInterfaceSpec still pins them SQL ≡
    * Column). head_agreement compares each doc's sketch against the
    * sketch of its own head — a genuine two-argument agreement with a
    * data-dependent result, unlike the old always-NumPerm self join. */
  def sqlCustomFunctions(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    Tables.documents(spark, dir).createOrReplaceTempView("documents")
    org.apache.spark.sql.graft.GraftFunctions.registerAll(spark)
    spark.sql(
      s"""SELECT doc_id,
         |       min_md5_shingle(text, 5) AS block_key,
         |       simhash_md5(text) AS simhash,
         |       sketch_agreement_int(
         |         md5_perm_sketch(text, 5, $FnPerm),
         |         md5_perm_sketch(substring(text, 1, $FnHeadChars), 5, $FnPerm)
         |       ) AS head_agreement,
         |       element_at(
         |         md5_band_keys(md5_perm_sketch(text, 5, $FnPerm),
         |                       $FnBands, $FnRows), 1) AS band0_key
         |FROM documents WHERE length(text) >= 5 ORDER BY doc_id""".stripMargin)
  }

  /** DuckDB replay of [[sqlCustomFunctions]]: the md5-affine lane CTEs
    * (permutation matrix from md5("a:j")/md5("b:j"), lanes over text
    * and over its head), the band-0 key, the min-shingle blocking key,
    * and the SimHash bit-vote — each the same formulation the dedup
    * oracles use ([[graft.dedup.Dedup.oracles]]). */
  private[graft] def sqlCustomFunctionsOracle: String = {
    import graft.dedup.Dedup.hexVal
    val P = graft.functions.SigKernels.MersennePrime
    def laneCtes(src: String, name: String): String =
      s"""sh_$name AS (
         |  SELECT doc_id, ${hexVal("substr(md5(substr(" + src + ", CAST(i AS INTEGER), 5)), 1, 8)", 8)} % $P AS h
         |  FROM (SELECT doc_id, text,
         |          unnest(range(1, greatest(length($src) - 4, 1) + 1)) AS i
         |        FROM d)
         |  WHERE length(substr($src, CAST(i AS INTEGER), 5)) = 5),
         |lanes_$name AS (
         |  SELECT doc_id, j, MIN((p.a * s.h + p.b) % $P) AS lane
         |  FROM sh_$name s CROSS JOIN perm p GROUP BY doc_id, j)""".stripMargin
    s"""WITH d AS (SELECT doc_id, text FROM documents WHERE length(text) >= 5),
       |perm AS (
       |  SELECT j,
       |         (${hexVal("substr(md5('a:' || j), 1, 8)", 8)}
       |            % ${P - 1}) + 1 AS a,
       |         ${hexVal("substr(md5('b:' || j), 1, 8)", 8)}
       |            % $P AS b
       |  FROM (SELECT unnest(range(0, $FnPerm)) AS j)),
       |${laneCtes("text", "f")},
       |${laneCtes(s"substr(text, 1, $FnHeadChars)", "h")},
       |agree AS (
       |  SELECT f.doc_id,
       |         SUM(CASE WHEN f.lane = h.lane THEN 1 ELSE 0 END) AS eq
       |  FROM lanes_f f JOIN lanes_h h
       |    ON h.doc_id = f.doc_id AND h.j = f.j
       |  GROUP BY f.doc_id),
       |band0 AS (
       |  SELECT doc_id, string_agg(CAST(lane AS VARCHAR), ',' ORDER BY j) AS key
       |  FROM lanes_f WHERE j < $FnRows GROUP BY doc_id),
       |blk AS (
       |  SELECT doc_id, MIN(md5(substr(text, CAST(i AS INTEGER), 5))) AS k
       |  FROM (SELECT doc_id, text,
       |          unnest(range(1, greatest(length(text) - 4, 1) + 1)) AS i
       |        FROM d)
       |  WHERE length(substr(text, CAST(i AS INTEGER), 5)) = 5
       |  GROUP BY doc_id),
       |tok AS (
       |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
       |  FROM d),
       |th AS (SELECT doc_id, md5(w) AS m FROM tok),
       |gv AS (SELECT doc_id,
       |         ${hexVal("substr(m, 1, 8)", 8)} AS hi,
       |         ${hexVal("substr(m, 9, 8)", 8)} AS lo
       |       FROM th),
       |votes AS (
       |  SELECT doc_id, i,
       |         SUM(CASE WHEN (CASE WHEN i < 32 THEN (lo >> i) & 1
       |                             ELSE (hi >> (i - 32)) & 1 END) = 1
       |                  THEN 1 ELSE -1 END) AS v
       |  FROM gv CROSS JOIN (SELECT unnest(range(0, 64)) AS i)
       |  GROUP BY doc_id, i),
       |sg AS (
       |  SELECT doc_id,
       |         CAST(SUM(CASE WHEN v > 0 THEN
       |           CASE WHEN i = 63 THEN CAST(-9223372036854775807 AS BIGINT) - 1
       |                ELSE CAST(1 AS BIGINT) << i END
       |           ELSE 0 END) AS BIGINT) AS sig
       |  FROM votes GROUP BY doc_id)
       |SELECT d.doc_id, blk.k AS block_key, sg.sig AS simhash,
       |       CAST(agree.eq AS INTEGER) AS head_agreement,
       |       band0.key AS band0_key
       |FROM d
       |JOIN blk ON blk.doc_id = d.doc_id
       |JOIN sg ON sg.doc_id = d.doc_id
       |JOIN agree ON agree.doc_id = d.doc_id
       |JOIN band0 ON band0.doc_id = d.doc_id
       |ORDER BY d.doc_id""".stripMargin
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
    "sql_recursive_spine"   -> RecursiveSpineSql,
    "sql_custom_functions"  -> sqlCustomFunctionsOracle)
}
