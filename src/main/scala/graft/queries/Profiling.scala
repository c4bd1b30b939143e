package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.tables.Tables

/** Data-quality profiling — the deequ/SUMMARIZE-style per-column audit
  * every ingestion pipeline runs before trusting a new drop: row count,
  * null count, exact distinct count, and min/max per column, derived
  * from the DataFrame's own schema (works on any table unchanged).
  *
  * Cross-engine exactness rules: min/max are emitted only for types
  * with a canonical string form in both engines (integers, strings,
  * and timestamps formatted to their date part); float columns report
  * counts but NULL bounds (shortest-roundtrip float printing is not a
  * contract either engine makes). Distinct counts are EXACT — parquet
  * bits equal in both engines, so even double columns agree.
  *
  * Scale shape: ONE scan. All per-column metrics fold into a single
  * aggregate; the multi-column exact-distinct plans as Spark's Expand
  * (one input row fans to #cols agg rows, partial-aggregated map-side
  * before the shuffle). The per-column output rows come from stack()
  * over the single aggregated row — no second scan, no union of
  * per-column subqueries (the naive form pays #cols scans; at 100 TB
  * that is #cols times the I/O bill). */
object Profiling {

  private def minMaxable(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType | StringType |
         TimestampType | TimestampNTZType | DateType => true
    case _ => false
  }

  private def asStr(c: Column, dt: DataType): Column = dt match {
    case TimestampType | TimestampNTZType | DateType =>
      date_format(c, "yyyy-MM-dd")
    case _ => c.cast("string")
  }

  /** Schema-driven profile of `df`: one output row per column.
    *
    * Arbitrary schemas profile correctly: field names are addressed
    * positionally (internal `c<i>`/`nn_<i>`/… aliases, the literal
    * name only ever a string VALUE) so dots, spaces, quotes and
    * backticks in column names never reach a parsed expression; and
    * the null counter is `coalesce(..., 0)` so a zero-row input
    * reports 0 nulls, not NULL (sum over no rows is NULL in SQL).
    *
    * `exact=false` swaps the exact `countDistinct` (which plans as
    * Expand: every input row fans out #cols+1 times through the
    * shuffle — linear but the dominant constant of the profile) for
    * `approx_count_distinct` (HLL++, one sketch per column folded in
    * the same single aggregate, no Expand). At 100 TB the approx mode
    * is the one to run; the exact mode remains the oracle. */
  def profile(df: DataFrame, exact: Boolean = true): DataFrame = {
    val fields = df.schema.fields.toSeq
    // positional aliases: the ONLY place the user's column name appears
    // is as a quoted literal value in the output
    val in = df.select(fields.zipWithIndex.map {
      case (f, i) => col(s"`${f.name.replace("`", "``")}`").as(s"c$i")
    }: _*)
    val aggs: Seq[Column] = count(lit(1)).as("__n") +:
      fields.zipWithIndex.flatMap { case (f, i) =>
        val c = col(s"c$i")
        Seq(
          coalesce(sum(when(c.isNull, 1L).otherwise(0L)), lit(0L))
            .as(s"nn_$i"),
          (if (exact) countDistinct(c)
           else approx_count_distinct(c)).as(s"nd_$i")) ++
          (if (minMaxable(f.dataType))
            // min/max in the NATIVE type, cast after: string min of a
            // numeric column is lexicographic ('999' > '1499') — wrong
            Seq(asStr(min(c), f.dataType).as(s"mn_$i"),
              asStr(max(c), f.dataType).as(s"mx_$i"))
          else
            Seq(lit(null).cast("string").as(s"mn_$i"),
              lit(null).cast("string").as(s"mx_$i")))
      }
    val one = in.agg(aggs.head, aggs.tail: _*)
    val stacked = fields.indices.flatMap { i =>
      Seq(lit(fields(i).name), col(s"nn_$i"), col(s"nd_$i"),
        col(s"mn_$i"), col(s"mx_$i"))
    }
    one.select(col("__n"),
      stack(lit(fields.size) +: stacked: _*)
        .as(Seq("column_name", "n_nulls", "n_distinct", "min_val",
          "max_val")))
      .select(col("column_name"), col("__n").as("n_rows"),
        col("n_nulls"), col("n_distinct"), col("min_val"), col("max_val"))
      .orderBy("column_name")
  }

  def profileOrders(spark: SparkSession, dir: String): DataFrame =
    profile(Tables.orders(spark, dir))

  /** The 100 TB profile: HLL distinct counts instead of the exact
    * Expand fan-out. Rows-only in Verify by design (HLL estimates are
    * implementation-defined; ProfilingSpec pins them within standard
    * HLL tolerance of the exact counts, and every non-estimate column
    * is bit-identical to the exact profile). */
  def profileOrdersApprox(spark: SparkSession, dir: String): DataFrame =
    profile(Tables.orders(spark, dir), exact = false)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "profile_orders" -> profileOrders _,
    "profile_orders_approx" -> profileOrdersApprox _)

  val oracles: Map[String, String] = Map(
    // one subquery per column (the oracle may pay #cols scans — DuckDB
    // reads a local file; the ENGINE side must stay one scan)
    "profile_orders" -> {
      val intCols = Seq("o_orderkey", "o_custkey")
      val strCols = Seq("o_orderstatus", "o_orderpriority")
      val dateCols = Seq("o_orderdate")
      val noMm = Seq("o_totalprice")
      val parts =
        intCols.map(c => (c, s"CAST(MIN($c) AS VARCHAR)",
          s"CAST(MAX($c) AS VARCHAR)")) ++
        strCols.map(c => (c, s"MIN($c)", s"MAX($c)")) ++
        dateCols.map(c => (c, s"strftime(MIN($c), '%Y-%m-%d')",
          s"strftime(MAX($c), '%Y-%m-%d')")) ++
        noMm.map(c => (c, "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)"))
      parts.map { case (c, mn, mx) =>
        s"""SELECT '$c' AS column_name,
           |  CAST(COUNT(*) AS BIGINT) AS n_rows,
           |  CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_nulls,
           |  CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
           |  $mn AS min_val, $mx AS max_val
           |FROM orders""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
    })
}
