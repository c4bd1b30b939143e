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

  /** Schema-driven profile of `df`: one output row per column. */
  def profile(df: DataFrame): DataFrame = {
    val fields = df.schema.fields.toSeq
    val aggs: Seq[Column] = count(lit(1)).as("__n") +: fields.flatMap { f =>
      val c = col(f.name)
      Seq(
        sum(when(c.isNull, 1L).otherwise(0L)).as(s"nn_${f.name}"),
        countDistinct(c).as(s"nd_${f.name}")) ++
        (if (minMaxable(f.dataType))
          // min/max in the NATIVE type, cast after: string min of a
          // numeric column is lexicographic ('999' > '1499') — wrong
          Seq(asStr(min(c), f.dataType).as(s"mn_${f.name}"),
            asStr(max(c), f.dataType).as(s"mx_${f.name}"))
        else
          Seq(lit(null).cast("string").as(s"mn_${f.name}"),
            lit(null).cast("string").as(s"mx_${f.name}")))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = fields.map(f =>
      s"'${f.name}', nn_${f.name}, nd_${f.name}, mn_${f.name}, mx_${f.name}")
      .mkString(", ")
    one.selectExpr("__n",
      s"stack(${fields.size}, $stackArgs) AS " +
        "(column_name, n_nulls, n_distinct, min_val, max_val)")
      .select(col("column_name"), col("__n").as("n_rows"),
        col("n_nulls"), col("n_distinct"), col("min_val"), col("max_val"))
      .orderBy("column_name")
  }

  def profileOrders(spark: SparkSession, dir: String): DataFrame =
    profile(Tables.orders(spark, dir))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "profile_orders" -> profileOrders _)

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
