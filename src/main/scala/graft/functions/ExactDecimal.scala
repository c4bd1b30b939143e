package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact, summation-order-free aggregation for decimal-grid measures.
  *
  * `round(sum(price·(1−disc)), 4)` is only safe while the double sum
  * stays far from a rounding boundary: at a ~6e9 total the double ulp is
  * ~1e-6, so a few hundred accumulated last-ulp differences (Spark and
  * DuckDB sum in different orders) can cross the 5e-5 boundary — which
  * is exactly what a 10× scale-up of the whole-table TPC-H aggregates
  * produced. The cure is to leave IEEE space entirely: prices, discounts
  * and taxes live on a 0.01 grid, so `floor(x·100 + 0.5)` recovers the
  * exact scaled integer on both engines (the true value is an integer;
  * no .5 boundary exists), integer sums are exact in ANY order, and one
  * final division by the scale is the same bits everywhere. Headroom:
  * a 3-factor charge sum scales by 10^6 — overflow needs Σ > 9e12 in
  * data units, i.e. ~10 PB of lineitem; switch to DECIMAL(38) sums
  * beyond that.
  */
object ExactDecimal {

  /** 0.01-grid value → exact scaled long. */
  def s2(c: Column): Column = floor(c * lit(100) + lit(0.5)).cast("long")

  /** Exact Σ x for a 0.01-grid column. */
  def sum2(c: Column): Column = sum(s2(c)) / lit(100.0)

  /** Exact Σ p·(1−d). */
  def sumRevenue(p: Column, d: Column): Column =
    sum(s2(p) * (lit(100L) - s2(d))) / lit(10000.0)

  /** Exact Σ p·(1−d) over rows where `cond` holds. */
  def sumRevenueIf(cond: Column, p: Column, d: Column): Column =
    sum(when(cond, s2(p) * (lit(100L) - s2(d))).otherwise(lit(0L))) / lit(10000.0)

  /** Exact Σ p·(1−d)·(1+t). */
  def sumCharge(p: Column, d: Column, t: Column): Column =
    sum(s2(p) * (lit(100L) - s2(d)) * (lit(100L) + s2(t))) / lit(1000000.0)

  /** DuckDB spellings of the same expressions (shared by the oracles). */
  val Sql2 = "CAST(floor(%s * 100 + 0.5) AS BIGINT)"
  def sql2(x: String): String = Sql2.format(x)
  def sqlSum2(x: String): String =
    s"(CAST(SUM(${sql2(x)}) AS BIGINT) / 100.0)"
  def sqlSumRevenue(p: String, d: String): String =
    s"(CAST(SUM(${sql2(p)} * (100 - ${sql2(d)})) AS BIGINT) / 10000.0)"
  def sqlSumRevenueIf(cond: String, p: String, d: String): String =
    s"(CAST(SUM(CASE WHEN $cond THEN ${sql2(p)} * (100 - ${sql2(d)}) ELSE 0 END) AS BIGINT) / 10000.0)"
  def sqlSumCharge(p: String, d: String, t: String): String =
    s"(CAST(SUM(${sql2(p)} * (100 - ${sql2(d)}) * (100 + ${sql2(t)})) AS BIGINT) / 1000000.0)"
}
