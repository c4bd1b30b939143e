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

  /** True when every value of `dt` has an INJECTIVE string image
    * ([[distinctImage]]), so an exact distinct count over images equals
    * one over values — the gate for the narrow-census exact plan. */
  private def imageable(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType | StringType |
         BooleanType | TimestampType | TimestampNTZType | DateType => true
    case DoubleType | FloatType => true
    case _: DecimalType => true // fixed scale per column → canonical text
    case _ => false
  }

  /** Injective string image of `c` for distinct COUNTING only (never
    * emitted): floats normalize -0.0 → 0.0 first (`c + 0.0`), matching
    * aggregation's group normalization, and NaN (one distinct group in
    * an aggregate) images as the single literal 'NaN'; every other
    * covered type's cast already round-trips. */
  private def distinctImage(c: Column, dt: DataType): Column = dt match {
    case DoubleType => when(isnan(c), lit("NaN"))
      .otherwise((c + lit(0.0d)).cast("string"))
    case FloatType => when(isnan(c), lit("NaN"))
      .otherwise((c + lit(0.0f)).cast("string"))
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
    * Exact plan shape (r16): when every column is [[imageable]], the
    * multi-distinct aggregate's Expand plan is replaced by a NARROW
    * census — `stack` each row to (gid, injective string image), one
    * hash-aggregating groupBy(gid, v) census, count survivors per gid —
    * plus one Expand-free pass for count/nulls/min/max. The old plan
    * Expanded every row ×(#cols+1) into ONE aggregate whose string
    * min/max buffers forced SortAggregate: a per-partition SORT of the
    * whole fan-out on a 7-field key, then the same sort again after the
    * exchange (measured 3.0 s at sf0.1, 46 s at sf10, spill-prone —
    * guide §1.2/§5: hash agg over narrow keys beats sort agg over wide
    * ones). Counts are identical: the image is injective per type and
    * nulls are excluded exactly as countDistinct excludes them. A
    * schema with any non-imageable column (binary, complex) keeps the
    * legacy single-aggregate Expand plan — correctness first.
    *
    * `exact=false` swaps the exact distinct for
    * `approx_count_distinct` (HLL++, one sketch per column folded in
    * a single aggregate, no Expand). At 100 TB the approx mode
    * is the one to run; the exact mode remains the oracle. */
  def profile(df: DataFrame, exact: Boolean = true): DataFrame = {
    if (exact && df.schema.fields.forall(f => imageable(f.dataType)))
      return profileNarrow(df)
    profileExpand(df, exact)
  }

  /** Narrow-census exact profile (see [[profile]]). */
  private def profileNarrow(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val fields = df.schema.fields.toSeq
    val n = fields.size
    val in0 = df.select(fields.zipWithIndex.map {
      case (f, i) => col(s"`${f.name.replace("`", "``")}`").as(s"c$i")
    }: _*)
    // byte-gated spread (r17, verdict #3): the census fan-out is a
    // moderate per-byte kernel, and the ungated exchange anti-scaled on
    // KB-grade inputs (driver c8/c32 ratio 0.31 — 32 shuffle tasks cost
    // more than the serialized stack on a 2.7 MB table); the 256 KB/core
    // gate keeps sf0.1 unspread and fires from the tens-of-MB decades up
    val in = graft.tables.Tables.spread(in0,
      xxhash64(in0.columns.map(col).toIndexedSeq: _*), 256 * 1024)
    // pass A: exact distinct counts over (gid, image) — narrow keys,
    // hash-aggregating end to end, nulls excluded like countDistinct
    val stackArgs: Seq[Column] = lit(n) +: fields.zipWithIndex.flatMap {
      case (f, i) => Seq(lit(i), distinctImage(col(s"c$i"), f.dataType))
    }
    val nd = in.select(stack(stackArgs: _*).as(Seq("gid", "v")))
      .filter(col("v").isNotNull)
      .groupBy("gid", "v").agg(count(lit(1)).as("one"))
      .groupBy("gid").agg(count(lit(1)).as("n_distinct"))
    // gid spine: a zero-row (or all-null-column) input must still emit
    // one row per column with n_distinct = 0, like countDistinct does
    val spine = spark.range(n).select(col("id").cast("int").as("gid"))
    val ndFull = spine.join(nd, Seq("gid"), "left")
      .withColumn("n_distinct", coalesce(col("n_distinct"), lit(0L)))
    // pass B: everything countDistinct did NOT need the Expand for —
    // row count, per-column nulls and typed min/max — in one agg pass
    val aggs: Seq[Column] = count(lit(1)).as("__n") +:
      fields.zipWithIndex.flatMap { case (f, i) =>
        val c = col(s"c$i")
        coalesce(sum(when(c.isNull, 1L).otherwise(0L)), lit(0L))
          .as(s"nn_$i") +:
          (if (minMaxable(f.dataType))
            Seq(asStr(min(c), f.dataType).as(s"mn_$i"),
              asStr(max(c), f.dataType).as(s"mx_$i"))
          else
            Seq(lit(null).cast("string").as(s"mn_$i"),
              lit(null).cast("string").as(s"mx_$i")))
      }
    val oneB = in.agg(aggs.head, aggs.tail: _*)
    def byGid(prefix: String): Column =
      element_at(array(fields.indices.map(i => col(s"$prefix$i")): _*),
        col("gid") + 1)
    ndFull.crossJoin(broadcast(oneB))
      .select(
        element_at(array(fields.map(f => lit(f.name)): _*), col("gid") + 1)
          .as("column_name"),
        col("__n").as("n_rows"), byGid("nn_").as("n_nulls"),
        col("n_distinct"), byGid("mn_").as("min_val"),
        byGid("mx_").as("max_val"))
      .orderBy("column_name")
  }

  /** Legacy single-aggregate profile: one scan, multi-distinct Expand
    * (exact) or HLL sketches (approx). */
  private def profileExpand(df: DataFrame, exact: Boolean): DataFrame = {
    val fields = df.schema.fields.toSeq
    // positional aliases: the ONLY place the user's column name appears
    // is as a quoted literal value in the output
    val in0 = df.select(fields.zipWithIndex.map {
      case (f, i) => col(s"`${f.name.replace("`", "``")}`").as(s"c$i")
    }: _*)
    // the Expand fan-out (#cols+1 agg rows per input row) is the
    // profile's dominant per-task cost; spread it across the session's
    // cores when the scan is split-starved (guide §2.5 — a no-op on any
    // input with >= cores splits). Keyed on a hash of the whole row:
    // deterministic, and uniform for any schema.
    val in = graft.tables.Tables.spread(in0,
      xxhash64(in0.columns.map(col).toIndexedSeq: _*), 256 * 1024)
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
