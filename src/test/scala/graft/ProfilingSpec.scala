package graft

import org.apache.spark.sql.functions._
import graft.queries.Profiling

/** Schema-driven profiling: one scan, correct per-column metrics. */
class ProfilingSpec extends SparkSpec {

  test("profile matches direct per-column recomputation (part table)") {
    val part = graft.tables.Tables.part(spark, sf)
    val got = Profiling.profile(part).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet == part.schema.fieldNames.toSet)
    val n = part.count()
    part.schema.fields.foreach { f =>
      val r = got(f.name)
      assert(r.getLong(1) == n, s"${f.name} n_rows")
      val nulls = part.filter(col(f.name).isNull).count()
      val dist = part.select(f.name).na.drop().distinct().count()
      assert(r.getLong(2) == nulls, s"${f.name} n_nulls")
      assert(r.getLong(3) == dist, s"${f.name} n_distinct")
    }
    // string bounds spot check
    val pb = got("p_brand")
    val want = part.agg(min("p_brand"), max("p_brand")).collect().head
    assert(pb.getString(4) == want.getString(0))
    assert(pb.getString(5) == want.getString(1))
    // double column reports counts but NULL bounds
    assert(got("p_retailprice").isNullAt(4))
  }

  test("approx profile: HLL distincts within tolerance, no Expand") {
    val orders = graft.tables.Tables.orders(spark, sf)
    val exact = Profiling.profile(orders).collect()
      .map(r => r.getString(0) -> r).toMap
    val approx = Profiling.profile(orders, exact = false).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (name, e) =>
      val a = approx(name)
      // every non-estimate column bit-identical to the exact profile
      assert(a.getLong(1) == e.getLong(1), s"$name n_rows")
      assert(a.getLong(2) == e.getLong(2), s"$name n_nulls")
      assert(a.getString(4) == e.getString(4), s"$name min")
      assert(a.getString(5) == e.getString(5), s"$name max")
      // HLL++ default rsd = 0.05; allow 4 sigma plus small-count slack
      val (ed, ad) = (e.getLong(3).toDouble, a.getLong(3).toDouble)
      assert(math.abs(ad - ed) <= math.max(4, 0.2 * ed),
        s"$name n_distinct exact=$ed approx=$ad")
    }
    // the approx plan must NOT pay the exact mode's Expand fan-out —
    // that is its whole point at 100 TB
    val df = Profiling.profile(orders, exact = false)
    df.collect()
    val plan = df.queryExecution.executedPlan
      .toString.split("== Initial Plan ==").head
    assert(!plan.contains("Expand"), s"approx profile must skip Expand:\n$plan")
    assert("FileScan parquet".r.findAllIn(plan).size == 1)
  }

  test("zero-row input profiles as zeros, and exotic names survive") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("k", "v")
    val rows = Profiling.profile(empty).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getLong(1) == 0L, "n_rows")
      assert(r.getLong(2) == 0L, "n_nulls must be 0, not NULL, on no rows")
      assert(r.getLong(3) == 0L, "n_distinct")
    }
    // dots, spaces, quotes and backticks in column names must not
    // reach a parsed expression
    val weird = Seq((1L, "x"), (2L, null)).toDF("a.b c", "it's `q`")
    val got = Profiling.profile(weird).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet == Set("a.b c", "it's `q`"))
    assert(got("it's `q`").getLong(2) == 1L)
    assert(got("a.b c").getLong(3) == 2L)
  }

  test("exact profile: bounded scans, hash-aggregating narrow census") {
    // r16 plan shape: the Expand multi-distinct (whose string min/max
    // buffers forced SortAggregate — a full fan-out sort) is replaced by
    // a narrow (gid, image) census + one Expand-free metrics pass. The
    // invariants: scan count is a CONSTANT (2), never #cols (a union of
    // per-column passes would be 6 here), and no sort-based aggregate
    // survives anywhere in the exact plan.
    val df = Profiling.profileOrders(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan
      .toString.split("== Initial Plan ==").head
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans <= 2, s"expected <= 2 scans, got $scans:\n$plan")
    assert(!plan.contains("Expand"),
      s"exact profile must not fan out via Expand:\n$plan")
    // the census arm must hash-aggregate; a global (grouping-free)
    // SortAggregate in the metrics arm sorts nothing and is fine
    assert("Sort \\[gid".r.findFirstIn(plan).isEmpty,
      s"narrow census must not sort by gid:\n$plan")
  }

  test("narrow exact profile ≡ legacy Expand profile, row for row") {
    // the narrow census is a PLAN change only: counts must equal the
    // multi-distinct Expand plan's on a table with nulls, doubles and
    // dates (the injective-image argument, checked end to end)
    val orders = graft.tables.Tables.orders(spark, sf)
    val narrow = Profiling.profile(orders).collect().map(_.toString).toSeq
    // force the legacy path via a schema containing a non-imageable
    // column: profile() falls back to the Expand plan for ALL columns
    val legacy = Profiling.profile(
        orders.withColumn("__bin", expr("cast(null as binary)")))
      .filter(col("column_name") =!= "__bin")
      .collect().map(_.toString).toSeq
    assert(narrow == legacy)
  }
}
