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

  test("profile is ONE scan (Expand, not a union of per-column passes)") {
    val df = Profiling.profileOrders(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan
      .toString.split("== Initial Plan ==").head
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"expected 1 scan, got $scans:\n$plan")
    assert(plan.contains("Expand"), "multi-distinct must fold via Expand")
  }
}
