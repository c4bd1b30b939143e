package graft

import org.apache.spark.sql.functions._
import graft.queries.TpchAdvanced
import graft.tables.Tables

/** Independent invariants for the adapted TPC-H classics — each checked
  * against a differently-shaped recomputation, not the query's own plan.
  */
class TpchAdvancedSpec extends SparkSpec {

  test("q2: every reported supplier really is the cheapest for its part") {
    val out = TpchAdvanced.q2MinCostSupplier(spark, sf)
    val best = out.groupBy("p_partkey").agg(min("unit_cost").as("m"))
    val offenders = out.join(best, "p_partkey")
      .filter(col("unit_cost") =!= col("m")).count()
    assert(offenders == 0)
    // (part, supplier) pairs are unique — the argmin kept no duplicates
    assert(out.select("p_partkey", "s_suppkey").distinct().count() == out.count())
  }

  test("q13: the distribution accounts for every customer exactly once") {
    val out = TpchAdvanced.q13OrderDistribution(spark, sf)
    val total = out.agg(sum("custdist")).head.getLong(0)
    assert(total == Tables.customer(spark, sf).count())
    // customers whose every order is urgent must land in the 0 bucket,
    // not vanish: the 0 bucket equals customers with no non-urgent order
    val nonUrgent = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .select(col("o_custkey")).distinct().count()
    val zeroBucket = out.filter(col("c_count") === 0)
      .agg(coalesce(sum("custdist"), lit(0L))).head.getLong(0)
    assert(zeroBucket == Tables.customer(spark, sf).count() - nonUrgent)
  }

  test("q17: the small-quantity rows are a strict subset of the brand's rows") {
    val row = TpchAdvanced.q17SmallQuantity(spark, sf).head
    val brandRows = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf).filter(col("p_brand") === "Brand#5"),
        col("l_partkey") === col("p_partkey"), "left_semi").count()
    assert(row.getAs[Long]("n_small") > 0)
    assert(row.getAs[Long]("n_small") < brandRows)
    assert(row.getAs[Double]("avg_yearly") > 0.0)
  }

  test("q19: the disjunction equals the union of its three conjunctions") {
    val byUnion = Seq(
      ("Brand#12", 1, 5, 1, 11), ("Brand#23", 1, 10, 10, 20),
      ("Brand#34", 1, 15, 20, 30)).map { case (b, s0, s1, q0, q1) =>
      Tables.lineitem(spark, sf)
        .join(Tables.part(spark, sf)
          .filter(col("p_brand") === b && col("p_size").between(s0, s1)),
          col("l_partkey") === col("p_partkey"))
        .filter(col("l_quantity").between(q0, q1)).count()
    }.sum
    val row = TpchAdvanced.q19Disjunctive(spark, sf).head
    assert(row.getAs[Long]("n_lines") == byUnion)
  }

  test("q20: window dominance equals an independent join-based recount") {
    val out = TpchAdvanced.q20DominantSupplier(spark, sf)
    val totalDominated = out.agg(coalesce(sum("n_dominated"), lit(0L)))
      .head.getLong(0)
    // recompute with groupBy+join instead of window functions
    val pairs = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf).filter(col("p_name").startsWith("red")),
        col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy("l_partkey", "l_suppkey")
      .agg(sum(col("l_quantity").cast("long")).as("qty"))
    val totals = pairs.groupBy("l_partkey")
      .agg(sum("qty").as("total"), count(lit(1)).as("n_supp"))
    val recount = pairs.join(totals, "l_partkey")
      .filter(col("qty") * col("n_supp") > lit(3L) * col("total")).count()
    assert(totalDominated == recount)
    assert(recount > 0, "q20 must not be vacuously empty at test scale")
  }

  test("q7 is symmetric: reversing the pair swaps the direction rows") {
    val out = TpchAdvanced.q7NationVolume(spark, sf)
      .select("supp_nation", "cust_nation").distinct().collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(out.subsetOf(Set(("NATION_1", "NATION_2"), ("NATION_2", "NATION_1"))))
  }
}
