package graft

import org.apache.spark.sql.functions._
import graft.text.HeavyHitters

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("MG sketch keeps every true heavy hitter, estimates within n/k") {
    val wordsDf = graft.tables.Tables.documents(spark, sf)
      .select(explode(split(lower(col("text")), " ")).as("word"))
      .filter(col("word").rlike("^[a-z]{2,}$"))
    val words = wordsDf.as[String].collect()
    val n = words.length.toLong
    val exact = words.groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }
    val bound = n / HeavyHitters.K

    // raw sketch (the query's internal candidate pass)
    val agg = new HeavyHitters.MisraGries(HeavyHitters.K)
    val sketch = wordsDf.as[String].groupByKey(_ => 0)
      .agg(agg.toColumn.name("mg")).collect().head._2

    assert(sketch.size <= HeavyHitters.K)
    // guarantee 1: every item with true count > n/k survives the sketch
    val mustKeep = exact.filter(_._2 > bound).keySet
    assert(mustKeep.subsetOf(sketch.keySet),
      s"missing heavy hitters: ${mustKeep -- sketch.keySet}")
    // guarantee 2: estimates never exceed the true count and
    // underestimate by at most n/k
    sketch.foreach { case (w, est) =>
      val truth = exact.getOrElse(w, 0L)
      assert(est <= truth, s"$w overestimated: $est > $truth")
      assert(truth - est <= bound, s"$w underestimated beyond n/k")
    }

    // the QUERY (sketch candidates → exact recount → threshold) returns
    // EXACTLY the true heavy hitters with exact counts
    val result = HeavyHitters.heavyHitters(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = exact.filter { case (_, c) => c * HeavyHitters.K > n }
    assert(result == expected)
  }

  test("sketch is deterministic across runs on the same input") {
    val a = HeavyHitters.heavyHitters(spark, sf).collect().toSeq
    val b = HeavyHitters.heavyHitters(spark, sf).collect().toSeq
    assert(a == b)
  }
}
