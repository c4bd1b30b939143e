package graft

import org.apache.spark.sql.functions._
import graft.text.HeavyHitters

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("MG sketch keeps every true heavy hitter, estimates within n/k") {
    val words = graft.tables.Tables.documents(spark, sf)
      .select(explode(split(lower(col("text")), " ")).as("word"))
      .filter(col("word").rlike("^[a-z]{2,}$"))
      .as[String].collect()
    val n = words.length.toLong
    val exact = words.groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }
    val bound = n / HeavyHitters.K

    val sketch = HeavyHitters.heavyHitters(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    assert(sketch.size <= HeavyHitters.K)
    // guarantee 1: every item with true count > n/k survives
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
  }

  test("sketch is deterministic across runs on the same input") {
    val a = HeavyHitters.heavyHitters(spark, sf).collect().toSeq
    val b = HeavyHitters.heavyHitters(spark, sf).collect().toSeq
    assert(a == b)
  }
}
