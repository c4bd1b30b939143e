package graft

import org.apache.spark.sql.functions._
import graft.queries.Sampling

class SamplingSpec extends SparkSpec {

  test("stratified sample hits per-stratum fractions and is seed-stable") {
    // raw sampleBy counts (what the query audits internally)
    val docs = graft.tables.Tables.documents(spark, sf)
    def counts() = docs.stat.sampleBy("lang", Sampling.Fractions, 42L)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val a = counts()
    Sampling.Fractions.foreach { case (lang, frac) =>
      totals.get(lang).foreach { total =>
        val sampled = a.getOrElse(lang, 0L)
        if (frac == 1.0) assert(sampled == total, lang)
        else {
          val ratio = sampled.toDouble / total
          assert(math.abs(ratio - frac) < 0.2, s"$lang ratio $ratio vs $frac")
        }
      }
    }
    // same seed → identical sample on rerun
    assert(a == counts())
    // the query's per-stratum bound assertion holds everywhere
    val audit = Sampling.stratifiedSample(spark, sf).collect()
    assert(audit.nonEmpty)
    audit.foreach(r => assert(r.getBoolean(2), s"bound failed for ${r.getString(0)}"))
  }

  test("hash split is deterministic, exhaustive, and ~81/19") {
    val split = Sampling.hashSplit(spark, sf).cache()
    val n = split.count()
    assert(n == graft.tables.Tables.documents(spark, sf).count())
    val train = split.filter(col("split") === "train").count()
    val ratio = train.toDouble / n
    assert(ratio > 0.6 && ratio < 0.95, s"train ratio $ratio")
    // stable across evaluations
    assert(split.exceptAll(Sampling.hashSplit(spark, sf)).count() == 0)
  }
}
