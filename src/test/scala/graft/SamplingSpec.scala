package graft

import org.apache.spark.sql.functions._
import graft.queries.Sampling

class SamplingSpec extends SparkSpec {

  test("stratified sample hits per-stratum fractions and is seed-stable") {
    val a = Sampling.stratifiedSample(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // non-downsampled strata keep every row; 'en' lands near 50%
    Sampling.Fractions.foreach { case (lang, frac) =>
      a.get(lang).foreach { case (total, sampled) =>
        if (frac == 1.0) assert(sampled == total, lang)
        else {
          val ratio = sampled.toDouble / total
          assert(math.abs(ratio - frac) < 0.2, s"$lang ratio $ratio vs $frac")
        }
      }
    }
    // same seed → identical sample on rerun
    val b = Sampling.stratifiedSample(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(a == b)
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
