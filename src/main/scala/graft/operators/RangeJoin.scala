package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned range join — the 100 TB execution path for `point BETWEEN lo
  * AND hi` joins that Joins.rangeBandJoin documents: instead of a
  * broadcast nested-loop (quadratic when neither side broadcasts), both
  * sides map onto fixed-width bins — each band replicates into every bin
  * its [lo, hi) interval overlaps, each point lands in exactly one — and
  * the join becomes a plain equi-join on the bin key (shuffle-partition-
  * able, AQE-skew-splittable) with the exact range predicate re-applied
  * after. Same rows as the nested-loop plan, hash-join cost.
  *
  * `binSize` trades replication (bands span hi-lo / binSize bins)
  * against bin selectivity; `domainMax` clamps open-ended bands so a
  * sentinel hi (1e9) does not explode into millions of bins.
  */
object RangeJoin {

  def binned(points: DataFrame, valueCol: String,
      bands: DataFrame, loCol: String, hiCol: String,
      binSize: Double, domainMax: Double): DataFrame = {
    val bin: Column => Column = c => floor(c / binSize).cast("long")
    val pb = points.withColumn("__bin", bin(col(valueCol)))
    val bb = bands.withColumn("__bin", explode(sequence(
      bin(col(loCol)),
      bin(least(col(hiCol), lit(domainMax))))))
    pb.join(bb, Seq("__bin"))
      .filter(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop("__bin")
  }
}
