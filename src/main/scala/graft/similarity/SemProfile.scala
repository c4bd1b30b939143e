package graft.similarity

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.tables.Tables._

/** Scratch: stage timings + comparison counts for [[Similarity.semanticDedup]]. */
object SemProfile {
  import Similarity._

  def profile(spark: SparkSession, dir: String): Unit = {
    def timed[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[sem] $dir $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val emb = embeddings(spark, dir)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("n", norm(col("v")))
    val n = timed("count")(emb.count())
    val cells = scaledCells(n)
    println(s"[sem] $dir n=$n cells=$cells")
    val centroids = timed("centroids")(materializedCentroids(emb, cells))
    val assigned = timed("assign+checkpoint")(
      assignCells(emb, centroids)
        .select(col("vec_id"), col("cell"), col("v"), col("n"))
        .localCheckpoint())
    val sizes = timed("cell sizes")(
      assigned.groupBy("cell").count()
        .agg(sum(col("count") * (col("count") - 1) / 2).as("pairs"),
          max("count").as("maxcell"), avg("count").as("avgcell"))
        .collect()(0))
    println(s"[sem] $dir pairs=${sizes.get(0)} maxcell=${sizes.get(1)} avgcell=${sizes.get(2)}")
    val lhs = assigned.select(col("cell"), col("vec_id").as("ia"),
      col("v").as("va"), col("n").as("na"))
    val rhs = assigned.select(col("cell").as("cellb"), col("vec_id").as("ib"),
      col("v").as("vb"), col("n").as("nb"))
    val pruned = timed("pairwise+distinct")(
      lhs.join(rhs, col("cell") === col("cellb") && col("ia") > col("ib"))
        .filter(round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6)
          >= DedupTau)
        .select(col("ia").as("vec_id")).distinct()
        .count())
    println(s"[sem] $dir pruned=$pruned")
    val kept = timed("anti-join (early-exit)")(
      assigned.join(rhs,
          col("cell") === col("cellb") && col("vec_id") > col("ib") &&
            round(dot(col("v"), col("vb")) / (col("n") * col("nb")), 6)
              >= DedupTau,
          "left_anti")
        .count())
    println(s"[sem] $dir kept=$kept")
    timed("full query")(Similarity.semanticDedup(spark, dir).count())
  }
}
