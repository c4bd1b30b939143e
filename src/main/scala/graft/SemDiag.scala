package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
/** Scratch: stage-level timing for semantic_dedup on a dir — separates
  * centroid refinement, per-row assignment, and the per-cell pairwise
  * prune, and counts the pairwise comparisons (the numbers behind the
  * sf10 flag note). */
object SemDiag {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.similarity.SemProfile._
    args.foreach { dir => profile(spark, dir) }
    spark.stop()
  }
}
