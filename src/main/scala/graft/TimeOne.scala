package graft
import org.apache.spark.sql.SparkSession
/** Scratch: time named queries on a dir (3 runs each, prints min). */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, names @ _*) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    names.foreach { n =>
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[time] $n min=${times.min}%.3f runs=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
