package graft
import org.apache.spark.sql.SparkSession
/** Scratch: time named queries on a dir (3 runs each, prints min). */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, names @ _*) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      // mirror Bench's session (extensions included) so timings compare
      .withExtensions(new org.apache.spark.sql.graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("SPARK_GRAFT_PARFIRST", "false"))
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    names.foreach { n =>
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).count()
        val t = (System.nanoTime() - t0) / 1e9
        // release persisted blocks OUTSIDE the timed window (Bench's
        // releaseCaches policy — without it the persisted sketch/sig
        // frames of earlier runs accumulate and inflate later queries)
        try spark.catalog.clearCache() catch { case _: Throwable => () }
        t
      }
      println(f"[time] $n min=${times.min}%.3f runs=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
