package graft
import org.apache.spark.sql.SparkSession
/** Utility: pre-generate the scaled bench dirs (marker-gated, same
  * outputs the Bench mains build on demand).
  * Usage: runMain graft.ScaleGen <sf0.1Dir> [sf1Out] [sf10Out] */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val sf1Out = args.lift(1).getOrElse("/root/repo/target/graft_sf1")
    val sf10Out = args.lift(2).getOrElse("/root/repo/target/graft_sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val d1 = BenchScale.ensure(spark, src, sf1Out)
    println(f"[scalegen] sf1 at $d1 (${(System.nanoTime() - t0) / 1e9}%.1f s)")
    val t1 = System.nanoTime()
    val d10 = BenchScale.ensure10x(spark, d1, sf10Out)
    println(f"[scalegen] sf10 at $d10 (${(System.nanoTime() - t1) / 1e9}%.1f s)")
    spark.stop()
  }
}
