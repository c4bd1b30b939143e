package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Scratch: per-stage wall/task/shuffle profile for named queries — the
  * "where does the time go" companion to [[TimeOne]] (the bench UI is
  * disabled, so this is the stage-metrics window into a query). Session
  * config mirrors [[Bench]]'s exactly (extensions included) so the plans
  * profiled here are the plans the bench times. Usage:
  *   runMain graft.StageDiag <sfDir> <query> [query ...]
  * Prints one line per stage (tasks, wall ms, executor cpu ms, shuffle
  * read/write bytes, spill) plus the query total, and writes
  * explain("formatted") to target/plans/<query>.txt. */
object StageDiag {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, names @ _*) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .withExtensions(new org.apache.spark.sql.graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val tm = si.taskMetrics
        val wall = (for {s <- si.submissionTime; c <- si.completionTime}
          yield c - s).getOrElse(-1L)
        stages.add(f"[stage] id=${si.stageId}%4d tasks=${si.numTasks}%4d " +
          f"wall=${wall}%6dms cpu=${tm.executorCpuTime / 1000000}%7dms " +
          f"run=${tm.executorRunTime}%7dms " +
          f"shR=${tm.shuffleReadMetrics.totalBytesRead}%10d " +
          f"shW=${tm.shuffleWriteMetrics.bytesWritten}%10d " +
          f"spill=${tm.diskBytesSpilled}%8d  ${si.name.take(60)}")
      }
    }
    new java.io.File("target/plans").mkdirs()
    names.foreach { n =>
      val warm = sys.env.get("SPARK_GRAFT_DIAG_WARM").forall(_ != "0")
      if (warm) { // one unprofiled warm pass: JIT + page cache outside the window
        try SparkEntry.queries(n)(spark, sfDir).count()
        catch { case e: Throwable => println(s"[diag] $n warm failed: $e") }
        try spark.catalog.clearCache() catch { case _: Throwable => () }
      }
      stages.clear()
      spark.sparkContext.addSparkListener(listener)
      val df = SparkEntry.queries(n)(spark, sfDir)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"target/plans/$n.txt"),
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      val t0 = System.nanoTime()
      val cnt = df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      // let the listener bus drain so every stage of THIS query is captured
      Thread.sleep(300)
      spark.sparkContext.removeSparkListener(listener)
      println(s"\n===== $n rows=$cnt total=${f"$sec%.3f"}s =====")
      stages.forEach(s => println(s))
    }
    spark.stop()
  }
}
