package graft

import org.apache.spark.sql.{SaveMode, SparkSession}

/** Scratch: time the waved OPTIMIZE campaign in isolation (the
  * maintenance bench's optimize_waved op) on a fresh fixture table —
  * the A/B harness for wave-internals changes. */
object MaintDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
    val reps = sys.env.getOrElse("SPARK_GRAFT_RUNS", "2").toInt
    if (sys.env.contains("SPARK_GRAFT_MAINT_STAGES"))
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val si = sc.stageInfo
            val tm = si.taskMetrics
            val wall = (for {s <- si.submissionTime; c <- si.completionTime}
              yield c - s).getOrElse(-1L)
            println(f"[stage] id=${si.stageId}%4d tasks=${si.numTasks}%4d " +
              f"wall=${wall}%6dms cpu=${tm.executorCpuTime / 1000000}%7dms " +
              f"shR=${tm.shuffleReadMetrics.totalBytesRead}%10d " +
              f"shW=${tm.shuffleWriteMetrics.bytesWritten}%10d " +
              f"spill=${tm.diskBytesSpilled}%9d ${si.name.take(50)}")
          }
        })
    (1 to reps).foreach { r =>
      val path = graft.GraftTmp.dir("graft_maintdiag").toString
      try {
        val t = graft.table.GraftTable(spark, path, Seq("l_returnflag"))
        val li = graft.tables.Tables.lineitem(spark, sfDir)
          .select("l_orderkey", "l_linenumber", "l_quantity",
            "l_extendedprice", "l_returnflag", "l_shipdate")
        t.write(li.repartition(32))
        val liTarget = 64L * 1024 * 1024
        val t0 = System.nanoTime()
        var waves = 0
        var more = true
        while (more) {
          val vs = t.optimizeFullWaved(Seq("l_orderkey"),
            targetFileSizeBytes = liTarget, maxWaveBytes = 4 * liTarget,
            epoch = "diag-e1", maxWaves = 1)
          if (vs.isEmpty) more = false else waves += 1
        }
        println(f"[maint] rep=$r waves=$waves optimize_waved=${(System.nanoTime() - t0) / 1e9}%.3f")
      } finally scala.util.Try(
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(path)))
    }
    spark.stop()
  }
}
