package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch (r17, deleted at round end): banded-bucket size census for
  * dedup_minhash at a given sf dir — how much pair expansion the LSH
  * self-join pays (Σ g², the SMJ group-buffer work). */
object ScratchR17 {
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
    import graft.tables.Tables._
    val docs = documents(spark, sfDir).filter(length(col("text")) >= 5)
    val sk = docs.select(col("doc_id"),
      graft.functions.SigKernelColumns.md5_perm_sketch(col("text"), 5, 192)
        .as("sketch"))
    val banded = sk
      .select(col("doc_id"), col("sketch"),
        explode(lit((0 until 32).toArray)).as("band"))
      .select(col("doc_id"), col("band"),
        (shiftleft(col("sketch").getItem(col("band") * 6).cast("long"), 31) +
          col("sketch").getItem(col("band") * 6 + 1).cast("long")).as("s0"),
        (shiftleft(col("sketch").getItem(col("band") * 6 + 2).cast("long"), 31) +
          col("sketch").getItem(col("band") * 6 + 3).cast("long")).as("s1"),
        (shiftleft(col("sketch").getItem(col("band") * 6 + 4).cast("long"), 31) +
          col("sketch").getItem(col("band") * 6 + 5).cast("long")).as("s2"))
    val bandedC = banded.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    bandedC.count()
    val sigEq = Seq("s0", "s1", "s2")
      .map(n => col(s"x.$n") === col(s"y.$n"))
      .foldLeft(col("x.band") === col("y.band"))(_ && _)
    def pairs(left: org.apache.spark.sql.DataFrame) =
      left.as("x").join(bandedC.as("y"),
          sigEq && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
        .distinct()
    def time(tag: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[scratch] $tag rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    (1 to 2).foreach { _ =>
      time("smj")(pairs(bandedC).count())
      time("shj")(pairs(bandedC.hint("shuffle_hash")).count())
    }
    spark.stop()
  }
}
