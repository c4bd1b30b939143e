package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Scratch: stage-level diagnostics for the scale bench — counts the
  * LSH candidate pairs and output pairs of dedup_minhash per dir, the
  * numbers behind the bench flag notes. */
object ScaleDiag {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.dedup.Dedup._
    args.foreach { dir =>
      val banded = bandedSketch(graft.tables.Tables.documents(spark, dir))
        .select("doc_id", "band", "sig")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val cands = banded.as("x").join(banded.as("y"),
          col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
        .distinct().count()
      val out = dedupMinhash(spark, dir).count()
      banded.unpersist()
      spark.catalog.clearCache()
      println(s"[diag] $dir candidates=$cands output_pairs=$out")
    }
    spark.stop()
  }
}
