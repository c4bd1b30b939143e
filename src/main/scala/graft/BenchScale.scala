package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic ×N scale-up of an sf testdata dir, for the scale section
  * of [[Bench]]: sf0.1 → "sf1" without synthesizing new distributions.
  *
  * A naive union of N identical copies would be WRONG for the dedup /
  * similarity benchmarks: every document would gain N−1 exact cross-copy
  * duplicates, so LSH candidate pairs would grow ×N² instead of the ×N a
  * real corpus with a constant duplicate RATE shows. Each copy is instead
  * transformed so within-copy structure (join fan-out, dup rate, session
  * shapes, cosine-neighbor geometry) is preserved exactly while
  * cross-copy rows are unrelated:
  *
  *  - all integer keys shift by copy·1e9 → joins stay within-copy, key
  *    cardinality scales ×N;
  *  - document text is Caesar-shifted per copy (codegen'd `translate`):
  *    token lengths / whitespace / dup structure identical, cross-copy
  *    shingle sets disjoint;
  *  - embeddings are dimension-rotated per copy: norms and within-copy
  *    angles exact-preserved, cross-copy cosines decorrelated;
  *  - dimension tables (region, nation) keep their real-world fixed size.
  */
object BenchScale {

  val Factor = 10
  private val Shift = 1000000000L

  private val Lower = "abcdefghijklmnopqrstuvwxyz"
  private val Upper = Lower.toUpperCase
  private def caesar(c: Int): (String, String) = {
    val k = c % 26
    (Lower + Upper,
      Lower.drop(k) + Lower.take(k) + Upper.drop(k) + Upper.take(k))
  }

  private def shifted(df: DataFrame, c: Int, keys: String*): DataFrame =
    keys.foldLeft(df)((d, k) => d.withColumn(k, col(k) + lit(c * Shift)))

  /** One transformed copy of every fact table (dims excluded). */
  private def copyOf(spark: SparkSession, src: String, c: Int)
      : Map[String, DataFrame] = {
    import graft.tables.Tables.table
    val (from, to) = caesar(c)
    Map(
      "customer" -> shifted(table(spark, src, "customer"), c, "c_custkey"),
      "supplier" -> shifted(table(spark, src, "supplier"), c, "s_suppkey"),
      "part"     -> shifted(table(spark, src, "part"), c, "p_partkey"),
      "orders"   -> shifted(table(spark, src, "orders"), c, "o_orderkey", "o_custkey"),
      "lineitem" -> shifted(table(spark, src, "lineitem"), c,
        "l_orderkey", "l_partkey", "l_suppkey"),
      "events"   -> shifted(table(spark, src, "events"), c, "event_id", "user_id"),
      "documents" -> shifted(table(spark, src, "documents"), c, "doc_id")
        .withColumn("text", translate(col("text"), from, to)),
      "embeddings" -> shifted(table(spark, src, "embeddings"), c, "vec_id")
        .withColumn("embedding",
          // rotate dims by c: norm and within-copy dot products unchanged
          concat(
            slice(col("embedding"), lit(c + 1),
              size(col("embedding")) - lit(c)),
            slice(col("embedding"), lit(1), lit(c)))))
  }

  /** Generate the scaled dir if absent (marker-gated); returns the dir. */
  def ensure(spark: SparkSession, srcDir: String, outDir: String): String = {
    val marker = new java.io.File(outDir, "_GRAFT_SCALED_OK")
    if (marker.exists()) return outDir
    new java.io.File(outDir).mkdirs()
    for (dim <- Seq("region", "nation"))
      graft.tables.Tables.table(spark, srcDir, dim)
        .write.mode("overwrite").parquet(s"$outDir/$dim.parquet")
    val copies = (0 until Factor).map(c => copyOf(spark, srcDir, c))
    for (name <- copies.head.keys) {
      val unioned = copies.map(_(name)).reduce(_.unionByName(_))
      // fact tables land as multiple files — the multi-file layout a real
      // sf1 dir would have, and the parallelism the bench should see
      unioned.repartition(8).write.mode("overwrite")
        .parquet(s"$outDir/$name.parquet")
    }
    java.nio.file.Files.writeString(marker.toPath, s"src=$srcDir factor=$Factor")
    outDir
  }
}
