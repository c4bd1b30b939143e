package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables._

/** Sampling operators for training-data curation: stratified
  * down-sampling (class rebalancing) and a deterministic content-hash
  * train/eval split.
  *
  * The hash split keys on md5 — the one hash both engines implement
  * identically — so the assignment is reproducible anywhere and stable
  * under repartitioning, unlike rand()-based splits. Stratified sampling
  * uses Spark's seeded per-stratum Bernoulli sampling (`sampleBy`);
  * output depends on Spark's RNG stream → rows-only check, proportions
  * pinned in SamplingSpec.
  *
  * Scale: both are single-pass map-side operators — no shuffle until the
  * output aggregate/sort.
  */
object Sampling {

  /** Rebalance the corpus: keep half of the dominant language, all of
    * the rest (per-stratum Bernoulli with a fixed seed). */
  val Fractions: Map[String, Double] =
    Map("en" -> 0.5, "fr" -> 1.0, "es" -> 1.0, "de" -> 1.0, "zh" -> 1.0)

  /** The sampled COUNT is Spark-RNG-dependent, so the query emits the
    * population plus the BOUND ASSERTION instead: fraction-1.0 strata
    * must sample exactly, the Bernoulli stratum must land within
    * 6·sd + 5 of its expectation (a ~6-sigma margin) — DuckDB then
    * hash-verifies that sampleBy met its contract per stratum. */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val docs = documents(spark, dir)
    val sampled = docs.stat.sampleBy("lang", Fractions, 42L)
      .groupBy("lang").agg(count(lit(1)).as("n_sampled"))
    val frac = coalesce(
      element_at(typedLit(Fractions), col("lang")), lit(0.0))
    docs.groupBy("lang").agg(count(lit(1)).as("n_total"))
      .join(sampled, Seq("lang"), "left")
      .withColumn("n_sampled", coalesce(col("n_sampled"), lit(0L)))
      .withColumn("tol", when(frac === 1.0 || frac === 0.0, lit(0.0))
        .otherwise(lit(6.0) * sqrt(col("n_total") * frac * (lit(1.0) - frac))
          + lit(5.0)))
      .select(col("lang"), col("n_total"),
        (abs(col("n_sampled") - frac * col("n_total")) <= col("tol"))
          .as("sampled_ok"))
      .orderBy("lang")
  }

  /** Deterministic train/eval split on md5(doc_id): hex digits 0-9,a-c
    * (13/16 ≈ 81 %) train, d-f eval — identical assignment in any
    * engine, stable under shuffles and reruns. */
  def hashSplit(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .withColumn("split",
        when(substring(md5(col("doc_id").cast("string")), 1, 1) < "d", "train")
          .otherwise("eval"))
      .select("doc_id", "split")
      .orderBy("doc_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stratified_sample" -> stratifiedSample _,
    "hash_split"        -> hashSplit _)

  val oracles: Map[String, String] = Map(
    "stratified_sample" ->
      """SELECT lang, COUNT(*) AS n_total, TRUE AS sampled_ok
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "hash_split" ->
      """SELECT doc_id,
        |       CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'd'
        |            THEN 'train' ELSE 'eval' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin)
}
