package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables._

/** fastText-style linear quality classifier INFERENCE at corpus scale —
  * the shape of CCNet / LLaMA's "page looks like a Wikipedia reference"
  * scorer: hash each token and token-bigram into a bounded feature
  * space, look the buckets up in a weight table, sum, threshold.
  *
  * The weights here are a deterministic stand-in for a learned model
  * (bucket b ↦ ((b·2654435761) mod 8191) − 4095, Knuth multiplicative —
  * integer arithmetic both engines reproduce bit-for-bit), because
  * shipping real learned floats is a model artifact, not an engine
  * feature. What the ENGINE owns — and what this operator pins — is the
  * inference plan: explode features in-scan, bucket via the one hash
  * both engines share (md5, first 6 hex digits → 24-bit int, mod B),
  * BROADCAST-join the B-row weight table, one map-side-combined
  * groupBy(doc_id). Swapping the synthetic weights for a trained
  * table changes nothing about the plan.
  *
  * Scale shape: the weight table is O(B)=65536 rows regardless of
  * corpus size → always broadcastable; the per-doc reduction combines
  * map-side; no shuffle of anything but the (doc_id, partial-sum)
  * stream. Score is an INTEGER sum (exact on both engines in any
  * association order); the float quality score is a single final
  * division per doc.
  */
object Classifier {

  val Buckets = 1 << 16
  val WeightMod = 8191
  val WeightBias = 4095

  /** The B-row "model": bucket → integer weight. Pure function of the
    * bucket id, so the DuckDB oracle can inline it; Spark still
    * materializes and broadcast-joins it to keep the real plan. */
  def weightTable(spark: SparkSession): DataFrame =
    spark.range(Buckets.toLong).toDF("bucket")
      .withColumn("weight",
        (col("bucket") * lit(2654435761L)) % WeightMod - WeightBias)

  def qualityClassifier(spark: SparkSession, dir: String): DataFrame = {
    // fused tokenize→featurize→md5-bucket kernel ([[FeatureBuckets]]):
    // one codegen'd pass over the document bytes replaces the
    // split/zip_with/concat/explode-strings/md5-hex/conv pipeline —
    // the explode below fans out compact longs, not feature strings.
    // Bucket integers are IDENTICAL to the oracle's hex-digit Horner
    // sum (first 6 md5 hex digits ≡ first 3 digest bytes).
    // byte-gated spread (r17, verdict #3): ungated, the exchange + 32
    // shuffle tasks anti-scaled on the KB-grade sf0.1 corpus (driver
    // c8/c32 ratio 0.47); 256 KB/core keeps it unspread there and the
    // sf10 decade (where the kernel is the cost) still fires
    val feats = spread(documents(spark, dir), col("doc_id"), 256 * 1024)
      .select(col("doc_id"), explode(
        FeatureBuckets.feature_buckets(col("text"), Buckets)).as("bucket"))
    feats
      .join(broadcast(weightTable(spark)), "bucket")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_feats"), sum("weight").as("score_raw"))
      .withColumn("quality",
        round(col("score_raw").cast("double") / col("n_feats") / WeightBias, 6))
      .withColumn("label", col("score_raw") > 0)
      .select("doc_id", "n_feats", "score_raw", "quality", "label")
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "quality_classifier" -> qualityClassifier _)

  val oracles: Map[String, String] = Map(
    // the oracle inlines both the md5 bucket (explicit hex-digit Horner
    // sum ≡ Spark's conv(hex,16,10)) and the weight function the Spark
    // side broadcast-joins — same integers, same final division
    "quality_classifier" ->
      """WITH docs AS (
        |  SELECT doc_id,
        |         string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS t
        |  FROM documents
        |  WHERE len(string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ')) > 0
        |    AND string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ')[1] <> ''),
        |feats AS (
        |  SELECT doc_id,
        |         unnest(list_concat(t,
        |           CASE WHEN len(t) >= 2
        |                THEN list_transform(range(1, CAST(len(t) AS INTEGER)),
        |                       i -> t[CAST(i AS INTEGER)] || ' ' ||
        |                            t[CAST(i + 1 AS INTEGER)])
        |                ELSE [] END)) AS f
        |  FROM docs),
        |hashed AS (
        |  SELECT doc_id,
        |         ((strpos('0123456789abcdef', substr(md5(f), 1, 1)) - 1) * 1048576 +
        |          (strpos('0123456789abcdef', substr(md5(f), 2, 1)) - 1) * 65536 +
        |          (strpos('0123456789abcdef', substr(md5(f), 3, 1)) - 1) * 4096 +
        |          (strpos('0123456789abcdef', substr(md5(f), 4, 1)) - 1) * 256 +
        |          (strpos('0123456789abcdef', substr(md5(f), 5, 1)) - 1) * 16 +
        |          (strpos('0123456789abcdef', substr(md5(f), 6, 1)) - 1)) % 65536
        |           AS bucket
        |  FROM feats),
        |scored AS (
        |  SELECT doc_id,
        |         count(*) AS n_feats,
        |         sum((bucket * 2654435761) % 8191 - 4095) AS score_raw
        |  FROM hashed GROUP BY doc_id)
        |SELECT doc_id,
        |       CAST(n_feats AS BIGINT) AS n_feats,
        |       CAST(score_raw AS BIGINT) AS score_raw,
        |       round(CAST(score_raw AS DOUBLE) / n_feats / 4095, 6) AS quality,
        |       score_raw > 0 AS label
        |FROM scored
        |ORDER BY doc_id""".stripMargin)
}
