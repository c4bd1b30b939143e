package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.tables.Tables._

/** Training-data chunking: split documents into fixed-size overlapping
  * windows (context-window preparation) and pack chunks into
  * token-budget bins — the two steps between corpus selection and
  * tokenizer ingestion in an LLM data pipeline.
  *
  * Chunk identity is pinned by md5 (the hash both engines share), so the
  * oracle verifies actual chunk CONTENT, not just counts. Packing is the
  * deterministic contiguous-fill formulation: chunks ordered by
  * (doc_id, chunk_id) within a shard, bin = cumulative-tokens-before
  * DIV budget — expressible identically in SQL, and the per-shard
  * partitioning is exactly how packing parallelizes at 100 TB (a global
  * greedy pack would serialize on one worker).
  */
object Chunking {

  val ChunkChars = 500
  val ChunkStride = 400 // 100-char overlap between consecutive chunks
  val PackTokens = 512L
  val Shards = 8

  /** Overlapping chunks: start offsets 0, stride, 2·stride … < len. */
  def docChunks(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .select(col("doc_id"), col("text"))
      // greatest(len-1, 0): an empty doc yields exactly one empty chunk in
      // BOTH engines (Spark's double-division truncates -1/stride toward
      // zero, DuckDB's // floors to -1 — guarding the numerator at 0
      // removes the divergence instead of leaning on corpus content)
      .withColumn("chunk_id", explode(sequence(lit(0),
        (greatest(length(col("text")) - 1, lit(0)) / ChunkStride).cast("int"))))
      .withColumn("chunk",
        expr(s"substring(text, chunk_id * $ChunkStride + 1, $ChunkChars)"))
      .select(
        col("doc_id"), col("chunk_id"),
        length(col("chunk")).as("chunk_len"),
        ((length(col("chunk")) + 3) / 4).cast("int").as("est_tokens"),
        md5(col("chunk").cast("binary")).as("chunk_md5"))
      .orderBy("doc_id", "chunk_id")

  /** Pack chunks into `PackTokens`-budget bins per shard (contiguous
    * fill in (doc_id, chunk_id) order). */
  def contextPack(spark: SparkSession, dir: String): DataFrame = {
    val chunks = docChunks(spark, dir)
      .withColumn("shard", (col("doc_id") % Shards).cast("int"))
    val w = Window.partitionBy("shard").orderBy("doc_id", "chunk_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    chunks
      .withColumn("cum_tokens", sum("est_tokens").over(w))
      .withColumn("pack_id",
        ((col("cum_tokens") - col("est_tokens")) / PackTokens).cast("long"))
      .groupBy("shard", "pack_id")
      .agg(
        count(lit(1)).as("n_chunks"),
        sum("est_tokens").as("pack_tokens"),
        min("doc_id").as("first_doc"),
        max("doc_id").as("last_doc"))
      .orderBy("shard", "pack_id")
  }

  /** GLOBAL concat-and-chop sequence packing — the GPT-pretraining
    * batch layout: every document's tokens are laid end-to-end in one
    * corpus-wide stream (doc_id order) and chopped into fixed
    * [[SeqLen]]-token training sequences; each doc reports the
    * sequence span it lands in and its offset inside the first one.
    *
    * Unlike [[contextPack]]'s per-shard bins, the offsets here are a
    * GLOBAL running sum — the op a naive plan serializes through one
    * task (`Window` with no partitionBy). The scalable shape is the
    * classic two-pass distributed prefix sum (Blelloch scan) over
    * range partitions:
    *   1. range-partition by doc_id and pin the layout
    *      (localCheckpoint — the partition assignment must not be
    *      re-sampled between passes);
    *   2. per-partition token totals → driver (O(partitions) rows),
    *      folded into per-partition base offsets;
    *   3. per-partition running sum (spillable WindowExec, every
    *      partition in parallel) + broadcast base offset.
    * Per-task work is n/P at any corpus size (P scales with the
    * cluster); nothing global ever sits in one task. Output is
    * integer-exact, independent of partition boundaries by
    * construction — so the DuckDB oracle is the direct single-window
    * formulation. */
  val SeqLen = 2048L
  val PackParts = 32

  def sequencePack(spark: SparkSession, dir: String): DataFrame =
    sequencePackWith(spark, dir, PackParts)

  private[graft] def sequencePackWith(spark: SparkSession, dir: String,
      nParts: Int): DataFrame = {
    val toks = documents(spark, dir)
      .select(col("doc_id"),
        size(filter(split(lower(trim(col("text"))), "\\s+"),
          w => w =!= "")).cast("long").as("n_tokens"))
    // pass 0: pin the range layout — repartitionByRange SAMPLES its
    // boundaries per execution, and the totals pass and the scan pass
    // must see the SAME pid assignment
    val parts = toks.repartitionByRange(nParts, col("doc_id"))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint()
    // pass 1: per-partition totals → cumulative base offsets (driver
    // fold over ≤ nParts rows)
    val totals = parts.groupBy("pid").agg(sum("n_tokens").as("t"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val bases = totals.scanLeft((-1, 0L, 0L)) {
      case ((_, acc, t0), (p, t)) => (p, acc + t0, t)
    }.drop(1).map { case (p, base, _) => (p, base) }
    val s = spark
    import s.implicits._
    val baseDf = bases.toSeq.toDF("pid", "base")
    // pass 2: per-partition running sum + broadcast base
    val w = Window.partitionBy("pid").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    parts
      .withColumn("cum", sum("n_tokens").over(w))
      .join(broadcast(baseDf), Seq("pid"))
      .withColumn("start_tok", col("base") + col("cum") - col("n_tokens"))
      .filter(col("n_tokens") > 0) // an empty doc occupies no sequence
      .select(col("doc_id"), col("n_tokens"), col("start_tok"),
        expr(s"start_tok div $SeqLen").as("first_seq"),
        expr(s"(start_tok + n_tokens - 1) div $SeqLen").as("last_seq"),
        (col("start_tok") % SeqLen).as("seq_offset"))
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "doc_chunks"   -> docChunks _,
    "context_pack" -> contextPack _,
    "sequence_pack" -> sequencePack _)

  val oracles: Map[String, String] = Map(
    // the single-window global formulation the two-pass prefix sum must
    // equal exactly (all integers — no summation-order hazard)
    "sequence_pack" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |         CAST(len(list_filter(
         |           regexp_split_to_array(lower(trim(text)), '\\s+'),
         |           x -> x <> '')) AS BIGINT) AS n_tokens
         |  FROM documents),
         |p AS (
         |  SELECT doc_id, n_tokens,
         |         CAST(SUM(n_tokens) OVER (ORDER BY doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |           - n_tokens AS BIGINT) AS start_tok
         |  FROM t)
         |SELECT doc_id, n_tokens, start_tok,
         |       CAST(start_tok // $SeqLen AS BIGINT) AS first_seq,
         |       CAST((start_tok + n_tokens - 1) // $SeqLen AS BIGINT) AS last_seq,
         |       CAST(start_tok % $SeqLen AS BIGINT) AS seq_offset
         |FROM p WHERE n_tokens > 0 ORDER BY doc_id""".stripMargin,
    "doc_chunks" ->
      s"""WITH c AS (
         |  SELECT doc_id, text,
         |         unnest(list_transform(
         |           range(0, CAST(GREATEST(length(text) - 1, 0) // $ChunkStride + 1 AS BIGINT)),
         |           i -> i)) AS chunk_id
         |  FROM documents),
         |s AS (
         |  SELECT doc_id, CAST(chunk_id AS INTEGER) AS chunk_id,
         |         substr(text, CAST(chunk_id * $ChunkStride + 1 AS INTEGER), $ChunkChars) AS chunk
         |  FROM c)
         |SELECT doc_id, chunk_id,
         |       CAST(length(chunk) AS INTEGER) AS chunk_len,
         |       CAST((length(chunk) + 3) // 4 AS INTEGER) AS est_tokens,
         |       md5(chunk) AS chunk_md5
         |FROM s ORDER BY doc_id, chunk_id""".stripMargin,
    "context_pack" ->
      s"""WITH c AS (
         |  SELECT doc_id, text,
         |         unnest(list_transform(
         |           range(0, CAST(GREATEST(length(text) - 1, 0) // $ChunkStride + 1 AS BIGINT)),
         |           i -> i)) AS chunk_id
         |  FROM documents),
         |s AS (
         |  SELECT doc_id, CAST(chunk_id AS INTEGER) AS chunk_id,
         |         CAST((length(substr(text, CAST(chunk_id * $ChunkStride + 1 AS INTEGER), $ChunkChars)) + 3) // 4 AS INTEGER) AS est_tokens,
         |         CAST(doc_id % $Shards AS INTEGER) AS shard
         |  FROM c),
         |p AS (
         |  SELECT *, CAST(SUM(est_tokens) OVER (PARTITION BY shard
         |            ORDER BY doc_id, chunk_id
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |            AS cum_tokens
         |  FROM s)
         |SELECT shard, (cum_tokens - est_tokens) // $PackTokens AS pack_id,
         |       COUNT(*) AS n_chunks,
         |       CAST(SUM(est_tokens) AS BIGINT) AS pack_tokens,
         |       MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
         |FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
}
