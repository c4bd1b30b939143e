package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables._

/** Safety / compliance passes a large-scale training-data pipeline runs
  * before anything ships to a trainer:
  *
  *  - [[piiScrub]]: regex redaction of contact PII (emails, phone
  *    numbers) with per-doc redaction counts. The synthetic corpus
  *    contains no organic PII, so the query first DERIVES a
  *    deterministic contact header from the doc's own fields (varying
  *    by doc_id so some docs carry an email, some a phone, some both,
  *    some neither) and then scrubs it — the operator under test is the
  *    redaction pipeline, verified end-to-end by the DuckDB oracle on
  *    the redacted text's md5.
  *  - [[decontaminate]]: benchmark-overlap decontamination — flag every
  *    training document sharing at least one word 8-gram with a held-out
  *    eval set (docs with doc_id ≡ 0 mod 97 stand in for the benchmark).
  *    The industry-standard shape (GPT-3 §C / PaLM style n-gram
  *    collision): explode grams, hash, join train grams against the
  *    DISTINCT eval-gram set, count collisions per doc.
  *
  * Scale notes: both are linear explode → hash-join shapes. The eval
  * gram set is the small side by construction (benchmarks are MBs, the
  * corpus is TBs) and broadcasts; gram join keys are 32-byte md5
  * strings, never the grams themselves. Regex redaction is a codegen'd
  * per-row map with no shuffle at all.
  */
object Safety {

  /** Character classes only — identical semantics in Java regex (Spark)
    * and RE2 (DuckDB): no lookaround, no backreferences. */
  private val EmailRe = "[a-z0-9._]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val PhoneRe = "\\b555-[0-9]{4}\\b"

  /** Deterministic synthetic contact header: email for doc_id % 3 != 0,
    * phone for doc_id % 2 == 0 — all four presence combinations occur. */
  private def withContact(docs: DataFrame) = docs.select(
    col("doc_id"),
    concat(
      when(pmod(col("doc_id"), lit(3)) =!= 0,
        concat(lit("contact user"), col("doc_id"), lit("@"),
          col("source"), lit(".example.com "))).otherwise(lit("")),
      when(pmod(col("doc_id"), lit(2)) === 0,
        concat(lit("tel 555-"),
          lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
          lit(" "))).otherwise(lit("")),
      col("text")).as("raw"))

  def piiScrub(spark: SparkSession, dir: String): DataFrame =
    withContact(documents(spark, dir))
      .select(col("doc_id"),
        size(regexp_extract_all(col("raw"), lit(EmailRe), lit(0)))
          .cast("long").as("n_emails"),
        size(regexp_extract_all(col("raw"), lit(PhoneRe), lit(0)))
          .cast("long").as("n_phones"),
        regexp_replace(regexp_replace(col("raw"), EmailRe, "<EMAIL>"),
          PhoneRe, "<PHONE>").as("scrubbed"))
      .select(col("doc_id"), col("n_emails"), col("n_phones"),
        length(col("scrubbed")).cast("long").as("scrubbed_len"),
        md5(col("scrubbed")).as("scrubbed_md5"))
      .orderBy("doc_id")

  /** Word-gram width for decontamination. 8 is the GPT-3-style setting
    * scaled to this corpus's short documents (13 in the paper). */
  val GramWords = 8

  def decontaminate(spark: SparkSession, dir: String): DataFrame = {
    val g = GramWords
    val grams = spread(documents(spark, dir), col("doc_id"))
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("w"))
      .filter(size(col("w")) >= g)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(1, size(w) - ${g - 1}), i -> array_join(slice(w, i, $g), ' '))"))
        .as("gram"))
      .select(col("doc_id"), md5(col("gram")).as("h"))
    val evalGrams = grams.filter(pmod(col("doc_id"), lit(97)) === 0)
      .select("h").distinct()
    grams.filter(pmod(col("doc_id"), lit(97)) =!= 0)
      .join(broadcast(evalGrams.withColumn("hit", lit(1))), Seq("h"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"), count(col("hit")).as("n_contaminated"))
      .withColumn("contaminated", col("n_contaminated") > 0)
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pii_scrub" -> piiScrub _,
    "decontaminate" -> decontaminate _)

  val oracles: Map[String, String] = Map(
    "pii_scrub" ->
      s"""WITH c AS (
         |  SELECT doc_id,
         |         concat(
         |           CASE WHEN doc_id % 3 <> 0
         |                THEN 'contact user' || doc_id || '@' || source || '.example.com '
         |                ELSE '' END,
         |           CASE WHEN doc_id % 2 = 0
         |                THEN 'tel 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' '
         |                ELSE '' END,
         |           text) AS raw
         |  FROM documents),
         |s AS (
         |  SELECT doc_id,
         |         len(regexp_extract_all(raw, '$EmailRe')) AS n_emails,
         |         len(regexp_extract_all(raw, '$PhoneRe')) AS n_phones,
         |         regexp_replace(regexp_replace(raw, '$EmailRe', '<EMAIL>', 'g'),
         |                        '$PhoneRe', '<PHONE>', 'g') AS scrubbed
         |  FROM c)
         |SELECT doc_id, CAST(n_emails AS BIGINT) AS n_emails,
         |       CAST(n_phones AS BIGINT) AS n_phones,
         |       CAST(length(scrubbed) AS BIGINT) AS scrubbed_len,
         |       md5(scrubbed) AS scrubbed_md5
         |FROM s ORDER BY doc_id""".stripMargin,
    "decontaminate" ->
      s"""WITH d AS (
         |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
         |  FROM documents),
         |g AS (
         |  SELECT doc_id, md5(array_to_string(w[i : i + ${GramWords - 1}], ' ')) AS h
         |  FROM (SELECT doc_id, w,
         |          unnest(range(1, len(w) - $GramWords + 2)) AS i
         |        FROM d WHERE len(w) >= $GramWords)),
         |e AS (SELECT DISTINCT h FROM g WHERE doc_id % 97 = 0),
         |t AS (
         |  SELECT doc_id, COUNT(*) AS n_grams,
         |         COUNT(*) FILTER (WHERE h IN (SELECT h FROM e)) AS n_contaminated
         |  FROM g WHERE doc_id % 97 <> 0 GROUP BY doc_id)
         |SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
         |       CAST(n_contaminated AS BIGINT) AS n_contaminated,
         |       n_contaminated > 0 AS contaminated
         |FROM t ORDER BY doc_id""".stripMargin)
}
