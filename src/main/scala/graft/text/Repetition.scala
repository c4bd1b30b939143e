package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.tables.Tables._

/** Gopher §A.1.1 repetition signals — the OTHER half of the Gopher
  * filter next to [[QualityFilters.gopherQuality]]'s shape rules:
  * within-document duplicate n-gram statistics.
  *
  *  - top-2-gram char mass: occurrences of the single most frequent
  *    word 2-gram × its character length (ties broken toward the
  *    SHORTEST tied gram so both engines agree without comparing
  *    strings collation-sensitively);
  *  - duplicate-5-gram coverage: the character mass of word POSITIONS
  *    covered by at least one 5-gram that occurs more than once in
  *    the document. This is the "don't double-count overlapping
  *    n-grams" union-of-spans the paper calls for — computed not by
  *    interval merging but by the equivalent trailing-window test:
  *    position p is covered iff some duplicated 5-gram STARTS in
  *    [p-4, p], i.e. `max(dup_start) over (order by i rows 4
  *    preceding..current)`.
  *
  * keep = integer arithmetic only (no float threshold drift):
  *   R1  top2_chars * 5  <= total_chars      (top 2-gram < 20% of chars)
  *   R2  dup5_chars * 20 <= total_chars * 3  (dup 5-gram cover <= 15%)
  *
  * Scale shape: ONE shuffle (explicit repartition on doc_id), then
  * every step — the per-(doc, gram) censuses, the whole-partition max,
  * the trailing coverage window, the final groupBy(doc_id) — is
  * satisfied by that clustering and runs as sorts within partitions.
  * WindowExec buffers spill, so a book-length doc never has to fit in
  * memory, and nothing joins against the rest of the corpus: linear in
  * corpus size, embarrassingly parallel across docs.
  */
object Repetition {

  def gopherRepetition(spark: SparkSession, dir: String): DataFrame = {
    val toks = spread(documents(spark, dir), col("doc_id"))
      .select(col("doc_id"),
        posexplode(split(trim(regexp_replace(col("text"), "\\s+", " ")), " "))
          .as(Seq("i0", "w")))
      .filter(col("w") =!= "")
      .select(col("doc_id"), (col("i0") + 1).as("i"), col("w"))
      .repartition(col("doc_id")) // the one shuffle; all below are sorts
    val byPos = Window.partitionBy("doc_id").orderBy("i")
    val doc = Window.partitionBy("doc_id")
    val grams = toks
      .withColumn("w1", lead("w", 1).over(byPos))
      .withColumn("w4", lead("w", 4).over(byPos))
      .withColumn("g2",
        when(col("w1").isNotNull, concat_ws(" ", col("w"), col("w1"))))
      .withColumn("g5",
        when(col("w4").isNotNull, concat_ws(" ", col("w"),
          col("w1"), lead("w", 2).over(byPos), lead("w", 3).over(byPos),
          col("w4"))))
    val counted = grams
      .withColumn("c2", when(col("g2").isNotNull,
        count(lit(1)).over(Window.partitionBy("doc_id", "g2"))))
      .withColumn("c5", when(col("g5").isNotNull,
        count(lit(1)).over(Window.partitionBy("doc_id", "g5"))))
      .withColumn("m2", max("c2").over(doc))
      .withColumn("dup",
        when(col("g5").isNotNull && col("c5") > 1, 1).otherwise(0))
      .withColumn("covered", max("dup").over(
        byPos.rowsBetween(-4, Window.currentRow)))
    counted.groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_words"),
        sum(length(col("w"))).cast("long").as("total_chars"),
        coalesce(max("c2"), lit(0L)).as("top2_n"),
        (coalesce(max("c2"), lit(0L)) *
          coalesce(min(when(col("c2") === col("m2"),
            length(col("g2")) - 1)).cast("long"), lit(0L))).as("top2_chars"),
        coalesce(sum(when(col("covered") === 1, length(col("w"))))
          .cast("long"), lit(0L)).as("dup5_chars"))
      .withColumn("keep",
        col("top2_chars") * 5 <= col("total_chars") &&
        col("dup5_chars") * 20 <= col("total_chars") * 3)
      .select("doc_id", "n_words", "total_chars", "top2_n", "top2_chars",
        "dup5_chars", "keep")
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "gopher_repetition" -> gopherRepetition _)

  val oracles: Map[String, String] = Map(
    "gopher_repetition" ->
      """WITH docs AS (
        |  SELECT doc_id,
        |         string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS t
        |  FROM documents),
        |toks AS (
        |  SELECT doc_id, u.i AS i, u.w AS w
        |  FROM (SELECT doc_id,
        |          unnest(list_transform(range(1, len(t) + 1),
        |            i -> {'i': i, 'w': t[CAST(i AS INTEGER)]})) AS u
        |        FROM docs) z
        |  WHERE u.w <> ''),
        |grams AS (
        |  SELECT doc_id, i, w,
        |         CASE WHEN lead(w, 1) OVER p IS NOT NULL
        |              THEN w || ' ' || lead(w, 1) OVER p END AS g2,
        |         CASE WHEN lead(w, 4) OVER p IS NOT NULL
        |              THEN w || ' ' || lead(w, 1) OVER p || ' ' ||
        |                   lead(w, 2) OVER p || ' ' || lead(w, 3) OVER p ||
        |                   ' ' || lead(w, 4) OVER p END AS g5
        |  FROM toks
        |  WINDOW p AS (PARTITION BY doc_id ORDER BY i)),
        |counted AS (
        |  SELECT doc_id, i, w, g2, g5,
        |         CASE WHEN g2 IS NOT NULL
        |              THEN count(*) OVER (PARTITION BY doc_id, g2) END AS c2,
        |         CASE WHEN g5 IS NOT NULL
        |              THEN count(*) OVER (PARTITION BY doc_id, g5) END AS c5
        |  FROM grams),
        |flagged AS (
        |  SELECT doc_id, i, w, g2, c2,
        |         max(c2) OVER (PARTITION BY doc_id) AS m2,
        |         max(CASE WHEN g5 IS NOT NULL AND c5 > 1 THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY doc_id ORDER BY i
        |                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS covered
        |  FROM counted)
        |SELECT doc_id,
        |       CAST(count(*) AS BIGINT) AS n_words,
        |       CAST(sum(length(w)) AS BIGINT) AS total_chars,
        |       CAST(coalesce(max(c2), 0) AS BIGINT) AS top2_n,
        |       CAST(coalesce(max(c2), 0) *
        |            coalesce(min(CASE WHEN c2 = m2
        |              THEN length(g2) - 1 END), 0) AS BIGINT) AS top2_chars,
        |       CAST(coalesce(sum(CASE WHEN covered = 1
        |              THEN length(w) END), 0) AS BIGINT) AS dup5_chars,
        |       (CAST(coalesce(max(c2), 0) *
        |             coalesce(min(CASE WHEN c2 = m2
        |               THEN length(g2) - 1 END), 0) AS BIGINT) * 5
        |          <= CAST(sum(length(w)) AS BIGINT)
        |        AND CAST(coalesce(sum(CASE WHEN covered = 1
        |              THEN length(w) END), 0) AS BIGINT) * 20
        |          <= CAST(sum(length(w)) AS BIGINT) * 3) AS keep
        |FROM flagged
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin)
}
