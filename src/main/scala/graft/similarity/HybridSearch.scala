package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.tables.Tables._

/** Hybrid retrieval with reciprocal-rank fusion — the serving shape
  * every modern retrieval stack (lexical index + vector index) runs,
  * and the selection primitive RAG-style eval/decontamination pipelines
  * need over a training corpus.
  *
  * Two independent rankers per query document:
  *  - lexical: shared-distinct-word overlap with the query doc, ranked
  *    through an inverted-index join — the corpus side is exploded
  *    (doc_id, word) pairs, the query side is a BROADCAST term table
  *    (queries are a fixed handful regardless of corpus size), so the
  *    work is linear in corpus tokens with one (query, candidate)
  *    aggregation; candidates that share no term never materialize.
  *  - vector: exact cosine over the embedding column (the `knn_brute`
  *    kernel: broadcast query vectors, codegen'd [[Similarity.dot]]);
  *    at 100 TB the drop-in replacement is the `knn_ivf` candidate
  *    path — the fusion below is agnostic to how each list was cut.
  *
  * Fusion is Cormack/Clarke/Buettcher reciprocal-rank fusion:
  * `score(d) = Σ_lists 1/(k + rank_list(d))` with k = 60, summed over
  * the lists where d appears in the top [[ListN]]; absence contributes
  * 0 (the standard top-N-window RRF, which is what keeps each list —
  * and therefore the fused candidate set — bounded at scale). Output
  * columns are ranks only (integers): the rrf doubles ORDER the rows
  * (bit-identical in both engines — one IEEE division per list and one
  * add from identical integer ranks) but are never emitted, so the
  * driver hash never compares floats.
  */
object HybridSearch {

  /** Query documents: doc_id < HQ (doc_id ≡ vec_id in the testdata). */
  val HQ = 10
  /** Per-list window: top-N from each ranker enter the fusion. */
  val ListN = 20
  /** Fused results kept per query. */
  val TopK = 10
  /** RRF smoothing constant (the value the original paper fixed). */
  val RrfK = 60

  def hybridRrf(spark: SparkSession, dir: String): DataFrame =
    hybridFrom(spark, dir, spread(documents(spark, dir), col("doc_id"), 256 * 1024)
      .select(col("doc_id"),
        explode(array_distinct(split(lower(trim(col("text"))), "\\s+")))
          .as("word"))
      .filter(col("word") =!= ""))

  /** [[hybridRrf]] with the lexical list read off the STANDING postings
    * table: the kw ranker consumes exactly distinct (doc_id, word)
    * pairs, which IS the postings key — the index serves it with zero
    * tokenization and the word column's row-group stats intact.
    * Bit-identical lists → same oracle. */
  def hybridIndexed(spark: SparkSession, dir: String): DataFrame =
    hybridFrom(spark, dir,
      graft.text.Postings.postings(spark, dir).select("doc_id", "word"))

  /** Shared fusion body over a distinct (doc_id, word) lexical frame. */
  private def hybridFrom(spark: SparkSession, dir: String,
      words: DataFrame): DataFrame = {
    val emb = spread(embeddings(spark, dir), col("vec_id"), 512 * 1024)
      .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("v"))
      .withColumn("n", Similarity.norm(col("v")))
    val qv = emb.filter(col("vec_id") < HQ)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("n").as("qn"))
    val vecList = emb.join(broadcast(qv), col("vec_id") =!= col("query_id"))
      .withColumn("cos",
        round(Similarity.dot(col("v"), col("qv")) / (col("n") * col("qn")), 6))
      .withColumn("rank_vec", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("cos"), col("vec_id"))))
      .filter(col("rank_vec") <= ListN)
      .select(col("query_id"), col("vec_id").as("doc_id"),
        col("rank_vec").cast("int").as("rank_vec"))
    val queryTerms = words.filter(col("doc_id") < HQ)
      .select(col("doc_id").as("query_id"), col("word"))
    val kwList = words.join(broadcast(queryTerms), Seq("word"))
      .filter(col("doc_id") =!= col("query_id"))
      .groupBy("query_id", "doc_id")
      .agg(count(lit(1)).as("kw_score"))
      .withColumn("rank_kw", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("kw_score"), col("doc_id"))))
      .filter(col("rank_kw") <= ListN)
      .select(col("query_id"), col("doc_id"),
        col("rank_kw").cast("int").as("rank_kw"))

    def contrib(rank: Column): Column =
      coalesce(lit(1.0) / (lit(RrfK) + rank.cast("double")), lit(0.0))
    vecList.join(kwList, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf", contrib(col("rank_vec")) + contrib(col("rank_kw")))
      .withColumn("rrf_rank", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("rrf"), col("doc_id"))))
      .filter(col("rrf_rank") <= TopK)
      .select(col("query_id"), col("rrf_rank").cast("int").as("rrf_rank"),
        col("doc_id"), col("rank_vec"), col("rank_kw"))
      .orderBy("query_id", "rrf_rank")
  }

  /** BM25 more-like-this ranking — the standard lexical relevance
    * function (Robertson/Spärck Jones term saturation + document-length
    * normalization), query-by-document over the same [[HQ]] query docs
    * as [[hybridRrf]]: each query doc's distinct words are the query
    * terms, every corpus doc sharing a term is scored
    * `Σ_t idf_t · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))`.
    *
    * idf is the RATIONAL odds form `(N−df+0.5)/(df+0.5)` WITHOUT the
    * log: ln is not IEEE-correctly-rounded and measurably differs in
    * the last ulp between the JVM and DuckDB (verified on this
    * corpus's df grid), which would poison the hash gate; the odds
    * form keeps every operation (+,·,/) correctly rounded, so scores
    * are bit-identical across engines with NO rounding anywhere. Log
    * damping is monotone per term, so per-term ordering is unchanged
    * (the tfidf_keywords float-free doctrine applied to BM25).
    *
    * Scale: the inverted-index join against a BROADCAST bounded query-
    * term table is linear in corpus tokens, and NOTHING word-keyed ever
    * shuffles the full corpus: postings are semi-joined to the bounded
    * query vocabulary FIRST, df for the surviving terms is a map-side-
    * combining `groupBy(word).count()` (partial aggregation collapses
    * the Zipf hot key per task — a word-keyed WINDOW would serialize
    * every posting of "the" through one task at web scale), and dl is
    * the doc-keyed `groupBy(doc_id).sum(tf)` (uniform key) joined back.
    * The per-(query,doc) term sum is ORDER-PINNED (fold over
    * word-sorted terms) so float summation order can never diverge. */
  val Bm25K1 = 1.2
  val Bm25B = 0.75

  /** Postings with tf, df (per word, corpus-wide, only for words in the
    * broadcast `vocab`) and dl (per doc) — the census shape shared by
    * [[bm25Rank]] and any tf-idf-family consumer: zero word-keyed
    * windows, the word-keyed aggregate is partial-agg-combined. */
  private def tfDfDl(tf: DataFrame, vocab: DataFrame): DataFrame = {
    // df census only for query-vocabulary words: the semi-join cuts the
    // census to the terms anyone asked about, and partial aggregation
    // makes the one word-keyed exchange carry one row per (task, word)
    val df = tf.join(broadcast(vocab), Seq("word"), "left_semi")
      .groupBy("word").agg(count(lit(1)).as("df"))
    // document length is doc-keyed (uniform) — never skewed
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    tf.join(broadcast(vocab), Seq("word"), "left_semi")
      .join(broadcast(df), Seq("word"))
      .join(dl, Seq("doc_id"))
  }

  def bm25Rank(spark: SparkSession, dir: String): DataFrame = {
    val docs = documents(spark, dir)
    // tf counted IN the scan ([[graft.text.TokenCounts]]): a document's
    // tokens all live in one row, so the explode → groupBy(doc_id, word)
    // form shuffled the corpus's entire token stream just to bring equal
    // pairs together — the kernel emits the already-unique
    // (doc_id, word, tf) relation with zero exchange (guide §2.4), with
    // counts spec-pinned identical to the explode pipeline's.
    val tf = graft.tables.Tables.spread(docs, col("doc_id"))
      .select(col("doc_id"),
        explode(graft.text.TokenCounts.token_counts(col("text"))))
      .select(col("doc_id"), col("key").as("word"), col("value").as("tf"))
    bm25Score(docs, tf)
  }

  /** [[bm25Rank]] off the STANDING postings table
    * ([[graft.text.Postings]]) instead of a fresh corpus tokenization —
    * the day-2 serving shape: the text is never re-scanned, the index
    * appends incrementally, and scores are bit-identical to the
    * from-scratch path (same tf rows, same fold order), so the same
    * oracle hash-verifies both. */
  def bm25Indexed(spark: SparkSession, dir: String): DataFrame =
    bm25Score(documents(spark, dir),
      graft.text.Postings.postings(spark, dir).select("doc_id", "word", "tf"))

  /** BM25 scoring over a prepared `tf` frame (doc_id, word, tf). */
  private def bm25Score(docs: DataFrame, tf: DataFrame): DataFrame = {
    val scalars = docs.select(count(lit(1)).as("n_docs"))
      .crossJoin(tf.select(sum("tf").as("total_words")))
    val queryTerms = tf.filter(col("doc_id") < HQ)
      .select(col("doc_id").as("query_id"), col("word")).distinct()
    val stats = tfDfDl(tf, queryTerms.select("word").distinct())
    val cand = stats.join(broadcast(queryTerms), Seq("word"))
      .filter(col("doc_id") =!= col("query_id"))
      .crossJoin(broadcast(scalars))
      .withColumn("avgdl",
        col("total_words").cast("double") / col("n_docs"))
      // expression structure mirrored EXACTLY in the oracle SQL: same
      // association, same integer→double widening points
      .withColumn("s",
        ((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          (col("tf") * lit(Bm25K1 + 1.0)) /
          (col("tf") + lit(Bm25K1) *
            (lit(1.0 - Bm25B) + lit(Bm25B) * col("dl") / col("avgdl"))))
    // ORDER-PINNED per-(query,doc) sum as a running window over
    // word-ascending rows — the [[graft.dedup.Dedup.pagerankIterations]]
    // fold shape: the same left-to-right IEEE additions the
    // collect_list → sort_array → aggregate() form performed (words are
    // unique per pair, so (word, s)-struct order ≡ word order and the
    // running sum's last row is bit-identical to the fold), but with no
    // per-group array build, struct sort, or interpreted lambda — that
    // stage was 1.46 s of bm25_rank's 2.9 s at sf0.1 (guide §1.2). All
    // three window functions share one (pair, word-order) spec → ONE
    // spillable WindowExec, never a per-pair in-memory buffer.
    val byPair = Window.partitionBy("query_id", "doc_id").orderBy("word")
    val runningS = byPair.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val entireP = byPair.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    cand
      .withColumn("bm25", sum("s").over(runningS))
      .withColumn("rn", row_number().over(byPair))
      .withColumn("cnt", count(lit(1)).over(entireP))
      .filter(col("rn") === col("cnt"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("bm25"), col("doc_id"))))
      .filter(col("rk") <= TopK)
      .select(col("query_id"), col("rk").cast("int").as("rk"),
        col("doc_id"), col("bm25"))
      .orderBy("query_id", "rk")
  }

  /** Positional phrase search — the positional-inverted-index operator
    * a lexical engine needs beyond bag-of-words: exact adjacent-token
    * phrase occurrences per document. The plan is the INDEX shape:
    * tokens carry their position (posexplode), postings are filtered
    * to the phrase vocabulary via BROADCAST joins BEFORE anything
    * shuffles (only phrase-term postings cross the wire at 100 TB),
    * and a phrase match is an equi-join on (doc, second word, pos+1) —
    * position arithmetic as a join key, never a scan of the text. The
    * oracle is the trivially-correct formulation (per-row adjacent
    * bigram unnest) the index path must agree with. Positions are raw
    * token-array indices in BOTH engines (empty tokens not filtered),
    * so adjacency is defined identically. */
  val Phrases: Seq[String] =
    Seq("table hash", "part filter", "customer join", "merge group")

  def phraseSearch(spark: SparkSession, dir: String): DataFrame =
    phraseFrom(spark, documents(spark, dir)
      .select(col("doc_id"),
        posexplode(split(lower(trim(col("text"))), "\\s+")))
      .toDF("doc_id", "pos", "word"))

  /** [[phraseSearch]] off the standing positional postings table —
    * positions stored per (doc, word) replay the identical token
    * ordinals (same `\s+` split in both paths), so adjacency join
    * keys — and the oracle — are unchanged. THE index advantage the
    * raw-text path cannot have: the phrase vocabulary is a LITERAL In
    * predicate on the word column, so it pushes into the parquet scan
    * (row-group stats + dictionary page filtering) — only phrase-term
    * postings are ever decoded out of the word-keyed table, a
    * vanishing fraction of the corpus at any scale. */
  def phraseIndexed(spark: SparkSession, dir: String): DataFrame = {
    val vocab = Phrases.flatMap(_.split(" ", 2)).distinct
    phraseFrom(spark, graft.text.Postings.postings(spark, dir)
      .filter(col("word").isin(vocab: _*))
      .select(col("doc_id"), col("word"),
        explode(col("positions")).as("pos")))
  }

  private def phraseFrom(spark: SparkSession, toksIn: DataFrame): DataFrame = {
    val s = spark
    import s.implicits._
    val toks = toksIn.select("doc_id", "pos", "word")
    val ph = Phrases.map { p =>
      val Array(a, b) = p.split(" ", 2); (p, a, b)
    }.toDF("phrase", "w1", "w2")
    val left = toks.join(broadcast(ph), col("word") === col("w1"))
      .select(col("phrase"), col("w2"), col("doc_id"), col("pos"))
    val right = toks
      .join(broadcast(ph.select(col("w2").as("rw")).distinct()),
        col("word") === col("rw"))
      .select(col("doc_id").as("doc_id2"), col("pos").as("pos2"),
        col("word").as("word2"))
    left.join(right,
        col("doc_id") === col("doc_id2") && col("word2") === col("w2") &&
          col("pos2") === col("pos") + 1)
      .groupBy("phrase", "doc_id")
      .agg(count(lit(1)).as("n_occurrences"))
      .orderBy("phrase", "doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "hybrid_rrf" -> hybridRrf _,
    "hybrid_indexed" -> hybridIndexed _,
    "bm25_rank" -> bm25Rank _,
    "bm25_indexed" -> bm25Indexed _,
    "phrase_search" -> phraseSearch _,
    "phrase_indexed" -> phraseIndexed _)

  // the standing-postings paths are bit-identical to the from-scratch
  // ones (same tf rows / positions / distinct pairs, same fold order)
  // → same oracle SQL
  val oracles: Map[String, String] = baseOracles ++ Map(
    "bm25_indexed" -> baseOracles("bm25_rank"),
    "phrase_indexed" -> baseOracles("phrase_search"),
    "hybrid_indexed" -> baseOracles("hybrid_rrf"))

  private lazy val baseOracles: Map[String, String] = Map(
    // the trivially-correct per-row adjacent-bigram formulation the
    // positional-index join must agree with
    "phrase_search" -> {
      val vals = Phrases.map(p => s"('${p}')").mkString(", ")
      s"""WITH t AS (
         |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS a
         |  FROM documents),
         |b AS (
         |  SELECT doc_id,
         |         unnest(list_transform(range(1, greatest(len(a), 1)),
         |           i -> a[CAST(i AS INTEGER)] || ' '
         |                || a[CAST(i AS INTEGER) + 1])) AS bg
         |  FROM t),
         |ph AS (SELECT * FROM (VALUES $vals) AS v(phrase))
         |SELECT ph.phrase, b.doc_id, COUNT(*) AS n_occurrences
         |FROM b JOIN ph ON b.bg = ph.phrase
         |GROUP BY ph.phrase, b.doc_id
         |ORDER BY ph.phrase, b.doc_id""".stripMargin
    },
    // constants interpolated from the Scala doubles (shortest round-trip
    // decimal → DuckDB parses back the identical bit pattern); the score
    // expression mirrors the Column expression's association exactly
    "bm25_rank" ->
      s"""WITH toks AS (
         |  SELECT doc_id, word FROM (
         |    SELECT doc_id,
         |           unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS word
         |    FROM documents)
         |  WHERE word <> ''),
         |tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
         |st AS (SELECT *, COUNT(*) OVER (PARTITION BY word) AS df,
         |              SUM(tf) OVER (PARTITION BY doc_id) AS dl FROM tf),
         |sc AS (SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
         |              (SELECT COUNT(*) FROM toks) AS total_words),
         |qt AS (SELECT DISTINCT doc_id AS query_id, word FROM toks
         |       WHERE doc_id < $HQ),
         |cand AS (
         |  SELECT qt.query_id, st.doc_id, st.word,
         |    ((sc.n_docs - st.df + 0.5::DOUBLE) / (st.df + 0.5::DOUBLE)) *
         |      (st.tf * ${Bm25K1 + 1.0}::DOUBLE) /
         |      (st.tf + $Bm25K1::DOUBLE * (${1.0 - Bm25B}::DOUBLE
         |        + $Bm25B::DOUBLE * st.dl
         |        / (CAST(sc.total_words AS DOUBLE) / sc.n_docs))) AS s
         |  FROM st JOIN qt USING (word), sc
         |  WHERE st.doc_id <> qt.query_id),
         |pd AS (SELECT query_id, doc_id,
         |         list_reduce(list(s ORDER BY word), (a, b) -> a + b) AS bm25
         |       FROM cand GROUP BY 1, 2),
         |r AS (SELECT query_id, doc_id, bm25,
         |        CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         |          ORDER BY bm25 DESC, doc_id) AS INTEGER) AS rk
         |      FROM pd)
         |SELECT query_id, rk, doc_id, bm25 FROM r WHERE rk <= $TopK
         |ORDER BY query_id, rk""".stripMargin,
    "hybrid_rrf" ->
      s"""WITH e AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |nn AS (SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS nrm FROM e),
         |vr AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
         |         ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |           ORDER BY ROUND(list_inner_product(c.v, q.v)
         |             / (c.nrm * q.nrm), 6) DESC, c.vec_id) AS rank_vec
         |  FROM nn c, nn q
         |  WHERE q.vec_id < $HQ AND c.vec_id <> q.vec_id),
         |v2 AS (SELECT query_id, doc_id, CAST(rank_vec AS INTEGER) AS rank_vec
         |       FROM vr WHERE rank_vec <= $ListN),
         |w AS (
         |  SELECT DISTINCT doc_id, word FROM (
         |    SELECT doc_id,
         |           unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS word
         |    FROM documents)
         |  WHERE word <> ''),
         |kw AS (
         |  SELECT qw.doc_id AS query_id, cw.doc_id AS doc_id,
         |         COUNT(*) AS kw_score
         |  FROM w qw JOIN w cw USING (word)
         |  WHERE qw.doc_id < $HQ AND cw.doc_id <> qw.doc_id
         |  GROUP BY 1, 2),
         |kr AS (
         |  SELECT query_id, doc_id,
         |         ROW_NUMBER() OVER (PARTITION BY query_id
         |           ORDER BY kw_score DESC, doc_id) AS rank_kw
         |  FROM kw),
         |k2 AS (SELECT query_id, doc_id, CAST(rank_kw AS INTEGER) AS rank_kw
         |       FROM kr WHERE rank_kw <= $ListN),
         |f AS (
         |  SELECT COALESCE(v2.query_id, k2.query_id) AS query_id,
         |         COALESCE(v2.doc_id, k2.doc_id) AS doc_id,
         |         v2.rank_vec, k2.rank_kw,
         |         COALESCE(CAST(1 AS DOUBLE) / ($RrfK + v2.rank_vec), 0)
         |           + COALESCE(CAST(1 AS DOUBLE) / ($RrfK + k2.rank_kw), 0)
         |           AS rrf
         |  FROM v2 FULL JOIN k2
         |    ON v2.query_id = k2.query_id AND v2.doc_id = k2.doc_id),
         |r AS (
         |  SELECT query_id, doc_id, rank_vec, rank_kw,
         |         ROW_NUMBER() OVER (PARTITION BY query_id
         |           ORDER BY rrf DESC, doc_id) AS rrf_rank
         |  FROM f)
         |SELECT query_id, CAST(rrf_rank AS INTEGER) AS rrf_rank, doc_id,
         |       rank_vec, rank_kw
         |FROM r WHERE rrf_rank <= $TopK
         |ORDER BY query_id, rrf_rank""".stripMargin)
}
