package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.tables.Tables._
import graft.functions.TextFingerprint.text_fingerprint

/** Text-analysis pack over the `documents` table — the training-data
  * pipeline operators (language ID, quality scoring, token counting,
  * fingerprinting) the builder prompt lists as first-class components.
  *
  * Parity discipline: every ratio is an exact-integer division done
  * identically in Spark and DuckDB (IEEE doubles are deterministic given
  * identical inputs), so outputs are unrounded yet hash-exact. All
  * expressions are built from codegen'd `functions._` (no UDFs) — at
  * 100 TB these are embarrassingly parallel scans with no shuffle except
  * the final order/aggregate.
  */
object TextAnalysis {

  private def words(c: Column): Column = split(trim(c), "\\s+")

  // Small public stopword lists per language (classic stopword-hit ID).
  val Stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "fr" -> Seq("le", "la", "les", "des", "une", "et", "est", "dans", "que", "pour"),
    "es" -> Seq("el", "los", "las", "una", "y", "es", "en", "que", "por", "con"),
    "de" -> Seq("der", "die", "das", "und", "ein", "eine", "ist", "von", "mit", "zu"),
    "zh" -> Seq("的", "是", "在", "了", "我", "有", "和", "不", "人", "这"))

  private def stopHits(lang: String): Column =
    size(filter(words(col("text")), w => w.isInCollection(Stopwords(lang))))

  /** Per-document surface statistics. */
  def textStats(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .select(
        col("doc_id"),
        length(col("text")).as("n_chars"),
        size(words(col("text"))).as("n_words"),
        (length(regexp_replace(col("text"), "\\s", "")).cast("double") /
          size(words(col("text")))).as("avg_word_len"),
        (size(filter(words(col("text")), w => w.isInCollection(Stopwords("en"))))
          .cast("double") / size(words(col("text")))).as("stopword_ratio"))
      .orderBy("doc_id")

  /** BPE-ish token counting: letter runs, digit runs, single punctuation.
    * The regex is deliberately RE2-compatible so the DuckDB oracle
    * tokenizes identically. */
  val TokenPattern = "[a-z]+|[A-Z][a-z]*|[0-9]+|[^a-zA-Z0-9\\s]"

  def tokenCount(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .select(
        col("doc_id"),
        size(regexp_extract_all(col("text"), lit(TokenPattern), lit(0))).as("n_tokens"),
        (length(col("text")).cast("double") /
          size(regexp_extract_all(col("text"), lit(TokenPattern), lit(0))))
          .as("chars_per_token"))
      .orderBy("doc_id")

  /** Composite quality score over col("text") — shared by quality_score
    * and corpus_select. */
  private[graft] def qualityCol: Column = {
    val nWords = size(words(col("text"))).cast("double")
    val nChars = length(col("text")).cast("double")
    val punct = size(regexp_extract_all(col("text"), lit("[^a-zA-Z0-9\\s]"), lit(0)))
      .cast("double")
    val stops = stopHits("en").cast("double")
    val avgLen = (length(regexp_replace(col("text"), "\\s", "")).cast("double") / nWords)
    val lenScore = least(nWords, lit(100.0)) / lit(100.0)
    val stopScore = least(stops / nWords * lit(5.0), lit(1.0))
    val punctScore = lit(1.0) - least(punct / nChars * lit(10.0), lit(1.0))
    val shapeScore = when(avgLen.between(3.0, 10.0), lit(1.0)).otherwise(lit(0.5))
    lenScore * lit(0.25) + stopScore * lit(0.35) +
      punctScore * lit(0.2) + shapeScore * lit(0.2)
  }

  /** Quality scoring: length, stopword density, punctuation, word shape —
    * a deterministic composite in [0, 1]. */
  def qualityScore(spark: SparkSession, dir: String): DataFrame = {
    val nWords = size(words(col("text"))).cast("double")
    documents(spark, dir)
      .select(
        col("doc_id"),
        qualityCol.as("quality"),
        nWords.cast("long").as("n_words"))
      .orderBy("doc_id")
  }

  /** Stopword-hit language ID (argmax over per-language hit counts; ties
    * resolve in fixed list order). The synthetic corpus is English-ish so
    * labels skew 'en' — TextAnalysisSpec exercises real multilingual
    * sentences. */
  private val Langs = Seq("en", "fr", "es", "de", "zh")
  private def hitCols: Seq[Column] = Langs.map(l => stopHits(l).as(s"hits_$l"))
  /** argmax over the pre-aliased hits_<lang> columns (fixed-order ties). */
  private def bestLang: Column = Langs.foldRight(lit("und")) { (l, acc) =>
    // l wins if its count strictly beats every later language and is > 0
    when(col(s"hits_$l") > 0 &&
      Langs.filter(_ != l).map(o => col(s"hits_$l") >= col(s"hits_$o"))
        .reduce(_ && _), lit(l)).otherwise(acc)
  }

  def langId(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .select(col("doc_id") +: col("lang").as("labeled_lang") +: hitCols: _*)
      .withColumn("predicted_lang", bestLang)
      .select("doc_id", "labeled_lang", "predicted_lang")
      .orderBy("doc_id")

  /** Winnowing-style document fingerprint via the custom codegen'd
    * Catalyst expression [[graft.functions.TextFingerprint]]; identical
    * fingerprints group exact-or-near-duplicate content without comparing
    * full texts (the 100 TB-friendly first pass of dedup). */
  def docFingerprint(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .select(
        col("doc_id"),
        text_fingerprint(col("text"), 8).as("fingerprint"),
        text_fingerprint(lower(regexp_replace(col("text"), "\\s+", " ")), 8)
          .as("normalized_fingerprint"))
      .orderBy("doc_id")

  /** Character-trigram top-5 per language: pack each trigram into an int
    * via the codegen'd [[TrigramPack]] (no per-position string alloc),
    * aggregate on int keys, and decode only the 25 surviving rows back
    * to strings. Same output as the naive
    * explode(transform(..substring..)) formulation, ~2× faster. */
  def trigramTopk(spark: SparkSession, dir: String): DataFrame = {
    val grams = documents(spark, dir)
      .select(col("lang"),
        explode(TrigramPack.trigrams_packed(col("text"))).as("tg"))
    grams.groupBy("lang", "tg").agg(count(lit(1)).as("cnt"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("lang").orderBy(desc("cnt"),
          // tiebreak on the decoded string to match the oracle's ordering
          col("tg"))))
      .filter(col("rk") <= 5)
      .select(col("lang"), col("rk").cast("int").as("rk"),
        concat(
          char(shiftright(col("tg"), 16).bitwiseAND(lit(255))),
          char(shiftright(col("tg"), 8).bitwiseAND(lit(255))),
          char(col("tg").bitwiseAND(lit(255)))).as("trigram"),
        col("cnt"))
      .orderBy("lang", "rk")
  }

  /** Scalar string-function breadth (P-surface beyond the reference's
    * imports): case, substring, replace, pad, reverse, position. */
  def stringFunctions(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .select(
        col("doc_id"),
        upper(substring(col("text"), 1, 12)).as("head_upper"),
        length(trim(col("text"))).as("trimmed_len"),
        regexp_replace(substring(col("text"), 1, 20), " ", "_").as("snake"),
        lpad(col("doc_id").cast("string"), 6, "0").as("padded_id"),
        reverse(substring(col("text"), 1, 10)).as("rev_head"),
        instr(col("text"), "spark").cast("long").as("spark_pos"))
      .orderBy("doc_id")

  /** Corpus-wide top-20 words via explode/unnest — the lateral-view
    * operator over a split column (word-count at scale: explode is
    * map-side, the count is one shuffle on the word key). */
  def explodeWords(spark: SparkSession, dir: String): DataFrame = {
    val w = documents(spark, dir)
      .select(explode(split(lower(col("text")), " ")).as("word"))
      .filter(col("word").rlike("^[a-z]{4,}$"))
    w.groupBy("word").agg(count(lit(1)).as("cnt"))
      .withColumn("rk", row_number().over(Window.orderBy(desc("cnt"), col("word"))))
      .filter(col("rk") <= 20)
      .select("rk", "word", "cnt")
      .orderBy("rk")
  }

  /** Distinctive-keyword extraction — tf-idf ORDERING without floats.
    * Per doc, the top-3 terms ranked by (tf DESC, df ASC, word ASC)
    * after a df-based stopword gate (`2·df ≤ n_docs`: a word appearing
    * in more than half the corpus carries no topical signal — the
    * integer-exact stand-in for an idf threshold, so Spark and DuckDB
    * can never disagree on a float). The shape a topic-tagging /
    * domain-labeling pass runs before mixture construction.
    *
    * Scale: tf is one shuffle on (doc_id, word) over exploded unique
    * pairs; df is a partial-agg `groupBy("word").count()` joined back —
    * the bm25Scores census shape (HybridSearch), NEVER a window over
    * the Zipf word key: a stopword's window partition is every document
    * containing it, serialized through ONE WindowExec task that AQE
    * cannot skew-split, while the groupBy collapses the hot key
    * map-side and the join back is AQE-skew-splittable. n_docs is a
    * one-row broadcast scalar. Identical integer df values → the
    * oracle is unchanged. */
  def tfidfKeywords(spark: SparkSession, dir: String): DataFrame =
    tfidfFrom(documents(spark, dir), scratchTf(documents(spark, dir)))

  /** (doc_id, word, tf) from a raw documents frame — the from-scratch
    * tokenization twin of the standing postings table's tf column.
    * Counted IN the scan ([[TokenCounts]] — same trim/lower/split, counts
    * spec-pinned identical): a doc's tokens live in one row, so the old
    * explode → groupBy(doc_id, word) exchange shuffled the corpus's
    * whole token stream for a count the row already determines (guide
    * §2.4 "remove shuffles outright"). */
  private[graft] def scratchTf(docs: DataFrame): DataFrame =
    graft.tables.Tables.spread(docs, col("doc_id"))
      .select(col("doc_id"),
        explode(TokenCounts.token_counts(col("text"))))
      .select(col("doc_id"), col("key").as("word"), col("value").as("tf"))

  /** [[tfidfKeywords]] off the STANDING postings table
    * ([[graft.text.Postings]]): the corpus text is never re-scanned —
    * tf rows come straight from the index, bit-identical to the
    * from-scratch path, so the same oracle hash-verifies both. */
  def tfidfIndexed(spark: SparkSession, dir: String): DataFrame =
    tfidfFrom(documents(spark, dir),
      Postings.postings(spark, dir).select("doc_id", "word", "tf"))

  private def tfidfFrom(docs: DataFrame, tf: DataFrame): DataFrame = {
    val nDocs = docs.select(count(lit(1)).as("n_docs"))
    val df = tf.groupBy("word").agg(count(lit(1)).as("df"))
    tf.join(df, Seq("word"))
      .crossJoin(broadcast(nDocs))
      .filter(col("df") * 2 <= col("n_docs"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("doc_id").orderBy(desc("tf"), col("df"), col("word"))))
      .filter(col("rk") <= 3)
      .select("doc_id", "rk", "word", "tf", "df")
      .orderBy("doc_id", "rk")
  }

  /** Regexp family over documents: match predicates, global replace as a
    * character counter — patterns kept RE2-compatible (Java ≡ DuckDB). */
  def regexpStats(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        count_if(col("text").rlike("[0-9]")).as("n_docs_digit"),
        sum(length(col("text")) - length(regexp_replace(col("text"), "[0-9]", "")))
          .as("digit_chars"),
        count_if(col("text").rlike("\\bdata\\b")).as("n_docs_data"))
      .orderBy("source")

  /** First-occurrence doc ids per normalized text — the exact-dedup
    * election shared by [[corpusSelect]] and [[filterFunnel]], as a
    * partial-agg `groupBy(norm_text).agg(min(doc_id))` (r12): a
    * boilerplate template duplicated 10⁴× makes norm_text a hot
    * CONTENT key, and a window partitioned by it would serialize every
    * copy through one WindowExec task — the groupBy collapses the hot
    * key map-side, ships narrow (norm_text, doc_id) rows only, and
    * consumers join back on the uniform doc_id key. `doc_id = min per
    * group` ≡ the old `row_number() = 1`, so the oracles (which replay
    * ROW_NUMBER) are unchanged. */
  private def firstDocsByNormText(docs: DataFrame): DataFrame = docs
    .select(lower(regexp_replace(col("text"), "\\s+", " ")).as("norm_text"),
      col("doc_id"))
    .groupBy("norm_text").agg(min("doc_id").as("doc_id"))
    .select("doc_id")

  /** End-to-end corpus selection — the composed training-data filter a
    * 100 TB pipeline runs before tokenization: exact dedup (keep the
    * min doc_id per normalized text — [[firstDocsByNormText]], the
    * skew-safe census shape), language gate (predicted English),
    * quality gate (composite ≥ 0.5). The dedup gate is a LEFT SEMI
    * join on doc_id: uniform key, one row per distinct text on the
    * build side. */
  def corpusSelect(spark: SparkSession, dir: String): DataFrame = {
    val docs = documents(spark, dir)
    docs
      .select(col("doc_id") +: col("text") +: hitCols: _*)
      .withColumn("quality", qualityCol)
      .withColumn("predicted_lang", bestLang)
      .join(firstDocsByNormText(docs), Seq("doc_id"), "left_semi")
      .filter(col("quality") >= 0.5 && col("predicted_lang") === "en")
      .select("doc_id", "quality")
      .orderBy("doc_id")
  }

  /** Filter-funnel report — how many documents (per source) survive
    * each CUMULATIVE stage of the [[corpusSelect]] cascade: raw →
    * exact-dedup → language gate → quality gate. The observability
    * artifact every corpus build ships with its output (which stage
    * ate the data, and from which source); losing it means debugging
    * a 100 TB selection by re-running it. The dedup stage reads the
    * same [[firstDocsByNormText]] census (here as a LEFT join tag —
    * the funnel needs the non-survivors counted too) plus one
    * conditional-count pass. */
  def filterFunnel(spark: SparkSession, dir: String): DataFrame = {
    val docs = documents(spark, dir)
    docs
      .select(col("doc_id") +: col("source") +: col("text") +: hitCols: _*)
      .withColumn("quality", qualityCol)
      .withColumn("predicted_lang", bestLang)
      .join(firstDocsByNormText(docs).withColumn("is_first", lit(true)),
        Seq("doc_id"), "left")
      .withColumn("is_first", coalesce(col("is_first"), lit(false)))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        count_if(col("is_first")).as("after_dedup"),
        count_if(col("is_first") && col("predicted_lang") === "en")
          .as("after_lang"),
        count_if(col("is_first") && col("predicted_lang") === "en" &&
          col("quality") >= 0.5).as("after_quality"))
      .orderBy("source")
  }

  /** Stage row counts for [[corpusSelect]] — the bench skew section's
    * stage-counted evidence (r13): rows INTO the per-row gate
    * computation, rows OUT of the norm_text election (= the semi-join
    * build side), and selected rows out. Counting, not arguing, where
    * a skew ratio's residual work lives: under the planted-template
    * corpus, rows_in grows by the full planted factor (every copy pays
    * the gate computation — linear, unavoidable work) while
    * election_out grows by ~1 (all copies collapse to one norm_text
    * group map-side). */
  def corpusSelectStageCounts(spark: SparkSession, dir: String)
      : Seq[(String, Long)] = {
    val docs = documents(spark, dir)
    Seq(
      "rows_in" -> docs.count(),
      "election_out" -> firstDocsByNormText(docs).count(),
      "selected_out" -> corpusSelect(spark, dir).count())
  }

  /** Collocation mining — the corpus-analysis pass tokenizer/vocab
    * construction runs: adjacent word pairs that co-occur far more
    * often than their unigram frequencies predict (candidate merges
    * for a BPE-ish vocabulary, or multi-word expressions to protect
    * from splitting). Association is PMI-SHAPED but log-free: `lift =
    * co·N / (c1·c2)` (the ratio PMI takes the log of) — the log is
    * monotone, so the RANKING is PMI's, while every op stays
    * correctly-rounded IEEE (the bm25_rank doctrine) and the emitted
    * doubles hash bit-identical. Bigrams are raw-adjacency (same
    * position convention as phrase_search), min co-occurrence 5, top
    * [[CollocTopK]] by (lift desc, w1, w2).
    *
    * Scale: bigram extraction is an in-row arrays_zip (no join, no
    * position shuffle); two keyed aggs (bigram, unigram) + one
    * broadcast of the unigram side restricted to surviving bigrams'
    * words... the unigram table is vocabulary-sized, joined on the
    * word keys of an already-min-count-filtered bigram set. The corpus
    * token count rides the plan as a broadcast one-row frame (the bm25
    * scalar shape, r12) — the eager `toks.count()` it replaces ran a
    * whole extra tokenize pass of the corpus at DataFrame-build time. */
  val CollocTopK = 50
  val CollocMinCo = 5

  def collocations(spark: SparkSession, dir: String): DataFrame = {
    val arr = documents(spark, dir)
      .select(split(lower(trim(col("text"))), "\\s+").as("a"))
    val toks = arr.select(explode(col("a")).as("word"))
      .filter(col("word") =!= "")
    val uni = toks.groupBy("word").agg(count(lit(1)).as("c"))
    val nTok = toks.select(count(lit(1)).as("n_tok"))
    val bi = arr
      .select(explode(expr(
        "arrays_zip(slice(a, 1, size(a) - 1), slice(a, 2, size(a) - 1))"))
        .as("p"))
      .select(col("p.0").as("w1"), col("p.1").as("w2"))
      .filter(col("w1") =!= "" && col("w2") =!= "")
      .groupBy("w1", "w2").agg(count(lit(1)).as("n_co"))
      .filter(col("n_co") >= CollocMinCo)
    collocationsFrom(uni, nTok, bi)
  }

  /** [[collocations]] off the STANDING postings table: unigram counts
    * and the corpus token total are `sum(tf)` rollups of the index
    * (LongType, same integers as the scratch counts), and bigram
    * adjacency is [[indexedBigrams]]' one-shuffle in-row
    * reconstruction, so the raw corpus text is never re-scanned.
    * Bit-identical inputs into the shared [[collocationsFrom]] tail →
    * the scratch oracle hash-verifies this path too. */
  def collocationsIndexed(spark: SparkSession, dir: String): DataFrame = {
    val p = Postings.postings(spark, dir)
    val uni = p.groupBy("word").agg(sum("tf").as("c"))
    val nTok = p.select(sum("tf").as("n_tok"))
    val bi = indexedBigrams(p)
      .groupBy("w1", "w2").agg(count(lit(1)).as("n_co"))
      .filter(col("n_co") >= CollocMinCo)
    collocationsFrom(uni, nTok, bi)
  }

  /** Shared association/rank tail of [[collocations]] and
    * [[collocationsIndexed]] — identical inputs give identical doubles
    * (one IEEE multiply-divide chain, no reassociation). */
  private def collocationsFrom(uni: DataFrame, nTok: DataFrame,
      bi: DataFrame): DataFrame = bi
    .join(uni.select(col("word").as("w1"), col("c").as("c1")), "w1")
    .join(uni.select(col("word").as("w2"), col("c").as("c2")), "w2")
    .crossJoin(broadcast(nTok))
    .withColumn("lift",
      col("n_co").cast("double") * col("n_tok") / (col("c1") * col("c2")))
    // top-k FIRST (plans as TakeOrderedAndProject — per-partition
    // heaps, no global sort of the full bigram set), then the dense
    // rank runs over just the k survivors
    .orderBy(desc("lift"), col("w1"), col("w2")).limit(CollocTopK)
    .withColumn("rk", row_number().over(
      Window.orderBy(desc("lift"), col("w1"), col("w2"))))
    .select(col("rk").cast("int").as("rk"), col("w1"), col("w2"),
      col("n_co"), col("lift"))
    .orderBy("rk")

  /** Per-doc pos-sorted (pos, word) token array rebuilt from the
    * standing postings rows IN-ROW (r17, VERDICT #5): one
    * groupBy(doc_id) over the compact (word, positions) rows — each
    * word STRING crosses the exchange once per (doc, word), tf× fewer
    * bytes than the exploded token stream the window form shuffled —
    * then flatten + array_sort per row. Replaces the explode →
    * WindowExec(lead) reconstruction: the token-grain exchange and the
    * window's per-partition sort machinery are gone; adjacency zips
    * in-row off the sorted array exactly like the scratch tokenizers
    * (guide §2.3 shuffle fewer bytes, §2.4 remove shuffles). pos gaps
    * (empty tokens dropped at ingest) survive as non-contiguous pos
    * values and every consumer still checks contiguity, so no pair is
    * fabricated across a gap — the window form's exact contract.
    * doc_id groups are token-bounded (~10² entries), never a
    * content-keyed mega-partition. */
  private def indexedTokenArrays(postings: DataFrame): DataFrame = {
    // pinned doc_id exchange, bytes-gated per core (the q21/spread
    // lesson): the reconstruction above this shuffle is CPU-dense
    // (collect + flatten + sort + zip per doc), and AQE's advisory
    // coalescing (parallelismFirst=false) folded the 30 MB sf1
    // exchange to ONE task — stage-counted 8–12 s serial where 32
    // cores sat idle. The pin feeds the groupBy below exchange-free;
    // KB-scale fixtures keep their coalesced plans.
    // 64 KB/core gate: the per-byte cost here is kernel-class (~300
    // ns/B measured: 9 s cpu over a 30 MB exchange), so even few-MB
    // postings win from the spread; sf0.1's ~0.8 MB table stays under
    // it (sf1's 7.9 MB estimate sat just under the 256 KB/core gate
    // the first cut used, leaving the 9 s stage serial)
    val sc = postings.sparkSession.sparkContext
    val in =
      if (postings.queryExecution.optimizedPlan.stats.sizeInBytes >=
          BigInt(64L * 1024) * sc.defaultParallelism)
        postings.repartition(sc.defaultParallelism, col("doc_id"))
      else postings
    in.groupBy("doc_id")
      .agg(collect_list(struct(col("positions"), col("word"))).as("es"))
      .select(col("doc_id"), array_sort(flatten(expr(
        """transform(es, e -> transform(e.positions,
          |  p -> named_struct('pos', p, 'word', e.word)))""".stripMargin)))
        .as("s"))
  }

  // Adjacency-engine history (r13 → r17): four forms measured at sf1.
  // Positional equi-join `(doc_id, pos) ⋈ (doc_id, pos−1) [⋈ pos−2]`
  // shuffles the exploded stream once per adjacency arm (colloc twin
  // 4.7 s / KN 8.4 s / novelty 13.6 s); collect_list over the EXPLODED
  // token stream shuffles once but pays token-grain agg buffers
  // (5.9 / 9.0 / 15.7 s); the r13 lead()-window form shuffles the
  // exploded stream once and sorts it in-partition (4.5 / 5.7 /
  // 10.3 s). The r17 form above collects the COMPACT postings rows —
  // vocab-grain buffers, each word string shuffled once per (doc,
  // word), no WindowExec sort — and zips adjacency in-row, closing the
  // structural gap to the scratch tokenizers' zero-shuffle arrays_zip.

  /** (w1, w2) adjacent-pair frame off the standing postings — the
    * indexed twin of the scratch arrays_zip bigram extraction
    * ([[indexedTokenArrays]] + in-row zip since r17; pos contiguity
    * checked per pair exactly as the lead() form did). */
  private def indexedBigrams(postings: DataFrame): DataFrame =
    indexedTokenArrays(postings)
      .filter(size(col("s")) >= 2)
      .select(explode(expr(
        """filter(transform(sequence(1, size(s) - 1),
          |  i -> IF(s[i - 1].pos + 1 = s[i].pos,
          |          named_struct('w1', s[i - 1].word, 'w2', s[i].word),
          |          null)),
          |  p -> p IS NOT NULL)""".stripMargin)).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))

  /** Kneser-Ney count census — the data side of n-gram LM training:
    * corpus word-trigram counts plus LEFT and RIGHT continuation-type
    * counts (how many distinct words extend each inner bigram), the
    * ingredients KN smoothing interpolates. A distinct (w1,w2,w3) row
    * contributes exactly one left-extension type to (w2,w3) and one
    * right-extension type to (w1,w2), so both continuation counts are
    * partial-agg `groupBy` censuses over the SAME distinct-trigram
    * frame, joined back — the uniform census shape ([[tfidfKeywords]],
    * bm25Scores): partition sizes here are type-bounded (vocabulary,
    * not tokens), but "of the"-class bigrams still make a fat window
    * partition, and the groupBy+join form is skew-proof for free with
    * identical integer results. Top-k cuts FIRST
    * (TakeOrderedAndProject heaps), the rank window runs over just the
    * k survivors (the [[collocations]] discipline). */
  val KnTopK = 50

  def ngramLmCounts(spark: SparkSession, dir: String): DataFrame = {
    val arr = graft.tables.Tables.spread(documents(spark, dir), col("doc_id"), 256 * 1024)
      .select(split(lower(trim(col("text"))), "\\s+").as("a"))
      .filter(size(col("a")) >= 3)
    val tri = arr.select(explode(expr(
        """arrays_zip(slice(a, 1, size(a) - 2), slice(a, 2, size(a) - 2),
          |           slice(a, 3, size(a) - 2))""".stripMargin)).as("t"))
      .select(col("t.0").as("w1"), col("t.1").as("w2"), col("t.2").as("w3"))
      .filter(col("w1") =!= "" && col("w2") =!= "" && col("w3") =!= "")
      .groupBy("w1", "w2", "w3").agg(count(lit(1)).as("c3"))
    ngramLmFrom(tri)
  }

  /** [[ngramLmCounts]] off the STANDING postings table: the trigram
    * frame comes from [[indexedTrigrams]]' in-row reconstruction —
    * short docs simply produce no frames, matching the scratch
    * `size(a) >= 3` gate — and the census tail is shared, so the
    * integers (and the scratch oracle) are unchanged. */
  def ngramLmCountsIndexed(spark: SparkSession, dir: String): DataFrame =
    ngramLmFrom(indexedTrigrams(Postings.postings(spark, dir))
      .groupBy("w1", "w2", "w3").agg(count(lit(1)).as("c3")))

  /** (doc_id, w1, w2, w3) adjacency frames off the standing postings —
    * the trigram analogue of [[indexedBigrams]], pos-contiguity
    * checked on both steps ([[indexedTokenArrays]] + in-row zip). */
  private def indexedTrigrams(postings: DataFrame): DataFrame =
    indexedTokenArrays(postings)
      .filter(size(col("s")) >= 3)
      .select(col("doc_id"), explode(expr(
        """filter(transform(sequence(1, size(s) - 2),
          |  i -> IF(s[i - 1].pos + 1 = s[i].pos AND s[i].pos + 1 = s[i + 1].pos,
          |          named_struct('w1', s[i - 1].word, 'w2', s[i].word,
          |                       'w3', s[i + 1].word),
          |          null)),
          |  t -> t IS NOT NULL)""".stripMargin)).as("t"))
      .select(col("doc_id"), col("t.w1").as("w1"), col("t.w2").as("w2"),
        col("t.w3").as("w3"))

  /** Shared Kneser-Ney census tail: continuation-type counts are
    * partial-agg groupBys over the distinct-trigram frame, joined back
    * (never a window over a token-grain key). */
  private def ngramLmFrom(tri: DataFrame): DataFrame = {
    val leftTypes = tri.groupBy("w2", "w3")
      .agg(count(lit(1)).as("left_types"))
    val rightTypes = tri.groupBy("w1", "w2")
      .agg(count(lit(1)).as("right_types"))
    tri
      .join(leftTypes, Seq("w2", "w3"))
      .join(rightTypes, Seq("w1", "w2"))
      .orderBy(desc("c3"), col("w1"), col("w2"), col("w3")).limit(KnTopK)
      .withColumn("rk", row_number().over(
        Window.orderBy(desc("c3"), col("w1"), col("w2"), col("w3"))))
      .select(col("rk").cast("int").as("rk"), col("w1"), col("w2"),
        col("w3"), col("c3"), col("left_types"), col("right_types"))
      .orderBy("rk")
  }

  /** Per-document n-gram NOVELTY — the freshness/memorization proxy a
    * curriculum or dedup-threshold decision reads (RefinedWeb-style:
    * how much of this doc's trigram mass appears nowhere earlier in the
    * corpus): for each doc, the fraction of its DISTINCT word trigrams
    * whose corpus-wide FIRST occurrence (min doc_id) is this doc.
    * Boilerplate-heavy docs score near 0, fresh prose near 1.
    *
    * Scale shape: one distinct-(doc, trigram) pass (trigrams ride as
    * packed xxhash64 images — 8 bytes each — with raw words never
    * shuffled; the oracle groups raw trigram STRINGS, identical counts
    * absent a 64-bit collision, the dedup_exact argument), then the
    * r11 skew-safe census: first-doc election is a partial-agg
    * `groupBy(gram).agg(min(doc_id))` + join back — a viral template's
    * trigrams make one hot gram per shingle, never one hot TASK.
    * Novelty ships as integer BASIS POINTS (n_novel·10⁴ div n_grams):
    * a rounded double ratio would sit on the half-up/half-even fault
    * line for exactly-representable fractions like 1/32 — integer
    * division is bit-identical everywhere. */
  def ngramNovelty(spark: SparkSession, dir: String): DataFrame = {
    // per-doc dedup IN the row (array_distinct over the hashed trigram
    // array — the hybridRrf words pattern): `.distinct()` on the
    // exploded frame paid a full (doc_id, gram) exchange over the
    // corpus's trigram volume for a set each row already determines
    // (guide §2.4); the distinct (doc, gram) relation is identical.
    val grams = graft.tables.Tables.spread(documents(spark, dir), col("doc_id"))
      .select(col("doc_id"), split(lower(trim(col("text"))), "\\s+").as("a"))
      .filter(size(col("a")) >= 3)
      .select(col("doc_id"), explode(array_distinct(expr(
        """transform(sequence(1, size(a) - 2),
          |  i -> xxhash64(concat_ws(' ', a[i - 1], a[i], a[i + 1])))"""
          .stripMargin))).as("g"))
    ngramNoveltyFrom(grams)
  }

  /** [[ngramNovelty]] off the STANDING postings table: the distinct
    * (doc, trigram-image) frame comes from [[indexedTrigrams]]' in-row
    * reconstruction with the SAME xxhash64-of-space-joined-words
    * image, so the first-doc census and the basis-point integers (and
    * the scratch oracle) are unchanged. */
  def ngramNoveltyIndexed(spark: SparkSession, dir: String): DataFrame =
    // hash + per-doc dedup IN the row (array_distinct over the hashed
    // adjacency images — the scratch twin's exact move): the (doc_id,
    // g) `.distinct()` this replaces paid a corpus-trigram-volume
    // exchange for a set each reconstructed row already determines;
    // the distinct (doc, gram) relation is identical.
    ngramNoveltyFrom(indexedTokenArrays(Postings.postings(spark, dir))
      .filter(size(col("s")) >= 3)
      .select(col("doc_id"), explode(array_distinct(expr(
        """filter(transform(sequence(1, size(s) - 2),
          |  i -> IF(s[i - 1].pos + 1 = s[i].pos AND s[i].pos + 1 = s[i + 1].pos,
          |          xxhash64(concat_ws(' ', s[i - 1].word, s[i].word,
          |                             s[i + 1].word)),
          |          CAST(NULL AS BIGINT))),
          |  g -> g IS NOT NULL)""".stripMargin))).as("g")))

  /** Shared novelty tail: skew-safe first-doc election (partial-agg
    * groupBy(min) + join back) and integer basis points. */
  private def ngramNoveltyFrom(grams: DataFrame): DataFrame = {
    val first = grams.groupBy("g").agg(min("doc_id").as("first_doc"))
    grams.join(first, Seq("g"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
      .withColumn("novelty_bp", expr("n_novel * 10000L div n_grams"))
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ngram_novelty"   -> ngramNovelty _,
    "ngram_novelty_indexed" -> ngramNoveltyIndexed _,
    "ngram_lm_counts" -> ngramLmCounts _,
    "ngram_lm_counts_indexed" -> ngramLmCountsIndexed _,
    "collocations"    -> collocations _,
    "collocations_indexed" -> collocationsIndexed _,
    "string_functions" -> stringFunctions _,
    "corpus_select"   -> corpusSelect _,
    "filter_funnel"   -> filterFunnel _,
    "tfidf_keywords"  -> tfidfKeywords _,
    "tfidf_indexed"   -> tfidfIndexed _,
    "explode_words"   -> explodeWords _,
    "regexp_stats"    -> regexpStats _,
    "text_stats"      -> textStats _,
    "token_count"     -> tokenCount _,
    "quality_score"   -> qualityScore _,
    "lang_id"         -> langId _,
    "doc_fingerprint" -> docFingerprint _,
    "trigram_topk"    -> trigramTopk _)

  private val stopList: String => String =
    l => Stopwords(l).map(w => s"'$w'").mkString("(", ", ", ")")

  private[graft] def hitsSql(l: String): String =
    s"len(list_filter(regexp_split_to_array(trim(text), '\\s+'), w -> w IN ${stopList(l)}))"

  // the standing-postings path is bit-identical to the from-scratch one
  // (same tf rows, same census integers) → same oracle SQL
  val oracles: Map[String, String] = baseOracles ++ Map(
    "tfidf_indexed" -> baseOracles("tfidf_keywords"),
    "collocations_indexed" -> baseOracles("collocations"),
    "ngram_lm_counts_indexed" -> baseOracles("ngram_lm_counts"),
    "ngram_novelty_indexed" -> baseOracles("ngram_novelty"))

  private lazy val baseOracles: Map[String, String] = Map(
    // raw trigram STRINGS where the query groups xxhash64 images —
    // identical counts absent a 64-bit collision between two distinct
    // trigrams of this corpus (the dedup_exact fingerprint argument);
    // novelty is integer basis points, no float anywhere
    "ngram_novelty" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS a
        |  FROM documents),
        |g AS (
        |  SELECT DISTINCT doc_id,
        |         unnest(list_transform(range(1, len(a) - 1),
        |           i -> a[CAST(i AS INTEGER)] || ' '
        |                || a[CAST(i AS INTEGER) + 1] || ' '
        |                || a[CAST(i AS INTEGER) + 2])) AS g
        |  FROM t WHERE len(a) >= 3),
        |f AS (SELECT g, MIN(doc_id) AS first_doc FROM g GROUP BY g)
        |SELECT g.doc_id,
        |       CAST(COUNT(*) AS BIGINT) AS n_grams,
        |       CAST(SUM(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_novel,
        |       CAST(SUM(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
        |            * 10000 // COUNT(*) AS BIGINT) AS novelty_bp
        |FROM g JOIN f USING (g)
        |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin,
    "tfidf_keywords" ->
      """WITH n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |w AS (
        |  SELECT doc_id, word FROM (
        |    SELECT doc_id,
        |           unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS word
        |    FROM documents)
        |  WHERE word <> ''),
        |tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM w GROUP BY doc_id, word),
        |d AS (SELECT *, COUNT(*) OVER (PARTITION BY word) AS df FROM tf),
        |r AS (SELECT d.doc_id, d.word, d.tf, d.df,
        |             ROW_NUMBER() OVER (PARTITION BY doc_id
        |               ORDER BY tf DESC, df ASC, word ASC) AS rk
        |      FROM d, n WHERE df * 2 <= n_docs)
        |SELECT doc_id, CAST(rk AS INTEGER) AS rk, word, tf, df
        |FROM r WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,
    "corpus_select" ->
      s"""WITH s AS (
         |  SELECT doc_id,
         |    lower(regexp_replace(text, '\\s+', ' ', 'g')) AS norm_text,
         |    CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE) AS n_words,
         |    CAST(length(text) AS DOUBLE) AS n_chars,
         |    CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS DOUBLE) AS punct,
         |    CAST(${hitsSql("en")} AS DOUBLE) AS stops,
         |    CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE)
         |      / len(regexp_split_to_array(trim(text), '\\s+')) AS avg_len,
         |    ${Langs.map(l => s"${hitsSql(l)} AS hits_$l").mkString(",\n         |    ")}
         |  FROM documents),
         |q AS (
         |  SELECT doc_id, norm_text,
         |    (LEAST(n_words, 100.0) / 100.0) * 0.25
         |    + LEAST(stops / n_words * 5.0, 1.0) * 0.35
         |    + (1.0 - LEAST(punct / n_chars * 10.0, 1.0)) * 0.2
         |    + (CASE WHEN avg_len BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END) * 0.2
         |      AS quality,
         |    CASE
         |      WHEN hits_en > 0 AND hits_en >= hits_fr AND hits_en >= hits_es AND hits_en >= hits_de AND hits_en >= hits_zh THEN 'en'
         |      WHEN hits_fr > 0 AND hits_fr >= hits_en AND hits_fr >= hits_es AND hits_fr >= hits_de AND hits_fr >= hits_zh THEN 'fr'
         |      WHEN hits_es > 0 AND hits_es >= hits_en AND hits_es >= hits_fr AND hits_es >= hits_de AND hits_es >= hits_zh THEN 'es'
         |      WHEN hits_de > 0 AND hits_de >= hits_en AND hits_de >= hits_fr AND hits_de >= hits_es AND hits_de >= hits_zh THEN 'de'
         |      WHEN hits_zh > 0 AND hits_zh >= hits_en AND hits_zh >= hits_fr AND hits_zh >= hits_es AND hits_zh >= hits_de THEN 'zh'
         |      ELSE 'und' END AS predicted_lang,
         |    ROW_NUMBER() OVER (PARTITION BY norm_text ORDER BY doc_id) AS rn
         |  FROM s)
         |SELECT doc_id, quality FROM q
         |WHERE rn = 1 AND quality >= 0.5 AND predicted_lang = 'en'
         |ORDER BY doc_id""".stripMargin,
    "collocations" ->
      s"""WITH arr AS (
         |  SELECT regexp_split_to_array(lower(trim(text)), '\\s+') AS a
         |  FROM documents),
         |toks AS (SELECT unnest(a) AS word FROM arr),
         |uni AS (SELECT word, COUNT(*) AS c FROM toks
         |        WHERE word <> '' GROUP BY 1),
         |nt AS (SELECT COUNT(*) AS n FROM toks WHERE word <> ''),
         |b AS (SELECT unnest(list_transform(range(1, greatest(len(a), 1)),
         |        i -> struct_pack(w1 := a[CAST(i AS INTEGER)],
         |                         w2 := a[CAST(i AS INTEGER) + 1]))) AS s
         |      FROM arr),
         |bi AS (SELECT s.w1 AS w1, s.w2 AS w2, COUNT(*) AS n_co FROM b
         |       WHERE s.w1 <> '' AND s.w2 <> '' GROUP BY 1, 2
         |       HAVING COUNT(*) >= $CollocMinCo),
         |j AS (SELECT bi.w1, bi.w2, bi.n_co,
         |        (CAST(bi.n_co AS DOUBLE) * (SELECT n FROM nt))
         |          / (u1.c * u2.c) AS lift
         |      FROM bi JOIN uni u1 ON u1.word = bi.w1
         |      JOIN uni u2 ON u2.word = bi.w2),
         |r AS (SELECT *, CAST(ROW_NUMBER() OVER
         |        (ORDER BY lift DESC, w1, w2) AS INTEGER) AS rk FROM j)
         |SELECT rk, w1, w2, n_co, lift FROM r WHERE rk <= $CollocTopK
         |ORDER BY rk""".stripMargin,
    // same s/q CTEs as corpus_select with source carried through; the
    // funnel is the cumulative FILTER counts over the identical gates
    "filter_funnel" ->
      s"""WITH s AS (
         |  SELECT doc_id, source,
         |    lower(regexp_replace(text, '\\s+', ' ', 'g')) AS norm_text,
         |    CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE) AS n_words,
         |    CAST(length(text) AS DOUBLE) AS n_chars,
         |    CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS DOUBLE) AS punct,
         |    CAST(${hitsSql("en")} AS DOUBLE) AS stops,
         |    CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE)
         |      / len(regexp_split_to_array(trim(text), '\\s+')) AS avg_len,
         |    ${Langs.map(l => s"${hitsSql(l)} AS hits_$l").mkString(",\n         |    ")}
         |  FROM documents),
         |q AS (
         |  SELECT doc_id, source,
         |    (LEAST(n_words, 100.0) / 100.0) * 0.25
         |    + LEAST(stops / n_words * 5.0, 1.0) * 0.35
         |    + (1.0 - LEAST(punct / n_chars * 10.0, 1.0)) * 0.2
         |    + (CASE WHEN avg_len BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END) * 0.2
         |      AS quality,
         |    CASE
         |      WHEN hits_en > 0 AND hits_en >= hits_fr AND hits_en >= hits_es AND hits_en >= hits_de AND hits_en >= hits_zh THEN 'en'
         |      WHEN hits_fr > 0 AND hits_fr >= hits_en AND hits_fr >= hits_es AND hits_fr >= hits_de AND hits_fr >= hits_zh THEN 'fr'
         |      WHEN hits_es > 0 AND hits_es >= hits_en AND hits_es >= hits_fr AND hits_es >= hits_de AND hits_es >= hits_zh THEN 'es'
         |      WHEN hits_de > 0 AND hits_de >= hits_en AND hits_de >= hits_fr AND hits_de >= hits_es AND hits_de >= hits_zh THEN 'de'
         |      WHEN hits_zh > 0 AND hits_zh >= hits_en AND hits_zh >= hits_fr AND hits_zh >= hits_es AND hits_zh >= hits_de THEN 'zh'
         |      ELSE 'und' END AS predicted_lang,
         |    ROW_NUMBER() OVER (PARTITION BY norm_text ORDER BY doc_id) AS rn
         |  FROM s)
         |SELECT source, COUNT(*) AS n_docs,
         |  COUNT(*) FILTER (WHERE rn = 1) AS after_dedup,
         |  COUNT(*) FILTER (WHERE rn = 1 AND predicted_lang = 'en')
         |    AS after_lang,
         |  COUNT(*) FILTER (WHERE rn = 1 AND predicted_lang = 'en'
         |    AND quality >= 0.5) AS after_quality
         |FROM q GROUP BY source ORDER BY source""".stripMargin,
    "explode_words" ->
      """WITH w AS (SELECT unnest(string_split(lower(text), ' ')) AS word
        |           FROM documents),
        |c AS (SELECT word, COUNT(*) AS cnt FROM w
        |      WHERE regexp_full_match(word, '[a-z]{4,}') GROUP BY 1),
        |r AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, word) AS INTEGER) AS rk,
        |             word, cnt FROM c)
        |SELECT rk, word, cnt FROM r WHERE rk <= 20 ORDER BY rk""".stripMargin,
    "regexp_stats" ->
      """SELECT source, COUNT(*) AS n_docs,
        |       COUNT(*) FILTER (WHERE regexp_matches(text, '[0-9]')) AS n_docs_digit,
        |       CAST(SUM(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))) AS BIGINT) AS digit_chars,
        |       COUNT(*) FILTER (WHERE regexp_matches(text, '\bdata\b')) AS n_docs_data
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "string_functions" ->
      """SELECT doc_id,
        |       upper(substring(text, 1, 12)) AS head_upper,
        |       CAST(length(trim(text)) AS INTEGER) AS trimmed_len,
        |       replace(substring(text, 1, 20), ' ', '_') AS snake,
        |       lpad(CAST(doc_id AS VARCHAR), 6, '0') AS padded_id,
        |       reverse(substring(text, 1, 10)) AS rev_head,
        |       CAST(strpos(text, 'spark') AS BIGINT) AS spark_pos
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_stats" ->
      s"""SELECT doc_id, CAST(length(text) AS INTEGER) AS n_chars,
         |       CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS INTEGER) AS n_words,
         |       CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE)
         |         / len(regexp_split_to_array(trim(text), '\\s+')) AS avg_word_len,
         |       CAST(${hitsSql("en")} AS DOUBLE)
         |         / len(regexp_split_to_array(trim(text), '\\s+')) AS stopword_ratio
         |FROM documents ORDER BY doc_id""".stripMargin,
    "token_count" ->
      """SELECT doc_id,
        |       CAST(len(regexp_extract_all(text, '[a-z]+|[A-Z][a-z]*|[0-9]+|[^a-zA-Z0-9\s]')) AS INTEGER) AS n_tokens,
        |       CAST(length(text) AS DOUBLE)
        |         / len(regexp_extract_all(text, '[a-z]+|[A-Z][a-z]*|[0-9]+|[^a-zA-Z0-9\s]')) AS chars_per_token
        |FROM documents ORDER BY doc_id""".stripMargin,
    "quality_score" ->
      s"""WITH s AS (
         |  SELECT doc_id,
         |    CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE) AS n_words,
         |    CAST(length(text) AS DOUBLE) AS n_chars,
         |    CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS DOUBLE) AS punct,
         |    CAST(${hitsSql("en")} AS DOUBLE) AS stops,
         |    CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE)
         |      / len(regexp_split_to_array(trim(text), '\\s+')) AS avg_len
         |  FROM documents)
         |SELECT doc_id,
         |       (LEAST(n_words, 100.0) / 100.0) * 0.25
         |       + LEAST(stops / n_words * 5.0, 1.0) * 0.35
         |       + (1.0 - LEAST(punct / n_chars * 10.0, 1.0)) * 0.2
         |       + (CASE WHEN avg_len BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END) * 0.2
         |         AS quality,
         |       CAST(n_words AS BIGINT) AS n_words
         |FROM s ORDER BY doc_id""".stripMargin,
    "lang_id" ->
      s"""WITH h AS (
         |  SELECT doc_id, lang AS labeled_lang,
         |         ${Seq("en", "fr", "es", "de", "zh").map(l => s"${hitsSql(l)} AS hits_$l").mkString(",\n         |         ")}
         |  FROM documents)
         |SELECT doc_id, labeled_lang,
         |  CASE
         |    WHEN hits_en > 0 AND hits_en >= hits_fr AND hits_en >= hits_es AND hits_en >= hits_de AND hits_en >= hits_zh THEN 'en'
         |    WHEN hits_fr > 0 AND hits_fr >= hits_en AND hits_fr >= hits_es AND hits_fr >= hits_de AND hits_fr >= hits_zh THEN 'fr'
         |    WHEN hits_es > 0 AND hits_es >= hits_en AND hits_es >= hits_fr AND hits_es >= hits_de AND hits_es >= hits_zh THEN 'es'
         |    WHEN hits_de > 0 AND hits_de >= hits_en AND hits_de >= hits_fr AND hits_de >= hits_es AND hits_de >= hits_zh THEN 'de'
         |    WHEN hits_zh > 0 AND hits_zh >= hits_en AND hits_zh >= hits_fr AND hits_zh >= hits_es AND hits_zh >= hits_de THEN 'zh'
         |    ELSE 'und' END AS predicted_lang
         |FROM h ORDER BY doc_id""".stripMargin,
    // doc_fingerprint: the winnowing kernel is pure polynomial
    // arithmetic over ASCII code units mod 2^61-1, so DuckDB replays it
    // exactly with HUGEINT folds (list_reduce's first element doubles
    // as the 0*B+c1 seed); positions 1..n-k+1, whole string when n<=k
    "doc_fingerprint" ->
      """WITH d AS (SELECT doc_id, text AS t1,
        |                  lower(regexp_replace(text, '\s+', ' ', 'g')) AS t2
        |           FROM documents)
        |SELECT doc_id,
        |  CASE WHEN length(t1) = 0 THEN 0 ELSE CAST(list_min(list_transform(
        |    range(1, greatest(length(t1) - 6, 2)),
        |    i -> list_reduce(
        |      list_transform(string_split(substring(t1, CAST(i AS INTEGER), 8), ''),
        |                     c -> CAST(ord(c) AS HUGEINT)),
        |      (a, b) -> (a * 1000003 + b) % 2305843009213693951))) AS BIGINT)
        |  END AS fingerprint,
        |  CASE WHEN length(t2) = 0 THEN 0 ELSE CAST(list_min(list_transform(
        |    range(1, greatest(length(t2) - 6, 2)),
        |    i -> list_reduce(
        |      list_transform(string_split(substring(t2, CAST(i AS INTEGER), 8), ''),
        |                     c -> CAST(ord(c) AS HUGEINT)),
        |      (a, b) -> (a * 1000003 + b) % 2305843009213693951))) AS BIGINT)
        |  END AS normalized_fingerprint
        |FROM d ORDER BY doc_id""".stripMargin,
    "ngram_lm_counts" ->
      s"""WITH t AS (
         |  SELECT regexp_split_to_array(lower(trim(text)), '\\s+') AS a
         |  FROM documents),
         |g AS (
         |  SELECT a[CAST(i AS INTEGER)] AS w1,
         |         a[CAST(i AS INTEGER) + 1] AS w2,
         |         a[CAST(i AS INTEGER) + 2] AS w3
         |  FROM (SELECT a,
         |          unnest(range(1, GREATEST(len(a) - 2, 0) + 1)) AS i
         |        FROM t WHERE len(a) >= 3)),
         |tri AS (
         |  SELECT w1, w2, w3, COUNT(*) AS c3 FROM g
         |  WHERE w1 <> '' AND w2 <> '' AND w3 <> '' GROUP BY 1, 2, 3),
         |w AS (
         |  SELECT *, COUNT(*) OVER (PARTITION BY w2, w3) AS left_types,
         |         COUNT(*) OVER (PARTITION BY w1, w2) AS right_types
         |  FROM tri)
         |SELECT CAST(ROW_NUMBER() OVER (ORDER BY c3 DESC, w1, w2, w3)
         |            AS INTEGER) AS rk,
         |       w1, w2, w3, c3, left_types, right_types
         |FROM w ORDER BY c3 DESC, w1, w2, w3 LIMIT $KnTopK""".stripMargin,
    "trigram_topk" ->
      """WITH g AS (
        |  SELECT lang, unnest(list_transform(range(1, GREATEST(length(text) - 2, 0) + 1),
        |                i -> substr(text, CAST(i AS INTEGER), 3))) AS trigram
        |  FROM documents),
        |c AS (
        |  SELECT lang, trigram, COUNT(*) AS cnt FROM g WHERE length(trigram) = 3 GROUP BY 1, 2),
        |r AS (
        |  SELECT lang, CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY cnt DESC, trigram) AS INTEGER) AS rk,
        |         trigram, cnt
        |  FROM c)
        |SELECT lang, rk, trigram, cnt FROM r WHERE rk <= 5 ORDER BY lang, rk""".stripMargin)
}
