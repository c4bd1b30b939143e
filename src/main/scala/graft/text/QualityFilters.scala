package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.tables.Tables._

/** Corpus-curation filters of the kind large-scale LLM training
  * pipelines run after raw dedup (Gopher §A.1 / C4-style rules,
  * re-expressed as declarative Spark over the `documents` table):
  *
  *  - [[gopherQuality]]: per-doc repetition + shape statistics
  *    (top-word fraction, distinct-word ratio, mean word length) with
  *    keep/drop decided by INTEGER arithmetic only — no float
  *    threshold can drift between engines;
  *  - [[blockDedup]]: inter-document repeated-span detection at
  *    20-word block granularity (the equi-join-able approximation of
  *    exact substring dedup): every doc reports how much of it appears
  *    verbatim elsewhere in the corpus;
  *  - [[sourceMixture]]: deterministic temperature sampling (α = 1/2
  *    via sqrt, the only cross-engine-exact power) over the `source`
  *    column — per-source quotas ∝ √n normalized, members chosen by
  *    md5 rank so the sample is reproducible run-to-run and
  *    engine-to-engine.
  *
  * Scale notes: everything is hash-groupBy / window over exploded
  * words or blocks — shuffle keys are words, 32-byte md5 strings, or
  * the small per-source stat table; no all-pairs anywhere. All three
  * carry full DuckDB oracles.
  */
object QualityFilters {

  // ---- Gopher-style repetition/shape filter ----------------------------

  /** keep rules (integer arithmetic only):
    *  R1 top_word * 5 <= n_words        (most frequent word < 20%)
    *  R2 n_distinct * 3 >= n_words      (distinct ratio >= 1/3)
    *  R3 3 * n_words <= sum_word_len    (mean word length >= 3)
    *  R4 sum_word_len <= 10 * n_words   (mean word length <= 10)
    */
  def gopherQuality(spark: SparkSession, dir: String): DataFrame = {
    val words = documents(spark, dir)
      .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("word"))
      .filter(col("word") =!= "")
    val perWord = words.groupBy("doc_id", "word")
      .agg(count(lit(1)).as("n"), (length(col("word")) * count(lit(1))).as("chars"))
    perWord.groupBy("doc_id")
      .agg(sum("n").as("n_words"), count(lit(1)).as("n_distinct"),
        max("n").as("top_word_n"), sum("chars").as("sum_word_len"))
      .withColumn("keep",
        col("top_word_n") * 5 <= col("n_words") &&
        col("n_distinct") * 3 >= col("n_words") &&
        col("n_words") * 3 <= col("sum_word_len") &&
        col("sum_word_len") <= col("n_words") * 10)
      .select("doc_id", "n_words", "n_distinct", "top_word_n", "sum_word_len", "keep")
      .orderBy("doc_id")
  }

  // ---- inter-document repeated blocks ----------------------------------

  val BlockWords = 20

  /** Non-overlapping [[BlockWords]]-word blocks per doc (trailing
    * partial block dropped), hashed with md5; a block is `shared` when
    * the same hash occurs in more than one distinct document. Per-doc
    * output: block counts and the shared fraction — the signal an
    * exact-substring dedup pass would act on (Lee et al.'s dedup at
    * block granularity, equi-join instead of suffix arrays). */
  def blockDedup(spark: SparkSession, dir: String): DataFrame = {
    val blocks = documents(spark, dir)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("w"))
      .select(col("doc_id"), explode(expr(
        // guard: sequence(1, 0) DESCENDS in Spark, so short docs must
        // yield an empty array, not bogus indices
        s"""CASE WHEN size(w) >= $BlockWords THEN
           |  transform(sequence(1, size(w) div $BlockWords),
           |    i -> concat_ws(' ', slice(w, (i - 1) * $BlockWords + 1, $BlockWords)))
           |ELSE array() END""".stripMargin)).as("block"))
      .select(col("doc_id"), md5(col("block")).as("h"))
    val shared = blocks.groupBy("h")
      .agg(countDistinct("doc_id").as("n_docs"))
      .filter(col("n_docs") > 1)
      .select("h")
    blocks.join(shared, Seq("h"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared_blocks"))
      .join(blocks.groupBy("doc_id").agg(count(lit(1)).as("n_blocks")),
        Seq("doc_id"), "right")
      .select(col("doc_id"), col("n_blocks"),
        coalesce(col("n_shared_blocks"), lit(0L)).as("n_shared_blocks"))
      .withColumn("shared_frac",
        round(col("n_shared_blocks").cast("double") / col("n_blocks"), 4))
      .orderBy("doc_id")
  }

  // ---- within-document repetition removal ------------------------------

  val IntraBlockWords = 10

  /** Within-document repeated-block removal (the RefinedWeb/CCNet-style
    * boilerplate pass that runs BEFORE inter-doc dedup): non-overlapping
    * [[IntraBlockWords]]-word blocks, keep each block's FIRST occurrence
    * in document order, drop repeats. Per doc: block counts plus the md5
    * of the cleaned text, so the oracle pins the reconstruction exactly
    * (not just the counts). One explode + two hash aggregates per doc —
    * no join against the rest of the corpus, trivially 100 TB-safe. */
  def intraDedup(spark: SparkSession, dir: String): DataFrame = {
    val blocks = documents(spark, dir)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("w"))
      .select(col("doc_id"), posexplode(expr(
        s"""CASE WHEN size(w) >= $IntraBlockWords THEN
           |  transform(sequence(1, size(w) div $IntraBlockWords),
           |    i -> concat_ws(' ', slice(w, (i - 1) * $IntraBlockWords + 1, $IntraBlockWords)))
           |ELSE array() END""".stripMargin)).as(Seq("i", "block")))
    val kept = blocks.groupBy(col("doc_id"), col("block"))
      .agg(min("i").as("i"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        md5(array_join(expr(
          "transform(sort_array(collect_list(struct(i, block))), x -> x.block)"),
          " ")).as("clean_md5"))
    blocks.groupBy("doc_id").agg(count(lit(1)).as("n_blocks"))
      .join(kept, "doc_id")
      .select(col("doc_id"), col("n_blocks"), col("n_kept"),
        (col("n_blocks") - col("n_kept")).as("n_dup_blocks"), col("clean_md5"))
      .orderBy("doc_id")
  }

  // ---- deterministic temperature sampling over sources -----------------

  /** Target sample size as a fraction of the corpus. */
  val MixtureFraction = 0.5

  /** Per-source quota k_s = round(target · √n_s / Σ√n) (Σ computed in
    * source order on both engines so the double sum is bit-identical),
    * members = the k_s docs with the smallest md5(doc_id) per source —
    * a reproducible rank-based sample, no RNG. */
  def sourceMixture(spark: SparkSession, dir: String): DataFrame = {
    val docs = documents(spark, dir).select(col("doc_id"), col("source"))
    val counts = docs.groupBy("source").agg(count(lit(1)).as("n"))
      .withColumn("sqrtn", sqrt(col("n")))
    // ordered full-frame window sum: summation order is pinned to the
    // source sort on BOTH engines → bit-identical denominator
    val ordered = Window.orderBy("source")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val target = Window.orderBy("source")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val quotas = counts
      .withColumn("denom", sum("sqrtn").over(ordered))
      .withColumn("total", sum("n").over(target))
      .withColumn("quota", least(col("n"), floor(
        col("total") * lit(MixtureFraction) * col("sqrtn") / col("denom") + lit(0.5))
        .cast("long")))
      .select("source", "n", "quota")
    val ranked = docs
      .withColumn("rk", row_number().over(
        Window.partitionBy("source").orderBy(md5(col("doc_id").cast("string")), col("doc_id"))))
    ranked.join(quotas, "source")
      .filter(col("rk") <= col("quota"))
      .select(col("doc_id"), col("source"), col("rk").cast("int").as("rk"),
        col("n").as("source_docs"), col("quota"))
      .orderBy("source", "rk")
  }

  // ---- corpus-LM typicality (CCNet-style perplexity proxy) -------------

  /** A trigram with corpus count at/below this is "rare". */
  val RareThreshold = 2

  /** Two-pass corpus-LM scoring — the shape of CCNet's LM-perplexity
    * quality filter with the corpus itself as the model: pass 1 builds
    * a character-trigram census (the "LM"), pass 2 scores every doc
    * against it. Reported per doc: the average corpus frequency of its
    * trigrams (high = typical text, the low-perplexity analogue) and
    * the fraction of rare trigrams (high = noise/garble, what CCNet's
    * tail bucket catches).
    *
    * All INTEGER arithmetic until one exact long/long → double division
    * per output column — a log-space score would hinge on the engines'
    * last-ulp ln() agreement, which is not a contract either makes.
    *
    * Scale shape: the census key domain is the trigram vocabulary
    * (bounded by charset³, not by corpus size), so pass 1's shuffle
    * moves map-side-combined partials of a tiny table and the model
    * BROADCASTS — pass 2 is then a broadcast join + one map-side-
    * combined groupBy(doc_id). No full shuffle of the exploded trigram
    * stream anywhere (contrast [[graft.dedup.Dedup.dedupSubstring]],
    * whose window-fingerprint domain grows with the corpus and forces
    * the shuffle). */
  def lmTypicality(spark: SparkSession, dir: String): DataFrame = {
    // trigrams as packed ints ([[TrigramPack]], the trigram_topk
    // kernel): no per-position string allocation, and the census/join
    // key is 4 bytes. Bijective with the string trigrams the oracle
    // groups for ASCII text (this corpus); non-ASCII folds modulo 256 —
    // deterministic, same documented contract as trigram_topk.
    val tg = documents(spark, dir)
      .select(col("doc_id"),
        explode(TrigramPack.trigrams_packed(col("text"))).as("tg"))
    val census = tg.groupBy("tg").agg(count(lit(1)).as("cnt"))
    tg.join(broadcast(census), "tg")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_trigrams"),
        sum("cnt").as("sum_freq"),
        sum(when(col("cnt") <= RareThreshold, 1L).otherwise(0L)).as("n_rare"))
      .select(col("doc_id"), col("n_trigrams"),
        (col("sum_freq").cast("double") / col("n_trigrams")).as("avg_tg_freq"),
        (col("n_rare").cast("double") / col("n_trigrams")).as("rare_frac"))
      .orderBy("doc_id")
  }

  /** CCNet-style head/middle/tail split: per SOURCE, documents are
    * ranked by their corpus-LM typicality ([[lmTypicality]]'s
    * avg-trigram-frequency score — CCNet ranks by LM perplexity; same
    * mechanics, deterministic stand-in score) and cut into thirds with
    * NTILE(3) — bucket 1 = most typical ("head"), 3 = "tail". CCNet
    * trains on head/middle and drops (or down-weights) tail; the
    * bucket boundary is exactly what a mixture builder consumes.
    *
    * Determinism: the per-doc score is ONE division of two exact longs
    * (bit-identical across engines), the NTILE ordering is
    * (score DESC, doc_id), and the per-bucket aggregate frequency is
    * again one exact-long division — no double is ever summed.
    *
    * Scale shape: [[lmTypicality]]'s (bounded census → broadcast →
    * one map-side-combined groupBy(doc_id)) plus one window over
    * (source, score) — the same shuffle family as `sessionize`,
    * spill-safe, no per-source buffer. */
  def typicalityBuckets(spark: SparkSession, dir: String): DataFrame = {
    val tg = documents(spark, dir)
      .select(col("doc_id"), col("source"),
        explode(TrigramPack.trigrams_packed(col("text"))).as("tg"))
    val census = tg.groupBy("tg").agg(count(lit(1)).as("cnt"))
    val perDoc = tg.join(broadcast(census), "tg")
      .groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n_tg"), sum("cnt").as("sum_freq"))
      .withColumn("score",
        col("sum_freq").cast("double") / col("n_tg").cast("double"))
    perDoc
      .withColumn("bucket", ntile(3).over(
        Window.partitionBy("source").orderBy(desc("score"), col("doc_id"))))
      .groupBy("source", "bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tg").as("n_trigrams"),
        sum("sum_freq").as("sum_freq"),
        max("score").as("max_score"),
        min("score").as("min_score"))
      .withColumn("avg_tg_freq",
        col("sum_freq").cast("double") / col("n_trigrams").cast("double"))
      .select(col("source"), col("bucket").cast("int").as("bucket"),
        col("n_docs"), col("n_trigrams"), col("sum_freq"),
        col("avg_tg_freq"), col("max_score"), col("min_score"))
      .orderBy("source", "bucket")
  }

  // ---- DSIR-style domain-contrast scoring -----------------------------

  /** The target "domain" whose distribution docs are scored against —
    * a source value of the corpus itself (DSIR's target would be an
    * external high-quality set; the engine mechanics are identical). */
  val ContrastTarget = "src0"

  /** Data Selection via Importance Resampling (Xie et al. 2023) shape:
    * score every document by how its n-gram distribution contrasts a
    * TARGET domain against the whole corpus — the selection signal for
    * domain-weighted training mixtures. Per doc:
    * `target_hits` = Σ target-census count of its trigrams (0 when the
    * target never saw one), `corpus_hits` = Σ corpus-census count, and
    * `contrast` = target_hits / corpus_hits — a monotone proxy for the
    * DSIR importance weight (the global T_tot/C_tot normalizer is
    * constant across docs, so the RANKING is identical to the
    * normalized ratio while staying one exact long/long division; a
    * log-space weight would hinge on cross-engine ln() ulp agreement).
    *
    * Scale shape: identical to [[lmTypicality]] — both censuses live
    * on the BOUNDED trigram domain (charset³, not corpus size) so they
    * broadcast, and the probe is one scan with two broadcast joins and
    * a map-side-combined groupBy(doc_id). The target census is a
    * filtered partial of the same exploded stream. */
  def dsirContrast(spark: SparkSession, dir: String): DataFrame = {
    val tg = documents(spark, dir)
      .select(col("doc_id"), col("source"),
        explode(TrigramPack.trigrams_packed(col("text"))).as("tg"))
    val corpus = tg.groupBy("tg").agg(count(lit(1)).as("ccnt"))
    val target = tg.filter(col("source") === ContrastTarget)
      .groupBy("tg").agg(count(lit(1)).as("tcnt"))
    tg.join(broadcast(corpus), "tg")
      .join(broadcast(target), Seq("tg"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_trigrams"),
        sum(coalesce(col("tcnt"), lit(0L))).as("target_hits"),
        sum("ccnt").as("corpus_hits"))
      .withColumn("contrast",
        round(col("target_hits").cast("double") / col("corpus_hits"), 6))
      .select("doc_id", "n_trigrams", "target_hits", "corpus_hits", "contrast")
      .orderBy("doc_id")
  }

  // ---- cross-source duplicate overlap ---------------------------------

  /** Between-source duplication matrix — the leakage diagnostic a
    * multi-source corpus needs before mixing (which feeds copy from
    * which): for every unordered source pair, how many distinct
    * verbatim [[BlockWords]]-word spans appear in BOTH (block
    * granularity, like [[blockDedup]] — whole-document exact overlap is
    * rare; span borrowing is the common contamination). One shuffle on
    * the block hash; the within-hash self-join is bounded by the SOURCE
    * count per block (≤ tens after distinct), never by corpus size. */
  def sourceOverlap(spark: SparkSession, dir: String): DataFrame = {
    val hs = documents(spark, dir)
      .select(col("source"), split(trim(col("text")), "\\s+").as("w"))
      .select(col("source"), explode(expr(
        s"""CASE WHEN size(w) >= $BlockWords THEN
           |  transform(sequence(1, size(w) div $BlockWords),
           |    i -> concat_ws(' ', slice(w, (i - 1) * $BlockWords + 1, $BlockWords)))
           |ELSE array() END""".stripMargin)).as("block"))
      .select(col("source"), md5(col("block")).as("h"))
      .distinct()
      .repartition(col("h"))
    hs.as("x").join(hs.as("y"),
        col("x.h") === col("y.h") && col("x.source") < col("y.source"))
      .groupBy(col("x.source").as("source_a"), col("y.source").as("source_b"))
      .agg(count(lit(1)).as("shared_blocks"))
      .orderBy("source_a", "source_b")
  }

  /** Per-source duplication telemetry — the dedup OBSERVABILITY report a
    * curation run reads before deciding how hard to dedup each source:
    * whole-document exact-duplicate rate (corpus-wide groups on the md5
    * of whitespace-normalized text; a doc is redundant when an
    * earlier-id doc carries identical content — the dedup_exact keep
    * rule) and verbatim-block duplication rate ([[BlockWords]]-word
    * spans shared with ANY other document, the [[blockDedup]]
    * granularity rolled up per source). Two hash censuses (doc, block),
    * integer counts, one IEEE division per rate. */
  def dupRateReport(spark: SparkSession, dir: String): DataFrame = {
    // first-doc election via partial-agg groupBy + join back, not a
    // window over the content hash: a 10⁴×-duplicated doc makes one
    // hash the whole corpus's hot key (r11 mega-block rule; the join
    // back is AQE-skew-splittable, the census is one row per task per
    // key map-side)
    val hashed = documents(spark, dir)
      .select(col("doc_id"), col("source"),
        md5(lower(regexp_replace(col("text"), "\\s+", " "))).as("h"))
    val firstDoc = hashed.groupBy("h").agg(min("doc_id").as("first_doc"))
    val docStats = hashed.join(firstDoc, Seq("h"))
      .withColumn("is_dup", (col("doc_id") =!= col("first_doc")).cast("long"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("is_dup").as("n_dup_docs"))
    val blocks = documents(spark, dir)
      .select(col("doc_id"), col("source"),
        split(trim(col("text")), "\\s+").as("w"))
      .select(col("doc_id"), col("source"), explode(expr(
        s"""CASE WHEN size(w) >= $BlockWords THEN
           |  transform(sequence(1, size(w) div $BlockWords),
           |    i -> concat_ws(' ', slice(w, (i - 1) * $BlockWords + 1, $BlockWords)))
           |ELSE array() END""".stripMargin)).as("block"))
      .select(col("doc_id"), col("source"), md5(col("block")).as("bh"))
    val sharedB = blocks.groupBy("bh")
      .agg(countDistinct("doc_id").as("nd")).filter(col("nd") > 1).select("bh")
    val blockStats = blocks.join(sharedB, Seq("bh"), "left_semi")
      .groupBy("source").agg(count(lit(1)).as("n_shared_blocks"))
    val totalBlocks = blocks.groupBy("source")
      .agg(count(lit(1)).as("n_blocks"))
    docStats
      .join(totalBlocks, Seq("source"), "left_outer")
      .join(blockStats, Seq("source"), "left_outer")
      .select(col("source"), col("n_docs"), col("n_dup_docs"),
        (col("n_dup_docs").cast("double") / col("n_docs")).as("doc_dup_rate"),
        coalesce(col("n_blocks"), lit(0L)).as("n_blocks"),
        coalesce(col("n_shared_blocks"), lit(0L)).as("n_shared_blocks"),
        (coalesce(col("n_shared_blocks"), lit(0L)).cast("double") /
          greatest(coalesce(col("n_blocks"), lit(0L)), lit(1L)).cast("double"))
          .as("block_dup_rate"))
      .orderBy("source")
  }

  /** Vocabulary Jaccard between every source pair — the coarse "are
    * these two crawls the same corpus?" signal that decides whether two
    * sources even need pairwise dedup. Works on DISTINCT (source, word):
    * the join fans out per word by the number of sources carrying it
    * (≤ source count, never corpus size), and set sizes ride in on a
    * broadcast — the same bounded-self-join argument as
    * [[sourceOverlap]], one vocabulary shuffle total. */
  def sourceSimilarity(spark: SparkSession, dir: String): DataFrame =
    sourceSimilarityFrom(documents(spark, dir)
      .select(col("source"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("word"))
      .filter(col("word") =!= ""))

  /** [[sourceSimilarity]] off the STANDING postings table
    * ([[graft.text.Postings]]): postings rows are already distinct
    * (doc_id, word) pairs with the identical tokenization, so joining
    * the doc→source map (a doc_id-keyed, uniform join) and projecting
    * (source, word) reproduces the scratch path's vocabulary rows
    * bit-for-bit — same oracle, and the corpus text is never
    * re-tokenized. */
  def sourceSimilarityIndexed(spark: SparkSession, dir: String): DataFrame =
    sourceSimilarityFrom(
      Postings.postings(spark, dir).select("doc_id", "word")
        .join(documents(spark, dir).select("doc_id", "source"), Seq("doc_id"))
        .select("source", "word"))

  private def sourceSimilarityFrom(sourceWords: DataFrame): DataFrame = {
    val vocab = sourceWords
      .distinct()
      .repartition(col("word"))
    val sizes = vocab.groupBy("source").agg(count(lit(1)).as("n"))
    val inter = vocab.as("x").join(vocab.as("y"),
        col("x.word") === col("y.word") && col("x.source") < col("y.source"))
      .groupBy(col("x.source").as("source_a"), col("y.source").as("source_b"))
      .agg(count(lit(1)).as("n_shared"))
    inter
      .join(broadcast(sizes.select(col("source").as("source_a"), col("n").as("na"))),
        Seq("source_a"))
      .join(broadcast(sizes.select(col("source").as("source_b"), col("n").as("nb"))),
        Seq("source_b"))
      .select(col("source_a"), col("source_b"), col("n_shared"),
        col("na").as("vocab_a"), col("nb").as("vocab_b"),
        (col("n_shared").cast("double") /
          (col("na") + col("nb") - col("n_shared")).cast("double")).as("jaccard"))
      .orderBy("source_a", "source_b")
  }

  /** Per-source vocabulary shape — tokens, types, hapax legomena and
    * their ratios (the Heaps/Zipf telemetry that flags template-heavy or
    * machine-generated sources: real text keeps hapax_frac high, boiler-
    * plate collapses it). One (source, word) census; every ratio is a
    * single IEEE divide of exact integers. */
  def vocabGrowth(spark: SparkSession, dir: String): DataFrame =
    vocabGrowthFrom(spark, dir, documents(spark, dir)
      .select(col("source"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("source", "word")
      .agg(count(lit(1)).as("cnt")))

  /** [[vocabGrowth]] off the standing postings table: per-(source,
    * word) token counts are `sum(tf)` over the index joined to the
    * doc→source map — identical integers to the scratch explode-count,
    * same oracle, no corpus re-tokenization. */
  def vocabGrowthIndexed(spark: SparkSession, dir: String): DataFrame =
    vocabGrowthFrom(spark, dir,
      Postings.postings(spark, dir).select("doc_id", "word", "tf")
        .join(documents(spark, dir).select("doc_id", "source"), Seq("doc_id"))
        .groupBy("source", "word")
        .agg(sum("tf").as("cnt")))

  /** Shared tail over a (source, word, cnt) census frame. */
  private def vocabGrowthFrom(spark: SparkSession, dir: String,
      wordCounts: DataFrame): DataFrame = {
    val perSource = wordCounts.groupBy("source").agg(
      sum("cnt").as("n_tokens"),
      count(lit(1)).as("n_types"),
      sum(when(col("cnt") === 1, 1L).otherwise(0L)).as("n_hapax"))
    val docs = documents(spark, dir).groupBy("source")
      .agg(count(lit(1)).as("n_docs"))
    perSource.join(broadcast(docs), Seq("source"))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("n_types"),
        col("n_hapax"),
        (col("n_types").cast("double") / col("n_tokens").cast("double"))
          .as("type_token_ratio"),
        (col("n_hapax").cast("double") / col("n_types").cast("double"))
          .as("hapax_frac"))
      .orderBy("source")
  }

  // ---- per-source length telemetry ------------------------------------

  /** Order-of-magnitude token histogram per source (curation telemetry:
    * does src3 skew short?): bucket = DECIMAL DIGITS of the word count
    * (integer-exact in every engine — no float log). Pure map-side
    * bucketing + one small aggregation. */
  def tokenHistogram(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .select(col("source"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n"))
      .withColumn("magnitude", length(col("n").cast("string")).cast("int"))
      .groupBy("source", "magnitude")
      .agg(count(lit(1)).as("n_docs"), min("n").as("min_words"),
        max("n").as("max_words"), sum("n").as("sum_words"))
      .orderBy("source", "magnitude")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "gopher_quality" -> gopherQuality _,
    "block_dedup" -> blockDedup _,
    "intra_dedup" -> intraDedup _,
    "lm_typicality" -> lmTypicality _,
    "typicality_buckets" -> typicalityBuckets _,
    "dsir_contrast" -> dsirContrast _,
    "source_overlap" -> sourceOverlap _,
    "source_similarity" -> sourceSimilarity _,
    "source_similarity_indexed" -> sourceSimilarityIndexed _,
    "vocab_growth" -> vocabGrowth _,
    "vocab_growth_indexed" -> vocabGrowthIndexed _,
    "dup_rate_report" -> dupRateReport _,
    "token_histogram" -> tokenHistogram _,
    "source_mixture" -> sourceMixture _)

  // the standing-postings paths are bit-identical to the from-scratch
  // ones (same distinct pairs / token counts) → same oracle SQL
  val oracles: Map[String, String] = baseOracles ++ Map(
    "source_similarity_indexed" -> baseOracles("source_similarity"),
    "vocab_growth_indexed" -> baseOracles("vocab_growth"))

  private lazy val baseOracles: Map[String, String] = Map(
    // string trigrams where the query censuses their packed-int images
    // (bijective for this ASCII corpus — lm_typicality's argument)
    "dsir_contrast" ->
      """WITH g AS (
        |  SELECT doc_id, source,
        |         unnest(list_transform(range(1, GREATEST(length(text) - 2, 0) + 1),
        |                i -> substr(text, CAST(i AS INTEGER), 3))) AS tg
        |  FROM documents),
        |t AS (SELECT doc_id, source, tg FROM g WHERE length(tg) = 3),
        |corpus AS (SELECT tg, COUNT(*) AS ccnt FROM t GROUP BY tg),
        |target AS (SELECT tg, COUNT(*) AS tcnt FROM t
        |           WHERE source = 'src0' GROUP BY tg)
        |SELECT t.doc_id,
        |       CAST(COUNT(*) AS BIGINT) AS n_trigrams,
        |       CAST(SUM(coalesce(target.tcnt, 0)) AS BIGINT) AS target_hits,
        |       CAST(SUM(corpus.ccnt) AS BIGINT) AS corpus_hits,
        |       round(CAST(SUM(coalesce(target.tcnt, 0)) AS DOUBLE)
        |             / CAST(SUM(corpus.ccnt) AS BIGINT), 6) AS contrast
        |FROM t JOIN corpus USING (tg) LEFT JOIN target USING (tg)
        |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin,
    // the oracle pairs sources sharing a RAW block string where the
    // query pairs their md5 images — identical counts absent a
    // collision (dedup_exact's argument)
    "source_overlap" ->
      s"""WITH toks AS (
         |  SELECT source, regexp_split_to_array(trim(text), '\\s+') AS w
         |  FROM documents),
         |blocks AS (
         |  SELECT DISTINCT source,
         |    unnest(list_transform(range(1, GREATEST(len(w) // $BlockWords, 0) + 1),
         |      i -> array_to_string(w[((i - 1) * $BlockWords + 1):(i * $BlockWords)], ' '))) AS b
         |  FROM toks WHERE len(w) >= $BlockWords)
         |SELECT x.source AS source_a, y.source AS source_b,
         |       COUNT(*) AS shared_blocks
         |FROM blocks x JOIN blocks y ON x.b = y.b AND x.source < y.source
         |GROUP BY 1, 2
         |ORDER BY source_a, source_b""".stripMargin,
    // the engine pairs md5 images where the oracle groups raw blocks —
    // identical counts absent a collision (the source_overlap argument)
    "dup_rate_report" ->
      s"""WITH d AS (
         |  SELECT doc_id, source,
         |         md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS h
         |  FROM documents),
         |r AS (
         |  SELECT source,
         |         CASE WHEN doc_id <> MIN(doc_id) OVER (PARTITION BY h)
         |              THEN 1 ELSE 0 END AS is_dup
         |  FROM d),
         |ds AS (SELECT source, COUNT(*) AS n_docs,
         |              CAST(SUM(is_dup) AS BIGINT) AS n_dup_docs
         |       FROM r GROUP BY 1),
         |toks AS (
         |  SELECT doc_id, source,
         |         regexp_split_to_array(trim(text), '\\s+') AS w
         |  FROM documents),
         |b AS (
         |  SELECT doc_id, source,
         |    unnest(list_transform(range(1, GREATEST(len(w) // $BlockWords, 0) + 1),
         |      i -> array_to_string(w[((i - 1) * $BlockWords + 1):(i * $BlockWords)], ' ')))
         |      AS bh
         |  FROM toks WHERE len(w) >= $BlockWords),
         |sh AS (SELECT bh FROM (
         |         SELECT bh, COUNT(DISTINCT doc_id) AS nd FROM b GROUP BY 1)
         |       WHERE nd > 1),
         |bs AS (SELECT source, COUNT(*) AS n_shared_blocks FROM b
         |       WHERE bh IN (SELECT bh FROM sh) GROUP BY 1),
         |tb AS (SELECT source, COUNT(*) AS n_blocks FROM b GROUP BY 1)
         |SELECT ds.source, ds.n_docs, ds.n_dup_docs,
         |       CAST(ds.n_dup_docs AS DOUBLE) / ds.n_docs AS doc_dup_rate,
         |       CAST(COALESCE(tb.n_blocks, 0) AS BIGINT) AS n_blocks,
         |       CAST(COALESCE(bs.n_shared_blocks, 0) AS BIGINT)
         |         AS n_shared_blocks,
         |       CAST(COALESCE(bs.n_shared_blocks, 0) AS DOUBLE)
         |         / CAST(GREATEST(COALESCE(tb.n_blocks, 0), 1) AS DOUBLE)
         |         AS block_dup_rate
         |FROM ds LEFT JOIN tb ON tb.source = ds.source
         |LEFT JOIN bs ON bs.source = ds.source
         |ORDER BY ds.source""".stripMargin,
    "source_similarity" ->
      """WITH vocab AS (
        |  SELECT DISTINCT source, word FROM (
        |    SELECT source,
        |           unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS word
        |    FROM documents)
        |  WHERE word <> ''),
        |sizes AS (SELECT source, COUNT(*) AS n FROM vocab GROUP BY 1),
        |inter AS (
        |  SELECT x.source AS source_a, y.source AS source_b,
        |         COUNT(*) AS n_shared
        |  FROM vocab x JOIN vocab y
        |    ON x.word = y.word AND x.source < y.source
        |  GROUP BY 1, 2)
        |SELECT source_a, source_b, n_shared,
        |       a.n AS vocab_a, b.n AS vocab_b,
        |       CAST(n_shared AS DOUBLE)
        |         / CAST(a.n + b.n - n_shared AS DOUBLE) AS jaccard
        |FROM inter
        |JOIN sizes a ON a.source = source_a
        |JOIN sizes b ON b.source = source_b
        |ORDER BY source_a, source_b""".stripMargin,
    "vocab_growth" ->
      """WITH wc AS (
        |  SELECT source, word, COUNT(*) AS cnt FROM (
        |    SELECT source,
        |           unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS word
        |    FROM documents)
        |  WHERE word <> '' GROUP BY 1, 2),
        |per_source AS (
        |  SELECT source,
        |         CAST(SUM(cnt) AS BIGINT) AS n_tokens,
        |         COUNT(*) AS n_types,
        |         CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
        |  FROM wc GROUP BY 1),
        |docs AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY 1)
        |SELECT source, n_docs, n_tokens, n_types, n_hapax,
        |       CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE)
        |         AS type_token_ratio,
        |       CAST(n_hapax AS DOUBLE) / CAST(n_types AS DOUBLE) AS hapax_frac
        |FROM per_source JOIN docs USING (source)
        |ORDER BY source""".stripMargin,
    "token_histogram" ->
      """WITH n AS (
        |  SELECT source,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n
        |  FROM documents)
        |SELECT source, CAST(length(CAST(n AS VARCHAR)) AS INTEGER) AS magnitude,
        |       COUNT(*) AS n_docs, MIN(n) AS min_words, MAX(n) AS max_words,
        |       CAST(SUM(n) AS BIGINT) AS sum_words
        |FROM n GROUP BY 1, 2
        |ORDER BY source, magnitude""".stripMargin,
    "lm_typicality" ->
      s"""WITH g AS (
         |  SELECT doc_id, unnest(list_transform(range(1, GREATEST(length(text) - 2, 0) + 1),
         |                i -> substr(text, CAST(i AS INTEGER), 3))) AS tg
         |  FROM documents),
         |t AS (SELECT doc_id, tg FROM g WHERE length(tg) = 3),
         |c AS (SELECT tg, COUNT(*) AS cnt FROM t GROUP BY tg)
         |SELECT t.doc_id,
         |       CAST(COUNT(*) AS BIGINT) AS n_trigrams,
         |       CAST(SUM(c.cnt) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_tg_freq,
         |       CAST(SUM(CASE WHEN c.cnt <= $RareThreshold THEN 1 ELSE 0 END) AS DOUBLE)
         |         / CAST(COUNT(*) AS DOUBLE) AS rare_frac
         |FROM t JOIN c USING (tg)
         |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin,
    "typicality_buckets" ->
      s"""WITH g AS (
         |  SELECT doc_id, source,
         |         unnest(list_transform(range(1, GREATEST(length(text) - 2, 0) + 1),
         |                i -> substr(text, CAST(i AS INTEGER), 3))) AS tg
         |  FROM documents),
         |t AS (SELECT doc_id, source, tg FROM g WHERE length(tg) = 3),
         |c AS (SELECT tg, COUNT(*) AS cnt FROM t GROUP BY tg),
         |d AS (
         |  SELECT t.doc_id, t.source,
         |         CAST(COUNT(*) AS BIGINT) AS n_tg,
         |         CAST(SUM(c.cnt) AS BIGINT) AS sum_freq,
         |         CAST(SUM(c.cnt) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         |           AS score
         |  FROM t JOIN c USING (tg)
         |  GROUP BY t.doc_id, t.source),
         |b AS (
         |  SELECT *, NTILE(3) OVER (PARTITION BY source
         |           ORDER BY score DESC, doc_id) AS bucket
         |  FROM d)
         |SELECT source, CAST(bucket AS INTEGER) AS bucket,
         |       CAST(COUNT(*) AS BIGINT) AS n_docs,
         |       CAST(SUM(n_tg) AS BIGINT) AS n_trigrams,
         |       CAST(SUM(sum_freq) AS BIGINT) AS sum_freq,
         |       CAST(SUM(sum_freq) AS DOUBLE) / CAST(SUM(n_tg) AS DOUBLE)
         |         AS avg_tg_freq,
         |       MAX(score) AS max_score, MIN(score) AS min_score
         |FROM b GROUP BY source, bucket ORDER BY source, bucket""".stripMargin,
    "gopher_quality" ->
      """WITH w AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS word
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, word, COUNT(*) AS n, length(word) * COUNT(*) AS chars
        |  FROM w WHERE word <> '' GROUP BY doc_id, word)
        |SELECT doc_id,
        |       CAST(SUM(n) AS BIGINT) AS n_words,
        |       CAST(COUNT(*) AS BIGINT) AS n_distinct,
        |       CAST(MAX(n) AS BIGINT) AS top_word_n,
        |       CAST(SUM(chars) AS BIGINT) AS sum_word_len,
        |       (MAX(n) * 5 <= SUM(n) AND COUNT(*) * 3 >= SUM(n)
        |        AND SUM(n) * 3 <= SUM(chars) AND SUM(chars) <= SUM(n) * 10) AS keep
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "block_dedup" ->
      s"""WITH d AS (
         |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
         |  FROM documents),
         |b AS (
         |  SELECT doc_id, md5(array_to_string(
         |           w[(i - 1) * $BlockWords + 1 : i * $BlockWords], ' ')) AS h
         |  FROM (SELECT doc_id, w,
         |          unnest(range(1, greatest(len(w) // $BlockWords, 0) + 1)) AS i
         |        FROM d)),
         |s AS (SELECT h FROM b GROUP BY h HAVING COUNT(DISTINCT doc_id) > 1),
         |per AS (
         |  SELECT b.doc_id, COUNT(*) AS n_blocks,
         |         COUNT(*) FILTER (WHERE b.h IN (SELECT h FROM s)) AS n_shared
         |  FROM b GROUP BY b.doc_id)
         |SELECT doc_id, CAST(n_blocks AS BIGINT) AS n_blocks,
         |       CAST(n_shared AS BIGINT) AS n_shared_blocks,
         |       ROUND(CAST(n_shared AS DOUBLE) / n_blocks, 4) AS shared_frac
         |FROM per ORDER BY doc_id""".stripMargin,
    "intra_dedup" ->
      s"""WITH d AS (
         |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
         |  FROM documents),
         |b AS (
         |  SELECT doc_id, i, array_to_string(
         |           w[(i - 1) * $IntraBlockWords + 1 : i * $IntraBlockWords], ' ') AS block
         |  FROM (SELECT doc_id, w,
         |          unnest(range(1, greatest(len(w) // $IntraBlockWords, 0) + 1)) AS i
         |        FROM d)),
         |f AS (SELECT doc_id, block, MIN(i) AS i FROM b GROUP BY doc_id, block),
         |k AS (SELECT doc_id, COUNT(*) AS n_kept,
         |        md5(string_agg(block, ' ' ORDER BY i)) AS clean_md5
         |      FROM f GROUP BY doc_id),
         |t AS (SELECT doc_id, COUNT(*) AS n_blocks FROM b GROUP BY doc_id)
         |SELECT t.doc_id, CAST(t.n_blocks AS BIGINT) AS n_blocks,
         |       CAST(k.n_kept AS BIGINT) AS n_kept,
         |       CAST(t.n_blocks - k.n_kept AS BIGINT) AS n_dup_blocks,
         |       k.clean_md5
         |FROM t JOIN k ON t.doc_id = k.doc_id
         |ORDER BY t.doc_id""".stripMargin,
    "source_mixture" ->
      s"""WITH counts AS (
         |  SELECT source, COUNT(*) AS n, sqrt(COUNT(*)) AS sqrtn
         |  FROM documents GROUP BY source),
         |q AS (
         |  SELECT source, n,
         |         LEAST(n, CAST(FLOOR(
         |           CAST(SUM(n) OVER (ORDER BY source ROWS BETWEEN UNBOUNDED PRECEDING
         |              AND UNBOUNDED FOLLOWING) AS DOUBLE) * $MixtureFraction * sqrtn /
         |           (SUM(sqrtn) OVER (ORDER BY source ROWS BETWEEN UNBOUNDED PRECEDING
         |              AND UNBOUNDED FOLLOWING)) + 0.5) AS BIGINT)) AS quota
         |  FROM counts),
         |r AS (
         |  SELECT doc_id, source,
         |         CAST(ROW_NUMBER() OVER (PARTITION BY source
         |           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INTEGER) AS rk
         |  FROM documents)
         |SELECT r.doc_id, r.source, r.rk, q.n AS source_docs, q.quota
         |FROM r JOIN q ON r.source = q.source
         |WHERE r.rk <= q.quota
         |ORDER BY r.source, r.rk""".stripMargin)
}
