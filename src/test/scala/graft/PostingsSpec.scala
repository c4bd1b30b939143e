package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.text.Postings

/** Standing postings table: content equals the from-scratch derivation,
  * re-runs append nothing, and a day-2 batch appends ONLY its own docs
  * (the incremental contract that makes the lexical family a standing
  * index instead of a per-query corpus re-scan). */
class PostingsSpec extends SparkSpec {
  import spark.implicits._

  private def docsOf(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))

  test("postings equal the from-scratch tokenization, raw positions kept") {
    val docs = docsOf(
      1L -> "The quick  brown fox", // \s+ split collapses the double space
      2L -> "fox fox jumps")
    val path = graft.GraftTmp.dir("gt_postings").toString + "/t"
    val t = Postings.update(spark, docs, path)
    val got = t.read().as[(Long, String, Long, Seq[Int])].collect()
      .map { case (d, w, tf, ps) => (d, w) -> ((tf, ps)) }.toMap
    // split("\\s+") treats a whitespace RUN as one delimiter: positions
    // are token ordinals, identical in both tokenization paths
    assert(got((1L, "brown")) == ((1L, Seq(2))))
    assert(got((1L, "fox")) == ((1L, Seq(3))))
    assert(got((2L, "fox")) == ((2L, Seq(0, 1))))
    assert(!got.keySet.exists(_._2 == ""), "empty tokens must not land rows")
    // tf ≡ positions length everywhere
    assert(got.values.forall { case (tf, ps) => tf == ps.length })
  }

  test("update is idempotent; a fresh batch appends only its own docs") {
    val d1 = docsOf(1L -> "alpha beta", 2L -> "beta gamma")
    val path = graft.GraftTmp.dir("gt_postings2").toString + "/t"
    val t = Postings.update(spark, d1, path)
    val v1 = t.currentVersion
    // replay: nothing new → no commit
    Postings.update(spark, d1, path)
    assert(graft.table.GraftTable(spark, path).currentVersion == v1,
      "replay must not commit")
    // day-2 batch: only doc 3's postings land (one APPEND + its
    // tail-only byte-target OPTIMIZE + the doc-census property commit)
    val d2 = d1.unionByName(docsOf(3L -> "gamma delta"))
    Postings.update(spark, d2, path)
    val t2 = graft.table.GraftTable(spark, path)
    assert(t2.currentVersion == v1 + 3)
    assert(t2.properties(Postings.DocCountProp) == "3",
      "census property must count every distinct ingested doc")
    val byDoc = t2.read().groupBy("doc_id").count()
      .as[(Long, Long)].collect().toMap
    assert(byDoc == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("bm25/phrase indexed paths equal the from-scratch queries") {
    import graft.similarity.HybridSearch
    val scratch = HybridSearch.bm25Rank(spark, sf).collect().toSeq
    val indexed = HybridSearch.bm25Indexed(spark, sf).collect().toSeq
    assert(indexed == scratch, "bm25_indexed diverged from bm25_rank")
    val ps = HybridSearch.phraseSearch(spark, sf).collect().toSeq
    val pi = HybridSearch.phraseIndexed(spark, sf).collect().toSeq
    assert(pi == ps, "phrase_indexed diverged from phrase_search")
    val hr = HybridSearch.hybridRrf(spark, sf).collect().toSeq
    val hi = HybridSearch.hybridIndexed(spark, sf).collect().toSeq
    assert(hi == hr, "hybrid_indexed diverged from hybrid_rrf")
  }

  test("postings files are byte-targeted (bin-packed toward the target)") {
    // build the standing postings for the sf fixture with a deliberately
    // tiny target so the bin-packing has to split: the write must land
    // multiple files whose MEAN size sits in the target's band, and the
    // appended day-2 batch must keep the band (only its tail re-bins).
    val docs = graft.tables.Tables.documents(spark, sf)
    val path = graft.GraftTmp.dir("gt_postings3").toString + "/t"
    val target = 16 * 1024L
    val t = Postings.update(spark, docs, path, targetBytes = target)
    val h = t.health()
    assert(h.numFiles >= 2, s"expected a split, got ${h.numFiles} file(s)")
    assert(h.avgFileBytes >= target / 4 && h.avgFileBytes <= target * 2,
      s"mean file size ${h.avgFileBytes} outside [${target / 4}, ${target * 2}]")
    // the bin count must track ceil(bytes/target), not a constant
    val bins = (h.totalBytes + target - 1) / target
    assert(h.numFiles >= bins / 2 && h.numFiles <= bins * 2,
      s"${h.numFiles} files vs ~$bins byte-targeted bins")
  }

  test("tfidf/vocab_growth/source_similarity indexed paths equal scratch") {
    import graft.text.{TextAnalysis, QualityFilters}
    assert(TextAnalysis.tfidfIndexed(spark, sf).collect().toSeq ==
      TextAnalysis.tfidfKeywords(spark, sf).collect().toSeq,
      "tfidf_indexed diverged from tfidf_keywords")
    assert(QualityFilters.vocabGrowthIndexed(spark, sf).collect().toSeq ==
      QualityFilters.vocabGrowth(spark, sf).collect().toSeq,
      "vocab_growth_indexed diverged from vocab_growth")
    assert(QualityFilters.sourceSimilarityIndexed(spark, sf).collect().toSeq ==
      QualityFilters.sourceSimilarity(spark, sf).collect().toSeq,
      "source_similarity_indexed diverged from source_similarity")
  }

  test("adjacency (collocations/KN/novelty) indexed paths equal scratch") {
    // r13: the last three lexical re-tokenizers ride the positions
    // column — bigram/trigram frames are positional equi-joins, so
    // adjacency must be exactly the scratch arrays_zip slices
    import graft.text.TextAnalysis
    assert(TextAnalysis.collocationsIndexed(spark, sf).collect().toSeq ==
      TextAnalysis.collocations(spark, sf).collect().toSeq,
      "collocations_indexed diverged from collocations")
    assert(TextAnalysis.ngramLmCountsIndexed(spark, sf).collect().toSeq ==
      TextAnalysis.ngramLmCounts(spark, sf).collect().toSeq,
      "ngram_lm_counts_indexed diverged from ngram_lm_counts")
    assert(TextAnalysis.ngramNoveltyIndexed(spark, sf).collect().toSeq ==
      TextAnalysis.ngramNovelty(spark, sf).collect().toSeq,
      "ngram_novelty_indexed diverged from ngram_novelty")
  }

  test("tokenless docs are censused once and stay invisible to consumers") {
    // empty / whitespace-only / null text yields no postings rows, but
    // the doc must still count as INGESTED: pre-r15 it stayed "fresh"
    // forever (re-inflating the census on every update) and the
    // serve-time completeness gate could never match the corpus count
    val docs = docsOf(1L -> "alpha beta", 2L -> "", 3L -> "   \t\n",
      4L -> null.asInstanceOf[String])
    val path = graft.GraftTmp.dir("gt_postings_tl").toString + "/t"
    val t = Postings.update(spark, docs, path)
    assert(t.properties(Postings.DocCountProp) == "4",
      "census must count tokenless docs as ingested")
    val v1 = t.currentVersion
    // replay: tokenless docs are in the table (as sentinels) → nothing
    // fresh, census already right → zero commits
    Postings.update(spark, docs, path)
    val t2 = graft.table.GraftTable(spark, path)
    assert(t2.currentVersion == v1, "tokenless docs must not re-ingest")
    assert(t2.properties(Postings.DocCountProp) == "4",
      "replay must not inflate the census")
    // sentinel rows are the census mechanism, never a consumer-visible
    // word: the raw table holds them, the served frame does not
    assert(t2.read().filter(col("word").isNull)
      .select("doc_id").as[Long].collect().sorted.toSeq == Seq(2L, 3L, 4L))
    assert(t2.read().filter(col("word").isNotNull)
      .select("doc_id").distinct().as[Long].collect().toSeq == Seq(1L))
  }

  test("a stale census (crash between append and property commit) self-heals") {
    val docs = docsOf(1L -> "alpha beta", 2L -> "beta gamma")
    val path = graft.GraftTmp.dir("gt_postings_heal").toString + "/t"
    val t = Postings.update(spark, docs, path)
    // simulate the torn day-2 ingest: the data commit landed but the
    // census commit didn't — the stored property undercounts
    t.setProperties(Map(Postings.DocCountProp -> "1"))
    // a replay has nothing fresh to append, but must reconcile the
    // census from the table itself instead of wedging forever
    Postings.update(spark, docs, path)
    assert(graft.table.GraftTable(spark, path)
      .properties(Postings.DocCountProp) == "2",
      "replay must reconcile a stale census from the table's doc set")
  }

  test("a partial first build at a fingerprinted standing path is refused") {
    // an isolated corpus copy: poisoning the REAL sf fixture's standing
    // path would break every indexed twin in this JVM
    val dir = graft.GraftTmp.dir("gt_partial").toString
    graft.tables.Tables.documents(spark, sf).limit(40)
      .write.parquet(new java.io.File(dir, "documents.parquet").toString)
    val docs = graft.tables.Tables.documents(spark, dir)
    val total = docs.count()
    // off-contract first build: half the corpus lands at the
    // fingerprinted path (the silent-incompleteness hazard)
    Postings.update(spark, docs.filter(col("doc_id") % 2 === 0),
      Postings.postingsPath(dir))
    val e = intercept[IllegalStateException] { Postings.postings(spark, dir) }
    assert(e.getMessage.contains("incomplete postings table"),
      s"named completeness error expected, got: ${e.getMessage}")
    // feeding the full corpus completes the census — serving resumes
    Postings.update(spark, docs, Postings.postingsPath(dir))
    assert(Postings.postings(spark, dir)
      .select("doc_id").distinct().count() == total)
  }

  test("duplicate doc_id rows in the source cannot wedge the completeness gate") {
    // the census counts DISTINCT docs; the serve-time gate's cheap
    // check is a raw row count — with duplicate doc_id rows in the
    // source the two can never be equal, so pre-r16 the gate refused a
    // COMPLETE table forever with a remedy (re-run update) that could
    // never reconcile it. The gate must fall back to the distinct
    // count before refusing.
    val dir = graft.GraftTmp.dir("gt_dupsrc").toString
    val base = graft.tables.Tables.documents(spark, sf).limit(20)
    base.unionAll(base.limit(5))
      .write.parquet(new java.io.File(dir, "documents.parquet").toString)
    val docs = graft.tables.Tables.documents(spark, dir)
    assert(docs.count() == 25 &&
      docs.select("doc_id").distinct().count() == 20) // the mismatch
    Postings.update(spark, docs, Postings.postingsPath(dir))
    assert(Postings.postings(spark, dir)
      .select("doc_id").distinct().count() == 20,
      "a complete table over a dup-row source must serve, not refuse")
  }

  test("graft-table source keys the standing index by manifest version, not a file walk") {
    import graft.table.{GraftTable, StandingIndex}
    val parent = graft.GraftTmp.dir("gt_fp_src").toString
    val t = GraftTable(spark, new java.io.File(parent, "corpus").toString)
    t.write(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))

    val p1 = StandingIndex.fingerprint(parent, "corpus")
    assert(StandingIndex.fingerprint(parent, "corpus") == p1,
      "no-op re-resolution must reuse the fingerprint")

    // out-of-band mtime churn on a DATA file must not re-key — the
    // manifest is the identity, proving the per-file walk is gone for
    // graft sources
    val dataFile = new java.io.File(parent, "corpus").listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).head
    assert(dataFile.setLastModified(dataFile.lastModified() + 60000))
    assert(StandingIndex.fingerprint(parent, "corpus") == p1,
      "graft-source fingerprint must ignore data-file mtimes")

    // a commit (version bump) must invalidate
    t.write(Seq((3L, "c")).toDF("id", "v"),
      org.apache.spark.sql.SaveMode.Append)
    assert(StandingIndex.fingerprint(parent, "corpus") != p1,
      "version bump must re-key the standing index")

    // a table deleted and REGENERATED at the same path restarts at v0:
    // the new latest manifest has the same NAME, and (forced here) the
    // same mtime as the old one — only its content distinguishes them.
    // The digest hashes the manifest bytes, so it must re-key even
    // inside the (name, length, mtime) collision window.
    val manifest0 = new java.io.File(
      new java.io.File(parent, "corpus"), "_graft_log").listFiles()
      .filter(_.getName.endsWith(".json")).maxBy(_.getName)
    val oldMtime = manifest0.lastModified()
    val p2 = StandingIndex.fingerprint(parent, "corpus")
    def deleteRec(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(deleteRec)); f.delete()
    }
    deleteRec(new java.io.File(parent, "corpus"))
    val t2 = GraftTable(spark, new java.io.File(parent, "corpus").toString)
    t2.write(Seq((7L, "x"), (8L, "y"), (9L, "z")).toDF("id", "v"))
    t2.write(Seq((10L, "w")).toDF("id", "v"),
      org.apache.spark.sql.SaveMode.Append) // same latest version number
    val manifest1 = new java.io.File(
      new java.io.File(parent, "corpus"), "_graft_log").listFiles()
      .filter(_.getName.endsWith(".json")).maxBy(_.getName)
    assert(manifest1.getName == manifest0.getName,
      "fixture: regenerated table must land the same latest manifest name")
    assert(manifest1.setLastModified(oldMtime)) // force the mtime collision
    assert(StandingIndex.fingerprint(parent, "corpus") != p2,
      "regenerated table at the same path must re-key the standing " +
      "index even when manifest name and mtime collide")

    // raw parquet dirs keep the walk: the same mtime churn re-keys
    val rawParent = graft.GraftTmp.dir("gt_fp_raw").toString
    Seq((1L, "a")).toDF("id", "v").write
      .parquet(new java.io.File(rawParent, "raw").toString)
    val r1 = StandingIndex.fingerprint(rawParent, "raw")
    val rawFile = new java.io.File(rawParent, "raw").listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).head
    assert(rawFile.setLastModified(rawFile.lastModified() + 60000))
    assert(StandingIndex.fingerprint(rawParent, "raw") != r1,
      "raw-dir fingerprint must still track file state")
  }
}
