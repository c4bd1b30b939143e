package graft

import org.apache.spark.sql.functions._
import graft.functions.{Fingerprints, TextFingerprint}
import graft.text.TextAnalysis
import org.apache.spark.unsafe.types.UTF8String

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("ngram_novelty: first occurrence owns the gram; copies score zero") {
    val fx = graft.GraftTmp.dir("novelty_fx").toString
    Seq(
      (1L, "alpha beta gamma delta epsilon zeta"), // all 4 trigrams novel
      (2L, "alpha beta gamma delta epsilon zeta"), // exact copy: 0 novel
      // shares its first trigram window with doc 1, adds 2 fresh ones
      (3L, "alpha beta gamma theta iota"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.parquet(s"$fx/documents.parquet")
    val got = graft.text.TextAnalysis.ngramNovelty(spark, fx)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 4L, 4L, 10000L),  // 4/4 novel
      (2L, 4L, 0L, 0L),      // every trigram first seen in doc 1
      (3L, 3L, 2L, 6666L)),  // "alpha beta gamma" owned by doc 1; 2*10000 div 3
      s"got $got")
  }

  test("lang_id identifies real multilingual sentences") {
    val samples = Seq(
      (1L, "the cat sat on the mat and it was happy for a while", "en"),
      (2L, "le chat est dans la maison et les enfants jouent dans le jardin", "fr"),
      (3L, "el perro corre por el parque y los gatos duermen en la casa", "es"),
      (4L, "der Hund und die Katze spielen mit einem Ball von dem Kind", "de"),
      (5L, "我 的 朋友 是 在 北京 我们 有 很多 书 这 是 好 的", "zh"))
    val df = samples.toDF("doc_id", "text", "lang")
    df.createOrReplaceTempView("langid_fixture")
    // reuse the pack's scoring logic directly on the fixture
    val langs = Seq("en", "fr", "es", "de", "zh")
    def hits(l: String) =
      size(filter(split(trim(col("text")), "\\s+"),
        w => w.isInCollection(TextAnalysis.Stopwords(l))))
    val best = langs.foldRight(lit("und")) { (l, acc) =>
      when(col(s"hits_$l") > 0 &&
        langs.filter(_ != l).map(o => col(s"hits_$l") >= col(s"hits_$o"))
          .reduce(_ && _), lit(l)).otherwise(acc)
    }
    val pred = df.select(col("doc_id") +: col("lang") +: langs.map(l => hits(l).as(s"hits_$l")): _*)
      .withColumn("predicted", best)
      .select("lang", "predicted").as[(String, String)].collect()
    pred.foreach { case (expected, got) =>
      assert(got == expected, s"expected $expected got $got")
    }
  }

  test("fingerprint kernel: known values, stability, edit locality") {
    val h1 = Fingerprints.minKgramHash(UTF8String.fromString("hello world hello"), 8)
    val h2 = Fingerprints.minKgramHash(UTF8String.fromString("hello world hello"), 8)
    assert(h1 == h2)
    assert(h1 > 0)
    // identical content → identical fingerprint
    // appended tail far from the minimizing k-gram usually keeps the min
    val base = "the quick brown fox jumps over the lazy dog " * 5
    val fpBase = Fingerprints.minKgramHash(UTF8String.fromString(base), 8)
    val fpApp = Fingerprints.minKgramHash(UTF8String.fromString(base + "zzzz"), 8)
    assert(fpBase == fpApp) // min over superset of k-grams can only stay or drop
    // short strings fall back to full hash
    assert(Fingerprints.minKgramHash(UTF8String.fromString("abc"), 8) ==
      Fingerprints.fullHash("abc"))
    assert(Fingerprints.minKgramHash(UTF8String.fromString(""), 8) == 0L)
  }

  test("fingerprint min-property: min k-gram hash over sliding windows") {
    // brute-force reference: hash every k-gram with the same polynomial
    val s = "abcdefgabcxyz"
    val k = 4
    val expected = (0 to s.length - k)
      .map(i => Fingerprints.fullHash(s.substring(i, i + k))).min
    assert(Fingerprints.minKgramHash(UTF8String.fromString(s), k) == expected)
  }

  test("TextFingerprint expression: codegen and interpreted paths agree") {
    val df = Seq((1L, "spark catalyst expression codegen test string"),
      (2L, "another document with different content entirely")).toDF("id", "text")
    val viaExpr = df.select(col("id"),
      TextFingerprint.text_fingerprint(col("text"), 8).as("fp"))
      .as[(Long, Long)].collect().toMap
    val viaKernel = df.as[(Long, String)].collect()
      .map { case (id, t) => id -> Fingerprints.minKgramHash(UTF8String.fromString(t), 8) }
      .toMap
    assert(viaExpr == viaKernel)
  }

  test("quality score stays in [0,1] and favors stopword-bearing text") {
    val df = TextAnalysis.qualityScore(spark, sf).cache()
    assert(df.filter(col("quality") < 0 || col("quality") > 1).count() == 0)
  }

  test("doc_fingerprint: normalized fingerprint collapses case/whitespace variants") {
    val df = Seq((1L, "Hello   World Test Document"), (2L, "hello world test document"))
      .toDF("doc_id", "text")
    val fps = df.select(
      TextFingerprint.text_fingerprint(
        lower(regexp_replace(col("text"), "\\s+", " ")), 8).as("nfp"))
      .as[Long].collect()
    assert(fps(0) == fps(1))
  }

  test("trigram_topk returns 5 per language") {
    val df = TextAnalysis.trigramTopk(spark, sf)
    val counts = df.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(counts.values.forall(_ == 5))
    assert(counts.keySet == Set("en", "fr", "es", "de", "zh"))
  }

  test("tfidf_keywords: df gate drops corpus-wide words, rank order is (tf desc, df asc, word)") {
    // planted corpus: "common" appears in all 4 docs (gated out);
    // doc 1 repeats the rare word "quasar" 3x → its top keyword
    val fixture = graft.GraftTmp.dir("tfidf_fx").toString
    Seq(
      (1L, "common quasar quasar quasar pulsar pulsar nova", "en", "s1", 0L),
      (2L, "common nova nova pulsar", "en", "s1", 0L),
      (3L, "common meteor", "en", "s2", 0L),
      (4L, "common comet comet comet comet", "en", "s2", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$fixture/documents.parquet")
    val rows = TextAnalysis.tfidfKeywords(spark, fixture)
      .as[(Long, Int, String, Long, Long)].collect()
    // "common" has df=4, 2*4 > 4 docs → gated everywhere
    assert(!rows.exists(_._3 == "common"), rows.mkString(", "))
    val doc1 = rows.filter(_._1 == 1L).sortBy(_._2)
    assert(doc1.map(_._3).toSeq == Seq("quasar", "pulsar", "nova"),
      doc1.mkString(", ")) // tf 3,2,1; nova beats nothing else left
    assert(doc1.map(_._4).toSeq == Seq(3L, 2L, 1L))
    // per-doc at most 3 keywords, ranks dense from 1
    rows.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.length <= 3 && rs.map(_._2).sorted.toSeq == (1 to rs.length))
    }

    // contract holds on the real corpus too: every reported df obeys the
    // gate and every rank agrees with a local re-sort of its doc's rows
    val real = TextAnalysis.tfidfKeywords(spark, sf)
      .as[(Long, Int, String, Long, Long)].collect()
    val nDocs = graft.tables.Tables.documents(spark, sf).count()
    assert(real.nonEmpty && real.forall(r => r._5 * 2 <= nDocs))
    real.groupBy(_._1).foreach { case (_, rs) =>
      val sorted = rs.sortBy(r => (-r._4, r._5, r._3))
      assert(sorted.map(_._2).toSeq == (1 to rs.length),
        s"rank order violated: ${rs.mkString(", ")}")
    }
  }

  test("collocations: lift matches a driver recount, ranking is (lift desc, w1, w2)") {
    val got = TextAnalysis.collocations(spark, sf)
      .as[(Int, String, String, Long, Double)].collect()
    assert(got.length == TextAnalysis.CollocTopK)
    val arrays = graft.tables.Tables.documents(spark, sf)
      .select("text").as[String].collect()
      .map(_.trim.toLowerCase.split("\\s+", -1))
    val uni = arrays.flatten.filter(_.nonEmpty)
      .groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    val nTok = uni.values.sum
    val bi = arrays.flatMap(a => a.indices.dropRight(1).map(i => (a(i), a(i + 1))))
      .filter { case (x, y) => x.nonEmpty && y.nonEmpty }
      .groupBy(identity).map { case (p, g) => p -> g.size.toLong }
    got.foreach { case (_, w1, w2, co, lift) =>
      assert(co == bi((w1, w2)) && co >= TextAnalysis.CollocMinCo)
      assert(lift == co.toDouble * nTok / (uni(w1) * uni(w2)),
        s"lift mismatch for ($w1,$w2)")
    }
    // ranks agree with a local re-sort
    val sorted = got.sortBy { case (_, w1, w2, _, l) => (-l, w1, w2) }
    assert(sorted.map(_._1).toSeq == (1 to got.length))
  }

  test("filter_funnel: stages shrink monotonically and end at the corpus_select count") {
    val funnel = TextAnalysis.filterFunnel(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(funnel.nonEmpty)
    funnel.foreach { case (src, n, dedup, lang, qual) =>
      assert(n >= dedup && dedup >= lang && lang >= qual,
        s"$src: funnel not monotone ($n, $dedup, $lang, $qual)")
    }
    // totals reconcile with the selection the funnel describes
    assert(funnel.map(_._2).sum ==
      graft.tables.Tables.documents(spark, sf).count())
    assert(funnel.map(_._5).sum == TextAnalysis.corpusSelect(spark, sf).count(),
      "final funnel stage must equal the corpus_select survivor count")
  }

  test("ngram_lm_counts: driver recount of counts and continuation types") {
    val rows = TextAnalysis.ngramLmCounts(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= TextAnalysis.KnTopK)
    // rank is 1..k and c3 non-increasing along it
    assert(rows.map(_.getInt(0)).toSeq == (1 to rows.length))
    val c3s = rows.map(_.getLong(4))
    assert(c3s.zip(c3s.tail).forall { case (a, b) => a >= b })
    // independent driver recount over the raw corpus
    val tris = graft.tables.Tables.documents(spark, sf)
      .select("text").collect()
      .flatMap(_.getString(0).trim.toLowerCase.split("\\s+").toSeq
        .filter(_.nonEmpty).sliding(3).filter(_.length == 3).map(_.toList))
    val c3 = tris.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val left = c3.keys.groupBy(t => (t(1), t(2))).map { case (k, v) => k -> v.size.toLong }
    val right = c3.keys.groupBy(t => (t(0), t(1))).map { case (k, v) => k -> v.size.toLong }
    rows.foreach { r =>
      val t = List(r.getString(1), r.getString(2), r.getString(3))
      assert(r.getLong(4) == c3(t), s"c3 mismatch at $t")
      assert(r.getLong(5) == left((t(1), t(2))), s"left_types mismatch at $t")
      assert(r.getLong(6) == right((t(0), t(1))), s"right_types mismatch at $t")
    }
  }
}
