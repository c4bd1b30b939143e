package graft

import org.apache.spark.sql.functions._
import graft.text.QualityFilters

class QualityFiltersSpec extends SparkSpec {
  import spark.implicits._

  test("gopher stats match a driver-side recount on sampled docs") {
    val docs = graft.tables.Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect().take(10)
    val got = QualityFilters.gopherQuality(spark, sf)
      .filter(col("doc_id") < 10)
      .select("doc_id", "n_words", "n_distinct", "top_word_n", "sum_word_len")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    docs.foreach { case (id, text) =>
      val ws = text.trim.split("\\s+").filter(_.nonEmpty)
      val counts = ws.groupBy(identity).view.mapValues(_.length)
      val expect = (ws.length.toLong, counts.size.toLong,
        counts.values.max.toLong, ws.map(_.length.toLong).sum)
      assert(got(id) == expect, s"doc $id")
    }
  }

  test("block_dedup matches a driver-side recomputation over the whole corpus") {
    val got = QualityFilters.blockDedup(spark, sf)
      .select("doc_id", "n_blocks", "n_shared_blocks")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    // reference: blocks per doc, shared = block string present in >1 doc
    val docs = graft.tables.Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect()
    val blocksPerDoc = docs.map { case (id, text) =>
      val ws = text.trim.split("\\s+").filter(_.nonEmpty)
      id -> ws.grouped(QualityFilters.BlockWords).filter(_.length == QualityFilters.BlockWords)
        .map(_.mkString(" ")).toSeq
    }.toMap
    val docCount = blocksPerDoc.toSeq.flatMap { case (id, bs) => bs.distinct.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
    blocksPerDoc.foreach { case (id, bs) =>
      if (bs.isEmpty) assert(!got.contains(id)) // short docs have no block rows
      else {
        val shared = bs.count(b => docCount(b) > 1).toLong
        assert(got(id) == (bs.length.toLong, shared), s"doc $id")
      }
    }
    // the corpus actually exercises the sharing path
    assert(blocksPerDoc.values.flatten.exists(b => docCount(b) > 1) ==
      got.values.exists(_._2 > 0))
  }

  test("intra_dedup matches a driver-side first-occurrence reconstruction") {
    import graft.text.QualityFilters
    val got = QualityFilters.intraDedup(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))))
      .toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String): String = {
      md.reset()
      md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map(b => f"$b%02x").mkString
    }
    val bw = QualityFilters.IntraBlockWords
    graft.tables.Tables.documents(spark, sf)
      .select("doc_id", "text").collect().foreach { r =>
        val (id, text) = (r.getLong(0), r.getString(1))
        val w = text.trim.split("\\s+")
        val blocks = (0 until w.length / bw)
          .map(i => w.slice(i * bw, (i + 1) * bw).mkString(" "))
        if (blocks.isEmpty) assert(!got.contains(id), s"doc $id should be absent")
        else {
          val kept = blocks.zipWithIndex.groupBy(_._1)
            .map { case (b, occ) => b -> occ.map(_._2).min }
            .toSeq.sortBy(_._2).map(_._1)
          val (nBlocks, nKept, nDup, cleanMd5) = got(id)
          assert(nBlocks == blocks.size, s"doc $id n_blocks")
          assert(nKept == kept.size, s"doc $id n_kept")
          assert(nDup == blocks.size - kept.size, s"doc $id n_dup")
          assert(cleanMd5 == md5hex(kept.mkString(" ")), s"doc $id clean_md5")
        }
      }
  }

  test("lm_typicality: driver recount on sampled docs; census joins broadcast") {
    // recompute the trigram census + per-doc scores driver-side and
    // compare a sample exactly (integer stats; doubles are single exact
    // long/long divisions)
    val docs = graft.tables.Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect()
    val census = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    def grams(t: String) = (0 to t.length - 3).map(i => t.substring(i, i + 3))
    docs.foreach { case (_, t) => grams(t).foreach(g => census(g) += 1) }
    val df = QualityFilters.lmTypicality(spark, sf)
    val got = df.select("doc_id", "n_trigrams", "avg_tg_freq", "rare_frac")
      .as[(Long, Long, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    docs.take(10).foreach { case (id, t) =>
      val gs = grams(t)
      if (gs.nonEmpty) {
        val sumFreq = gs.map(census).sum
        val nRare = gs.count(g => census(g) <= QualityFilters.RareThreshold)
        val expect = (gs.length.toLong,
          sumFreq.toDouble / gs.length, nRare.toDouble / gs.length)
        assert(got(id) == expect, s"doc $id: got ${got(id)}, expect $expect")
      }
    }
    // the model (trigram census) must broadcast — pass 2 is a broadcast
    // join, never a full shuffle of the exploded trigram stream
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"census must broadcast-join:\n$plan")
  }

  test("dsir_contrast: driver recount; target docs score high, censuses broadcast") {
    val docs = graft.tables.Tables.documents(spark, sf)
      .select("doc_id", "source", "text").as[(Long, String, String)].collect()
    def grams(t: String) = (0 to t.length - 3).map(i => t.substring(i, i + 3))
    val corpus = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    val target = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    docs.foreach { case (_, s, t) =>
      grams(t).foreach { g =>
        corpus(g) += 1
        if (s == QualityFilters.ContrastTarget) target(g) += 1
      }
    }
    val df = QualityFilters.dsirContrast(spark, sf)
    val got = df.select("doc_id", "n_trigrams", "target_hits", "corpus_hits")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    docs.foreach { case (id, _, t) =>
      val gs = grams(t)
      if (gs.nonEmpty)
        assert(got(id) == (gs.length.toLong, gs.map(target).sum,
          gs.map(corpus).sum), s"doc $id")
    }
    // the signal separates: target-source docs average a higher contrast
    // than the rest (they ARE the target distribution)
    val bySrc = df.join(
        graft.tables.Tables.documents(spark, sf).select("doc_id", "source"),
        "doc_id")
      .groupBy(col("source") === QualityFilters.ContrastTarget)
      .agg(avg("contrast").as("c")).collect()
      .map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(bySrc(true) > bySrc(false),
      s"target avg ${bySrc(true)} !> rest ${bySrc(false)}")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "censuses must broadcast")
  }

  test("typicality_buckets: thirds per source, score-monotone, totals conserved") {
    val df = QualityFilters.typicalityBuckets(spark, sf).cache()
    val rows = df.collect()
    val bySource = rows.groupBy(_.getString(0))
    val docCounts = graft.tables.Tables.documents(spark, sf)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    bySource.foreach { case (src, bs) =>
      assert(bs.map(_.getInt(1)).sorted.toSeq == Seq(1, 2, 3), src)
      // NTILE thirds: sizes differ by at most 1, total = source doc count
      val sizes = bs.sortBy(_.getInt(1)).map(_.getLong(2))
      assert(sizes.sum == docCounts(src), src)
      assert(sizes.max - sizes.min <= 1, s"$src sizes ${sizes.toSeq}")
      // head ≥ middle ≥ tail on the score boundaries
      val byB = bs.map(r => r.getInt(1) -> r).toMap
      assert(byB(1).getDouble(7) >= byB(2).getDouble(6), src) // min(head) >= max(mid)
      assert(byB(2).getDouble(7) >= byB(3).getDouble(6), src) // min(mid) >= max(tail)
    }
    // trigram totals conserved vs the per-doc typicality table
    val totalTg = QualityFilters.lmTypicality(spark, sf)
      .agg(sum("n_trigrams")).collect()(0).getLong(0)
    assert(rows.map(_.getLong(3)).sum == totalTg)
  }

  test("source_mixture: quotas respected, ~half the corpus kept, deterministic") {
    val df = QualityFilters.sourceMixture(spark, sf).cache()
    // per-source: exactly quota rows, ranks are 1..quota
    val bad = df.groupBy("source", "quota")
      .agg(count(lit(1)).as("kept"), max("rk").as("maxrk"))
      .filter(col("kept") =!= col("quota") || col("maxrk") =!= col("quota"))
    assert(bad.count() == 0)
    val total = graft.tables.Tables.documents(spark, sf).count()
    val kept = df.count()
    assert(math.abs(kept - total * QualityFilters.MixtureFraction) <= total * 0.1,
      s"kept $kept of $total")
    // sqrt-temperature flattens: smallest source keeps a larger fraction
    val fracs = df.groupBy("source").agg(
        (count(lit(1)).cast("double") / first("source_docs")).as("f"),
        first("source_docs").as("n"))
      .orderBy("n").select("f").as[Double].collect()
    assert(fracs.head >= fracs.last)
    // identical output on a second run (no RNG anywhere)
    val again = QualityFilters.sourceMixture(spark, sf)
    assert(df.exceptAll(again).count() == 0 && again.exceptAll(df).count() == 0)
  }

  test("source_similarity: set algebra holds; one driver pair recounted") {
    val rows = QualityFilters.sourceSimilarity(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val (shared, va, vb) = (r.getLong(2), r.getLong(3), r.getLong(4))
      val j = r.getDouble(5)
      assert(a < b, "unordered pair emitted once, a < b")
      assert(shared >= 1 && shared <= math.min(va, vb))
      assert(j > 0.0 && j <= 1.0)
      assert(j == shared.toDouble / (va + vb - shared).toDouble)
    }
    // independent driver recount of the lexicographically first pair
    val docs = graft.tables.Tables.documents(spark, sf)
    def vocab(src: String): Set[String] = docs
      .filter(org.apache.spark.sql.functions.col("source") === src)
      .select("text").collect()
      .flatMap(_.getString(0).trim.toLowerCase.split("\\s+")).toSet - ""
    val first = rows.head
    val (va, vb) = (vocab(first.getString(0)), vocab(first.getString(1)))
    assert(first.getLong(2) == va.intersect(vb).size.toLong)
    assert(first.getLong(3) == va.size.toLong && first.getLong(4) == vb.size.toLong)
  }

  test("dup_rate_report: planted duplicates produce exact rates") {
    import spark.implicits._
    // the sf fixture has a true zero doc-dup baseline (dedup_exact: 500
    // groups of 1), so plant a corpus where both tiers are non-trivial
    val dir = graft.GraftTmp.dir("dup_rate").toString
    val body = (1 to 45).map(i => s"w$i").mkString(" ") // 45 words: 2 blocks
    Seq(
      (1L, body, "en", "a", body.length.toLong),
      (2L, body, "en", "a", body.length.toLong),           // exact dup of 1
      (3L, body.replace(" ", " \t "), "en", "b", 0L), // ws-normalized dup
      (4L, "totally different text " + ("x " * 40).trim, "en", "b", 0L),
      (5L, "short", "en", "b", 5L))                         // no blocks
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = QualityFilters.dupRateReport(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    // source a: doc 2 is redundant (doc 1 canonical) → 1/2
    assert(out("a").getLong(2) == 1L && out("a").getDouble(3) == 0.5)
    // source b: doc 3 duplicates doc 1 ACROSS sources → counted here
    assert(out("b").getLong(2) == 1L)
    // block tier: docs 1-3 share both 20-word blocks; doc 4's 2 blocks
    // and doc 5 (no blocks) are unique → a: 4/4 shared, b: 2/4
    assert(out("a").getLong(4) == 4L && out("a").getLong(5) == 4L)
    assert(out("b").getLong(4) == 4L && out("b").getLong(5) == 2L)
    assert(out("b").getDouble(6) == 0.5)
  }

  test("vocab_growth: census identities per source") {
    val rows = QualityFilters.vocabGrowth(spark, sf).collect()
    val nSources = graft.tables.Tables.documents(spark, sf)
      .select("source").distinct().count()
    assert(rows.length == nSources)
    rows.foreach { r =>
      val (tokens, types, hapax) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(1L <= hapax || hapax == 0L)
      assert(hapax <= types && types <= tokens)
      assert(r.getDouble(5) == types.toDouble / tokens.toDouble)
      assert(r.getDouble(6) == hapax.toDouble / types.toDouble)
    }
  }
}
