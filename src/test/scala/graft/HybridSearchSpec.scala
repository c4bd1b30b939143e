package graft

import org.apache.spark.sql.functions._
import graft.similarity.HybridSearch

/** Pins `hybrid_rrf`: RRF fusion math against a driver-side replay,
  * list-window semantics, and the plan shape (both per-query sides —
  * query vectors and query terms — broadcast, never shuffled with the
  * corpus). */
class HybridSearchSpec extends SparkSpec {

  private lazy val result = HybridSearch.hybridRrf(spark, sf).collect()

  test("shape: TopK rows per query, ranks dense from 1, no self-match") {
    val byQuery = result.groupBy(_.getLong(0))
    assert(byQuery.keySet == (0L until HybridSearch.HQ).toSet)
    byQuery.foreach { case (q, rows) =>
      assert(rows.length == HybridSearch.TopK)
      assert(rows.map(_.getInt(1)).sorted.toSeq == (1 to HybridSearch.TopK))
      assert(!rows.exists(_.getLong(2) == q), s"query $q retrieved itself")
    }
  }

  test("rrf ordering matches a driver-side replay of the fusion") {
    // rebuild both full lists driver-side, fuse, and compare the top-K
    val emb = graft.tables.Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      BigDecimal(d / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val words = graft.tables.Tables.documents(spark, sf)
      .select(col("doc_id"), lower(trim(col("text"))).as("t")).collect()
      .map(r => r.getLong(0) ->
        r.getString(1).split("\\s+").filter(_.nonEmpty).toSet).toMap
    val expected = (0L until HybridSearch.HQ).flatMap { q =>
      val vecRank = emb.keys.filter(_ != q).toSeq
        .map(d => d -> cos(emb(q), emb(d)))
        .sortBy { case (d, c) => (-c, d) }
        .zipWithIndex.map { case ((d, _), i) => d -> (i + 1) }
        .filter(_._2 <= HybridSearch.ListN).toMap
      val kwRank = words.keys.filter(_ != q).toSeq
        .map(d => d -> (words(q) & words(d)).size)
        .filter(_._2 > 0)
        .sortBy { case (d, s) => (-s, d) }
        .zipWithIndex.map { case ((d, _), i) => d -> (i + 1) }
        .filter(_._2 <= HybridSearch.ListN).toMap
      val cands = (vecRank.keySet ++ kwRank.keySet).toSeq
      val fused = cands.map { d =>
        val s = vecRank.get(d).map(r => 1.0 / (HybridSearch.RrfK + r)).getOrElse(0.0) +
          kwRank.get(d).map(r => 1.0 / (HybridSearch.RrfK + r)).getOrElse(0.0)
        (d, s)
      }.sortBy { case (d, s) => (-s, d) }.take(HybridSearch.TopK)
      fused.zipWithIndex.map { case ((d, _), i) => (q, i + 1, d) }
    }.toSet
    val got = result.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == expected)
  }

  test("emitted list ranks are consistent with membership") {
    result.foreach { r =>
      val rv = if (r.isNullAt(3)) None else Some(r.getInt(3))
      val rk = if (r.isNullAt(4)) None else Some(r.getInt(4))
      assert(rv.nonEmpty || rk.nonEmpty, "fused row in neither list")
      rv.foreach(v => assert(v >= 1 && v <= HybridSearch.ListN))
      rk.foreach(v => assert(v >= 1 && v <= HybridSearch.ListN))
    }
  }

  test("bm25_rank matches a full driver-side replay with identical double ops") {
    import spark.implicits._
    val docs = graft.tables.Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect()
    val toks = docs.map { case (id, t) =>
      id -> t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    }.toMap
    val tf: Map[(Long, String), Long] = toks.toSeq
      .flatMap { case (id, ws) => ws.map(w => (id, w)) }
      .groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    val df: Map[String, Long] = tf.keys.toSeq.groupBy(_._2)
      .map { case (w, g) => w -> g.size.toLong }
    val dl: Map[Long, Long] = toks.map { case (id, ws) => id -> ws.size.toLong }
    val nDocs = docs.length.toLong
    val totalWords = dl.values.sum
    val avgdl = totalWords.toDouble / nDocs
    val k1p1 = HybridSearch.Bm25K1 + 1.0
    def score(q: Long, d: Long): Double =
      toks(q).distinct.sorted.foldLeft(0.0) { (acc, w) =>
        tf.get((d, w)).fold(acc) { t =>
          acc + ((nDocs - df(w) + 0.5) / (df(w) + 0.5)) * (t * k1p1) /
            (t + HybridSearch.Bm25K1 * ((1.0 - HybridSearch.Bm25B) +
              HybridSearch.Bm25B * dl(d) / avgdl))
        }
      }
    val got = HybridSearch.bm25Rank(spark, sf)
      .as[(Long, Int, Long, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (q, _, d, s) =>
      assert(score(q, d) == s, s"bitwise mismatch for ($q,$d)")
    }
    // ranks agree with a full re-rank over ALL candidate docs
    got.groupBy(_._1).foreach { case (q, rows) =>
      val all = docs.map(_._1).filter(_ != q)
        .map(d => (d, score(q, d))).filter(_._2 > 0.0)
        .sortBy { case (d, s) => (-s, d) }.take(HybridSearch.TopK)
      assert(rows.sortBy(_._2).map(_._3).toSeq == all.map(_._1).toSeq,
        s"rank order differs for query $q")
    }
  }

  test("phrase_search: positional-index join equals a driver scan count") {
    import spark.implicits._
    val got = HybridSearch.phraseSearch(spark, sf)
      .as[(String, Long, Long)].collect()
    assert(got.nonEmpty)
    val docs = graft.tables.Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect()
    val expected = (for {
      (id, t) <- docs
      a = t.trim.toLowerCase.split("\\s+", -1)
      p <- HybridSearch.Phrases
      Array(w1, w2) = p.split(" ", 2)
      n = (0 until a.length - 1).count(i => a(i) == w1 && a(i + 1) == w2)
      if n > 0
    } yield (p, id, n.toLong)).toSet
    assert(got.toSet == expected,
      s"diff: ${(got.toSet diff expected).take(3)} / ${(expected diff got.toSet).take(3)}")
    // positional match is an EQUI join on (doc, word, pos+1): no
    // cartesian and no nested-loop beyond the broadcast term filters
    val plan = HybridSearch.phraseSearch(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(1500))
  }

  test("plan: both query-side inputs broadcast, corpus never cartesian") {
    val plan =
      HybridSearch.hybridRrf(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"),
      "expected the query-vector and query-term sides to broadcast")
    assert(!plan.contains("CartesianProduct"))
  }
}
