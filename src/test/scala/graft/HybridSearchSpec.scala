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

  test("plan: both query-side inputs broadcast, corpus never cartesian") {
    val plan =
      HybridSearch.hybridRrf(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"),
      "expected the query-vector and query-term sides to broadcast")
    assert(!plan.contains("CartesianProduct"))
  }
}
