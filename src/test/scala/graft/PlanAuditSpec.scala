package graft

import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, LocalLimit, LogicalPlan, Sort}

/** Fleet-wide plan audit — the scale-discipline invariants every query
  * must keep, checked against the whole SparkEntry surface:
  *
  *  - no CartesianProduct anywhere (an accidental cross join at 100 TB
  *    is a query that never finishes) and BroadcastNestedLoopJoin only
  *    where a nested-loop is the deliberate operator demo;
  *  - a total ORDER BY at the top of every plan (the driver's hash
  *    compare requires a total order — silent nondeterminism here shows
  *    up as a flaky correctness gate rounds later).
  *
  * Queries that execute jobs at DataFrame-build time (table lifecycle,
  * streaming, iterative components, format round-trips) are exercised by
  * their own specs and excluded here to keep the audit fast.
  */
class PlanAuditSpec extends SparkSpec {

  private val buildTimeExecutors = Set(
    "bar_ingest_summary", "bar_timezone_edge", "bar_maintenance_report",
    "bar_history", "bar_external_analytics", "bar_mutations",
    "bar_partition_stats",
    "streaming_daily_counts", "streaming_dedup_counts",
    "streaming_sliding_value", "streaming_sessions",
    "streaming_interval_join", "io_roundtrip", "dedup_clusters",
    "cluster_minsh", "cluster_safe_split", "bucketed_join", "heavy_hitters",
    // these two run a full Structured Streaming build at DF-build time;
    // their batch tails are audited via knn_incremental /
    // dedup_incremental, and DedupSpec pins both lifecycles
    "knn_stream_index", "dedup_stream_admit",
    // standing-postings consumers build/append the postings table at
    // DF-build time (PostingsSpec pins indexed ≡ scratch row-for-row,
    // and the scratch twins ARE audited here); sequence_pack runs its
    // prefix-sum totals pass (collect over O(P) rows) at build time
    // (ChunkingSpec pins stream contiguity + boundary independence)
    "bm25_indexed", "phrase_indexed", "tfidf_indexed", "hybrid_indexed",
    "vocab_growth_indexed", "source_similarity_indexed",
    "collocations_indexed", "ngram_lm_counts_indexed",
    "ngram_novelty_indexed", "sequence_pack")

  // nested-loop is deliberate here: the non-equi side is tiny and
  // broadcast (band/centroid/probe/grid dimensions)
  private val bnljAllowed = Set("range_band_join", "funnel_steps",
    "cosine_dups", "knn_brute", "sql_scalar_subquery", "knn_ivf",
    "gap_fill_hourly", "q22_global_sales", "knn_pq", "semantic_dedup",
    "tfidf_keywords", // n_docs is a one-row broadcast scalar
    "hybrid_rrf", // query vectors: fixed handful, broadcast, =!= self
    "knn_incremental", // probe × broadcast(√n stored centroids)
    "bm25_rank", // n_docs/total_words: one-row broadcast scalars
    "profile_orders", // r16 narrow census: per-column distinct counts
                      // (#cols rows) × ONE broadcast metrics row
    "collocations", // n_tok: one-row broadcast scalar (r12, replaced
                    // the eager driver-side count's extra corpus pass)
    "q11_important_parts") // share threshold: one-row broadcast scalar

  // global aggregates: one output row, total order is vacuous
  private val singleRow = Set("count_rows", "date_bounds", "distinct_types",
    "q17_small_quantity", "q19_disjunctive")

  private def audited = SparkEntry.queries.keys.toSeq.sorted
    .filterNot(buildTimeExecutors)

  private def hasTopSort(plan: LogicalPlan): Boolean = plan match {
    case _: Sort => true
    case GlobalLimit(_, child) => hasTopSort(child)
    case LocalLimit(_, child) => hasTopSort(child)
    case w: org.apache.spark.sql.catalyst.plans.logical.WithCTE =>
      hasTopSort(w.plan)
    // only Project/SubqueryAlias preserve ordering; Deduplicate (distinct)
    // shuffles and would silently destroy a sort beneath it
    case p if p.children.size == 1 &&
      p.nodeName.matches("Project|SubqueryAlias") =>
      hasTopSort(p.children.head)
    case _ => false
  }

  test("no cartesian products; nested-loop joins only where intended") {
    val offenders = audited.flatMap { name =>
      val plan = SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan.toString
      val cartesian = plan.contains("CartesianProduct") &&
        name != "cross_join_matrix"
      val bnlj = plan.contains("BroadcastNestedLoopJoin") &&
        !bnljAllowed(name) && name != "cross_join_matrix"
      if (cartesian || bnlj) Some(name) else None
    }
    assert(offenders.isEmpty, s"unplanned cartesian/nested-loop in: $offenders")
  }

  test("no token-keyed window census anywhere in the fleet (Zipf hot-key defense)") {
    // a census must be a partial-agg groupBy (joined back), never a
    // window PARTITIONED BY a token- or content-grain key: a stopword's
    // window partition is every posting of "the", and a 10⁴×-duplicated
    // template's norm_text partition is every copy — each serialized
    // through ONE WindowExec task that AQE cannot skew-split. The
    // banned names are exactly the corpus-token / n-gram-component /
    // normalized-content columns this repo censuses over; doc-scoped
    // windows (partition includes doc_id) and bounded-key windows
    // (query_id, lang, source, …) are fine.
    val tokenKeys = Set("word", "w1", "w2", "w3", "norm_text")
    val offenders = audited.flatMap { name =>
      val plan = SparkEntry.queries(name)(spark, sf)
        .queryExecution.optimizedPlan
      val bad = plan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
            if w.partitionSpec.exists(_.references.exists(a =>
              tokenKeys(a.name))) => w
      }
      if (bad.nonEmpty) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"token-keyed window census in: $offenders")
  }

  test("every audited query ends in a total ORDER BY") {
    val unordered = audited.filterNot(singleRow).filterNot { name =>
      hasTopSort(SparkEntry.queries(name)(spark, sf)
        .queryExecution.analyzed)
    }
    assert(unordered.isEmpty, s"queries without a top-level sort: $unordered")
  }
}
