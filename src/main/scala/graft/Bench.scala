package graft

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Benchmark main — emits the artifact JSON line with total + per-query
  * seconds on the sf dir from SPARK_GRAFT_SF_DIR (driver contract).
  * Runs the headline query set (the scan/agg/join/window/dedup/
  * similarity surface), then the optional sections (lifecycle, indexed
  * twins, scale decades, skew fixtures) under a wall-clock budget
  * guard, RE-EMITTING the full line after each section — the final
  * line carries partial:false; a killed run's last line is still a
  * complete parseable artifact (r13: r12's single end-of-run emission
  * left rc 124 / parsed null). The table-lifecycle (bar_*) and
  * streaming queries are excluded from the headline — they benchmark
  * temp-dir writes and memory-sink latency rather than engine
  * throughput, and Verify covers their correctness per round.
  */
object Bench {

  /** Headline queries: every pack represented, no temp-table writers.
    * This is the r1–r4 set — kept separate so cross-round totals stay
    * comparable after the r5 extension below. */
  val HeadlineR4: Seq[String] = Seq(
    "daily_summary", "topk_by_value", "filter_project", "pricing_summary",
    "derive_time", "json_extract_agg",
    "orders_by_segment", "top_unshipped_orders", "late_priority_count",
    "revenue_by_nation", "lineitem_by_priority", "part_type_stats",
    "running_totals", "moving_avg", "top3_per_type", "asof_purchase_view",
    "setops_users", "rollup_counts", "cube_quantity", "pivot_counts",
    "text_stats", "token_count", "quality_score", "trigram_topk",
    "doc_fingerprint", "dedup_exact", "dedup_minhash", "dedup_simhash",
    "knn_brute", "knn_lsh", "knn_ivf", "media_features",
    "sessionize", "range_band_join", "percentiles")

  /** r5 additions: the heavy newer operators, so regressions in them are
    * visible round over round — plus the r5 safety pack (pii_scrub,
    * decontaminate: regex scrub and gram-collision join over documents). */
  val HeadlineR5Added: Seq[String] = Seq(
    "knn_pq", "cluster_minsh", "retention_cohorts",
    "q21_waiting_supplier", "corpus_select",
    "pii_scrub", "decontaminate")

  /** r7 addition: SemDeDup-style embedding dedup (cell-bounded
    * quadratic — the heaviest similarity shape). */
  val HeadlineR7Added: Seq[String] = Seq("semantic_dedup")

  /** r9 additions: exact substring (token-window) dedup — a full
    * explode-shuffle-window pass over every document's token windows —
    * and the two-pass corpus-LM typicality score (census + broadcast
    * rescore). */
  val HeadlineR9Added: Seq[String] = Seq("dedup_substring", "lm_typicality",
    "tfidf_keywords", "source_overlap",
    // Gopher dup-n-gram signals (3-sort window stack over one shuffle)
    // and hashed-linear classifier inference (broadcast weight join)
    "gopher_repetition", "quality_classifier",
    // DSIR contrast (two broadcast censuses), cluster+quality argmax,
    // and the one-scan Expand profile — each with an sf1 scale point
    "dsir_contrast", "canonical_selection", "profile_orders")

  /** r10 additions: the approx (HLL) profile — the 100 TB profile path,
    * benched alongside the exact mode to keep the constant visible —
    * hybrid lexical+vector retrieval with RRF fusion, and the CCNet
    * head/middle/tail typicality split. (The incremental ops —
    * dedup_incremental, knn_incremental — stay out of the bench by
    * design: their standing tables make run N's cost depend on run
    * N-1's state, which would corrupt the min-of-N ratio flags.) */
  val HeadlineR10Added: Seq[String] =
    Seq("profile_orders_approx", "hybrid_rrf", "typicality_buckets",
      "containment_dedup",
      // kNN label propagation: capped-seed kernel map, linear by
      // construction. (knn_stream_index joins knn_incremental /
      // dedup_incremental outside the bench: standing index tables
      // make run N's cost depend on run N-1's state.)
      "knn_classify",
      // BM25 more-like-this (inverted-index join, broadcast query
      // terms) and edit-distance verification over star candidates
      "bm25_rank", "edit_dedup", "filter_funnel", "phrase_search",
      // iterative graph analytics (5 PageRank rounds, checkpointed)
      "pagerank_dups", "collocations",
      // late-r10 TPC-H classics — the three heaviest of the nine new
      // shapes (5-table profit join, outer-join distribution, argmin
      // window) — plus the two vocabulary-census corpus-health ops
      "q9_product_profit", "q13_order_distribution",
      "q2_min_cost_supplier", "source_similarity", "vocab_growth",
      // corpus topic distribution over the IVF quantizer (per-row
      // assignment kernel + one sqrt(n)-cell aggregate)
      "topic_profile",
      // Kneser-Ney census: the word-trigram distinct + two window
      // passes — the heaviest pure-text census shape
      "ngram_lm_counts")

  /** r11 addition: the blocking-skew telemetry census (two partial-agg
    * rollups over the min-shingle key space). The standing-table
    * lexical ops (the `*_indexed` twins) stay out of the HEADLINE set —
    * run N's cost would depend on run N-1's postings state — and are
    * benched instead in the dedicated [[indexedBench]] section, where
    * the postings build is pinned outside the timed window. */
  val HeadlineR11Added: Seq[String] = Seq("block_stats",
    // trigram first-occurrence census (skew-safe groupBy + join back)
    "ngram_novelty")

  val Headline: Seq[String] =
    HeadlineR4 ++ HeadlineR5Added ++ HeadlineR7Added ++ HeadlineR9Added ++
      HeadlineR10Added ++ HeadlineR11Added

  /** Headline measurements per query (r12): the artifact records each
    * query's MIN over this many back-to-back runs — single-run numbers
    * cannot distinguish a 1.5× regression from one GC pause (the four
    * r11 runs spanned 74-118 s total on identical code). */
  val RunsPerQuery = 2

  /** Cross-run load guard threshold (r15): the run is flagged (and
    * once re-run) when the MEDIAN per-query inflation vs the session's
    * best prior final run exceeds this. 1.25 sits above observed
    * same-code run spread (r13's four runs spanned 1.25× total; r14's
    * two clean runs were within 1.01×) and below the load events the
    * guard exists for (r14's shipped worst run: 1.39× uniform). */
  val LoadGuardMedian = 1.25

  /** One prior FINAL bench line (partial:false, with a per-query map).
    * `setHash`/`code` are absent on pre-r16 lines — consumers treat
    * absence as "unknown" and note, never refuse outright (refusing
    * would disable the guard for exactly one round after every
    * artifact-format change). */
  private[graft] final case class PriorRun(runId: Long, total: Double,
      queries: Map[String, Double], setHash: Option[String] = None,
      code: Option[String] = None)

  private val RunIdRe = """"run_id":(\d+)""".r
  private val PairRe =
    """"([A-Za-z0-9_]+)":(-?[0-9.]+(?:[eE][+-]?[0-9]+)?)""".r
  private val SetHashRe = """"query_set_hash":"([0-9a-f]+)"""".r
  private val CodeRe = """"code":"([^"]+)"""".r

  /** Raw FINAL artifact lines for `sf` from the durable jsonl trail.
    * Regex/scan-parsed on purpose: the lines are this file's own
    * single-line emissions. */
  private def finalLines(logPath: String, sf: String): Seq[String] = {
    val f = new java.io.File(logPath)
    if (!f.isFile) return Nil
    val SfRe = """"sf":"([^"]+)"""".r
    // explicit UTF-8 with replacement: the log carries UTF-8 note text
    // (×, →) and the JVM default charset under a C locale is ASCII —
    // Source.fromFile with the default codec threw MalformedInput and,
    // uncaught, would kill the run before its first artifact emission
    val codec = scala.io.Codec.UTF8
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPLACE)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPLACE)
    val src = scala.io.Source.fromFile(f)(codec)
    try src.getLines().toSeq.filter { line =>
      line.contains("\"partial\":false") &&
        !line.contains("\"compact\":true") &&
        SfRe.findFirstMatchIn(line).exists(_.group(1) == sf)
    } finally src.close()
  }

  /** Prior final runs for `sf` — newest code may have added/removed
    * queries, so consumers compare over the common-query intersection
    * only (and check the recorded set hash / code fingerprint when
    * present). */
  private[graft] def priorFinalRuns(logPath: String, sf: String)
      : Seq[PriorRun] = {
    val ValueRe = """"value":(-?[0-9.]+(?:[eE][+-]?[0-9]+)?)""".r
    val QueriesRe = """"queries":\{([^}]*)\}""".r
    finalLines(logPath, sf).flatMap { line =>
      for {
        id <- RunIdRe.findFirstMatchIn(line).map(_.group(1).toLong)
        tot <- ValueRe.findFirstMatchIn(line).map(_.group(1).toDouble)
        qm <- QueriesRe.findFirstMatchIn(line).map(_.group(1))
      } yield PriorRun(id, tot,
        PairRe.findAllMatchIn(qm)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap,
        SetHashRe.findFirstMatchIn(line).map(_.group(1)),
        CodeRe.findFirstMatchIn(line).map(_.group(1)))
    }
  }

  /** First balanced `{…}` object following `"key":` in a raw artifact
    * line — string-aware brace matching, because section payloads nest
    * objects (pre_state, noise_band, flag_notes) that the headline
    * map's flat `[^}]*` regex cannot span. */
  private[graft] def jsonObjectAfter(text: String, key: String)
      : Option[String] = {
    val tag = "\"" + key + "\":{"
    val i = text.indexOf(tag)
    if (i < 0) return None
    val start = i + tag.length - 1
    var depth = 0
    var j = start
    var inStr = false
    var escd = false
    while (j < text.length) {
      val c = text.charAt(j)
      if (inStr) {
        if (escd) escd = false
        else if (c == '\\') escd = true
        else if (c == '"') inStr = false
      } else c match {
        case '"' => inStr = true
        case '{' => depth += 1
        case '}' =>
          depth -= 1
          if (depth == 0) return Some(text.substring(start, j + 1))
        case _ => ()
      }
      j += 1
    }
    None
  }

  /** One prior final run's SECTION payload: the flat numeric map under
    * `mapKey` inside section `sectionKey`, plus the line's run id and
    * code fingerprint. */
  private[graft] def priorSectionRuns(logPath: String, sf: String,
      sectionKey: String, mapKey: String)
      : Seq[(Long, Option[String], Map[String, Double])] =
    finalLines(logPath, sf).flatMap { line =>
      for {
        id <- RunIdRe.findFirstMatchIn(line).map(_.group(1).toLong)
        sec <- jsonObjectAfter(line, sectionKey)
        mj <- jsonObjectAfter(sec, mapKey)
      } yield (id, CodeRe.findFirstMatchIn(line).map(_.group(1)),
        PairRe.findAllMatchIn(mj)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap)
    }.filter(_._3.nonEmpty)

  /** Per-key inflation of `cur` vs `prior` over common keys (both
    * sides > 50 ms — sub-that is scheduling noise): (median,
    * fraction above 1.15, per-key sorted worst-first). */
  private[graft] def inflationStats(cur: Map[String, Double],
      prior: Map[String, Double])
      : (Double, Double, Seq[(String, Double)]) = {
    val common = cur.toSeq.collect {
      case (k, v) if v > 0.05 && prior.get(k).exists(_ > 0.05) =>
        (k, v / prior(k))
    }
    if (common.isEmpty) (1.0, 0.0, Nil)
    else {
      val rs = common.map(_._2).sorted
      (rs(rs.size / 2),
        common.count(_._2 > 1.15).toDouble / common.size,
        common.sortBy(-_._2))
    }
  }

  /** Guard candidate-pool policy (r16, verdict #3 + ADVICE), shared by
    * the headline guard: same-query-set priors first (an absent hash —
    * every pre-r16 line — is treated as potentially-same, never
    * refused), same-code within those when any exist, then best
    * (lowest total) of the pool. Mismatches are the CALLER's job to
    * note in the flag JSON; this only chooses. */
  private[graft] def preferredPrior(all: Seq[PriorRun], qsHash: String,
      code: String): Option[PriorRun] = {
    val sameSet = all.filter(_.setHash.forall(_ == qsHash))
    val sameCode = sameSet.filter(_.code.contains(code))
    val pool =
      if (sameCode.nonEmpty) sameCode
      else if (sameSet.nonEmpty) sameSet
      else all
    pool.sortBy(_.total).headOption
  }

  /** md5-derived short hash of a query-name set: the artifact's
    * self-description of WHICH queries its per-query map covers, so a
    * guard comparison against a different set is detected instead of
    * silently intersecting keys (r16, verdict #3). */
  private[graft] def querySetHash(names: Seq[String]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(names.sorted.mkString(",").getBytes("UTF-8"))
    md.digest().map(b => f"$b%02x").mkString.take(12)
  }

  /** Code fingerprint stamped into each artifact line (r16, ADVICE):
    * the load guard prefers prior runs of the SAME code, so a
    * legitimate change that uniformly slows the suite trips the guard
    * at most once (the first run of the new code, against the old
    * code's best) instead of paying a re-run + misattributed load_flag
    * on every subsequent run. Keyed to the `src/main` TREE object, not
    * HEAD: only a change to shipped source re-fingerprints — doc /
    * test / artifact commits (most commits in a round) leave the
    * same-code pool intact. `-dirty` marks uncommitted source edits. */
  private[graft] lazy val codeFingerprint: String =
    try {
      def git(args: String*): Option[String] = {
        val p = new ProcessBuilder(("git" +: args): _*)
          .redirectErrorStream(true).start()
        val out = new String(p.getInputStream.readAllBytes(), "UTF-8").trim
        if (p.waitFor() == 0) Some(out) else None
      }
      val tree = git("rev-parse", "HEAD:src/main")
        .filter(_.matches("[0-9a-f]{6,64}")).map(_.take(12))
      val dirty = git("status", "--porcelain", "src/main")
        .exists(_.nonEmpty)
      tree.map(t => if (dirty) t + "-dirty" else t).getOrElse("unknown")
    } catch { case _: Throwable => "unknown" }

  /** Min-merge a re-run into first-pass measurements: valid samples
    * min (standard best-of-N), but a failure on either side never
    * erases the other side's real measurement. */
  private def minMerge(a: Map[String, Double], b: Map[String, Double])
      : Map[String, Double] =
    a.map { case (k, v) =>
      val w = b.getOrElse(k, v)
      k -> (if (v < 0 || w < 0) math.max(v, w) else math.min(v, w))
    }

  /** Cross-run load guard at SECTION grain (r16, verdict #1): the
    * headline guard defends the headline set, but the scale evidence
    * ships in the sections — r15's artifact carried sf10
    * profile_orders at 106.5 s vs a 60.9 s prior best on untouched
    * code with `flagged: []`. Compares the section's per-op seconds to
    * the best prior same-sf section (same code preferred), re-runs
    * once when the median inflation exceeds [[LoadGuardMedian]] and
    * the budget affords it, and emits the section's `load_flag` JSON
    * fragment ("null" when clean). Returns (possibly min-merged map,
    * flag fragment). Failures degrade to a recorded guard_error —
    * never a dead section. */
  private[graft] def sectionLoadGuard(sectionKey: String, mapKey: String,
      logPath: String, sf: String, cur0: Map[String, Double],
      rerun: Option[() => Map[String, Double]])
      : (Map[String, Double], String) =
    try {
      val priors = priorSectionRuns(logPath, sf, sectionKey, mapKey)
        .map { case (id, code, m) => (id, code, m.filter(_._2 > 0)) }
        .filter(_._3.nonEmpty)
      if (priors.isEmpty) return (cur0, "null")
      val sameCode = priors.filter(_._2.contains(codeFingerprint))
      val pool = if (sameCode.nonEmpty) sameCode else priors
      val (pid, pcode, pmap) = pool.minBy(_._3.values.sum)
      val codeMismatch = !pcode.contains(codeFingerprint)
      val (med0, _, _) = inflationStats(cur0, pmap)
      var cur = cur0
      var reRan = false
      if (med0 > LoadGuardMedian && rerun.nonEmpty &&
          reMeasureFits(cur0.values.filter(_ > 0).sum * 1.2)) {
        System.err.println(s"[bench] $sectionKey load guard: median " +
          s"inflation ${num(med0)} vs run $pid — re-running section once")
        reRan = true
        cur = minMerge(cur, rerun.get.apply())
      }
      val (med, frac, perQ) = inflationStats(cur, pmap)
      val flag =
        if (med > LoadGuardMedian) {
          val top = perQ.take(8)
            .map { case (k, r) => "\"" + k + "\":" + num(r) }
            .mkString("{", ",", "}")
          s"""{"best_prior_run":$pid,"median_inflation":${num(med)},""" +
            s""""inflated_frac":${num(frac)},"re_ran":$reRan,""" +
            (if (codeMismatch) """"code_mismatch":true,""" else "") +
            s""""top_inflation":$top}"""
        } else if (med0 > LoadGuardMedian) {
          s"""{"recovered_by_rerun":true,"best_prior_run":$pid,""" +
            s""""median_inflation":${num(med)}}"""
        } else "null"
      (cur, flag)
    } catch { case e: Throwable =>
      (cur0,
        s"""{"guard_error":"${esc(String.valueOf(e.getMessage).take(300))}"}""")
    }

  // ---- run-over-run state diagnostics (r15 verdict #3; r16 #2) ----
  // maintenance_sf10's `merge` grew monotonically across six
  // consecutive runs (24.0→37.2 s) while siblings bounced — the
  // signature of per-session state accumulation, not noise. r15
  // countered with pre_state counters + a start-of-run sweep; r16
  // moved every throwaway fixture dir into the project-owned
  // [[graft.GraftTmp]] namespace, so the sweep and the counters
  // are exact (the r15 `tmp_entries` census mixed this repo's leaks
  // with whatever else the machine dropped in /tmp, and the prefix
  // sweep missed every test-suite fixture family).

  private def isStanding(name: String): Boolean =
    name.startsWith("graft_postings_") ||
      name.startsWith("graft_ivf_index_") ||
      name.startsWith("graft_sketch_corpus_m1_")

  /** Reclaim stale fixture dirs (r16, ADVICE): every throwaway dir the
    * repo mints now lives under [[graft.GraftTmp.root]], so the
    * sweep deletes only inside that namespace — age-gated, no prefix
    * heuristics, and a foreign process's `gt_*`-named data at the
    * tmpdir top level is outside the blast radius by construction (the
    * r15 prefix+digit-tail sweep over the shared tmpdir root is
    * retired; its ~3k-entry top-level backlog was cleaned once,
    * manually, when the namespace landed). Standing indexes
    * ([[isStanding]]) live OUTSIDE the namespace and are never
    * candidates. Env SPARK_GRAFT_SKIP_TMP_SWEEP disables it — the
    * flat-lineage proof runs (two consecutive full runs with the sweep
    * off, tmp delta ≈ 0) need leaks visible, not reclaimed. Returns
    * (dirs deleted, bytes reclaimed). */
  private[graft] def sweepStaleTmp(): (Int, Long) =
    if (sys.env.contains("SPARK_GRAFT_SKIP_TMP_SWEEP")) (0, 0L)
    else graft.GraftTmp.sweep()

  private def dirBytes(f: java.io.File): Long =
    if (f.isFile) f.length()
    else Option(f.listFiles()).getOrElse(Array.empty).map(dirBytes).sum

  /** Splice a section's graft-tmp fixture-entry delta into its
    * already-assembled JSON object (hand-assembled artifact grain —
    * the section bodies each return a complete `{…}`). */
  private[graft] def withTmpDelta(json: String, delta: Int): String =
    if (json == "{}") s"""{"tmp_delta":$delta}"""
    else if (json.startsWith("{")) s"""{"tmp_delta":$delta,""" + json.drop(1)
    else json

  /** Counted pre-state snapshot stamped into each maintenance section:
    * tmpdir population (top-level, continuity with pre-r16 lineage),
    * the GRAFT-owned fixture population (graft-tmp namespace entries —
    * the counter that can actually attribute a leak to this repo),
    * standing-index footprint, fixture footprint, and the wall-clock
    * offset into this bench run — the candidate correlates for any
    * run-over-run lifecycle drift. */
  private[graft] def preStateJson(fixtureDir: String,
      elapsedSec: Double): String = {
    val tmp = new java.io.File(sys.props("java.io.tmpdir"))
    val entries = Option(tmp.list()).map(_.length).getOrElse(0)
    val standingBytes = Option(tmp.listFiles()).getOrElse(Array.empty)
      .filter(d => isStanding(d.getName)).map(dirBytes).sum
    val fix = new java.io.File(fixtureDir)
    def fixCount(f: java.io.File): Int =
      if (f.isFile) 1
      else Option(f.listFiles()).getOrElse(Array.empty).map(fixCount).sum
    s"""{"tmp_entries":$entries,""" +
      s""""graft_tmp_entries":${graft.GraftTmp.entries()},""" +
      s""""standing_bytes":$standingBytes,""" +
      s""""fixture_files":${fixCount(fix)},""" +
      s""""fixture_bytes":${dirBytes(fix)},""" +
      s""""elapsed_at_start":${num(elapsedSec)}}"""
  }

  /** Diagnosed explanations for sf1 flags whose super-linearity is a
    * measured DATA property, not an algorithmic shape (each verified by
    * stage-level profiling; see the named query's scaladoc). */
  val FlagNotes: Map[String, String] = Map(
    "dedup_minhash" -> ("r15 LINEAGE STEP, intentional: the operator " +
      "moved from OPH/xxhash sketches to md5-affine permutations (the " +
      "hash-oracle graduation) — headline sf0.1 cold cost rose " +
      "1.9 -> ~3.2-4.0 s (one md5 per shingle) while sf10 DROPPED " +
      "80.3 -> 20.6-27.6 s (lossless int lanes halve the verify-join " +
      "bytes; no fold16 step): the trade favors exactly the scale that " +
      "matters. Pre-r15 numbers are not comparable. " +
      "LSH candidate pairs grow 12.0x at 10x data " +
      "(294k to 3.52M, stage-profiled): digit/punctuation shingles are " +
      "invariant under BenchScale's Caesar transform, so scaled copies " +
      "gain genuine cross-copy near-dup candidates. Per-candidate cost " +
      "is flat (verify join is linear in candidates; output pairs scale " +
      "exactly 10x, 256 to 2561) and the sketch pipeline computes once " +
      "(persisted). Linear in candidate count by construction. " +
      "Second-decade evidence (sf1 -> sf10, stage-counted): candidates " +
      "3.33M -> 32.2M = 9.7x and output pairs exactly 10x (2561 -> " +
      "25601) — the WORK is linear (the sf10 generator permutes digits " +
      "per copy, so the cloning artifact does not compound). Any " +
      "residual super-10x TIME ratio is the one-time broadcast -> " +
      "shuffle transition on the verify join once the sketch side " +
      "outgrows broadcast; folded 16-bit lanes ship a quarter of those " +
      "bytes (measured 228 s -> 74 s at sf10)."),
    "knn_ivf" -> ("IVF index BUILD is n*sqrt(n) FLOPs by construction: " +
      "exhaustive nearest-centroid assignment of n vectors over " +
      "sqrt(n/2) cells (the FAISS IVFFlat build shape); the per-row " +
      "assignment kernel keeps it a codegen'd map (no row explosion — " +
      "26 s -> 12 s at sf10). The build amortizes over the index " +
      "lifetime; the QUERY path is sub-linear (nprobe caps at 16, " +
      "scanned fraction 16/sqrt(n)). At 100 TB assignment runs " +
      "sample-trained and hierarchically, dropping the build exponent; " +
      "the one-shot bench pays full build + probe every run."),
    "semantic_dedup" -> ("Single-level SemDeDup is n*sqrt(n) comparisons " +
      "by construction (sqrt(n)-scaled cells x per-cell quadratic — " +
      "stage-counted at the second decade: candidate pairs 2.0M -> " +
      "63.1M = exactly 10^1.5 at 10x data, per-pair cost flat). The " +
      "prune runs as ONE anti-join whose predicate carries the cosine " +
      "threshold, so it SHORT-CIRCUITS on the first matching earlier " +
      "cell-mate: the ~95% of vectors that get pruned pay a few dot " +
      "products, not their whole cell (prune stage 15.2 s -> 1.7 s at " +
      "sf10, full query 24 s -> 7.3 s, measured). Worst case (duplicate-" +
      "free corpus) stays n^1.5 exactly like the knn_ivf build; at " +
      "100 TB assignment runs sample-trained and hierarchically."),
    "containment_dedup" -> ("Exactly linear by construction: work = " +
      "corpus shingle volume (one packed-long distinct + df census + " +
      "df-capped anchor probes, candidates <= 64/doc at ANY scale), so " +
      "the ratio sits AT the data factor with no fixed-overhead " +
      "cushion — a flag here is measurement noise around 10.0, not a " +
      "super-linear shape (measured 4.7 s sf0.1 / 47 s sf1 warm)."),
    "lineitem_by_priority" -> ("Scan-bound linear groupBy over the full " +
      "lineitem table: work = bytes scanned with NO fixed-overhead " +
      "cushion (the containment_dedup argument at query grain), so the " +
      "decade ratio sits AT the data factor and straddles it run to " +
      "run — a flag here is the noise band around the factor on a " +
      "sub-second base, bounded by the preliminary-flag re-measure of " +
      "both sides, not a super-linear shape."),
    "profile_orders" -> ("The one-scan EXACT profile Expands each scan " +
      "row once per profiled column before aggregating: work is linear " +
      "in rows x columns with no cushion, and at sf10 the Expand " +
      "stream crosses the partial-agg hash spill transition — a " +
      "one-time constant, not a shape (the optimize note's argument at " +
      "query grain). The approx (HLL) twin benched beside it " +
      "(profile_orders_approx) is the 100 TB path: no Expand blowup, " +
      "sketches merge map-side."),
    "knn_pq" -> ("One-time codebook-cap transition, not a scale shape: " +
      "scaledPqCodes = min(256, sqrt(n/2)) crosses its one-byte cap " +
      "between sf1 (100 entries) and sf10 (256) — per-vector encode " +
      "cost grows 2.56x across this decade and is CONSTANT for every " +
      "decade after (codes are 8 B/vector forever; ADC scoring is " +
      "linear in n with a fixed 50-query set; the encode kernel keeps " +
      "it a map, 58 s -> 4.4 s at sf10)."))

  /** Scale section (r8; widened to the FULL headline set in r9): run
    * every bench query at a ×10 scale-up of the bench dir to expose
    * super-linear shapes (CC round growth, LSH bucket skew, per-cell
    * quadratics, per-group buffers) the small bench hides. r8's
    * 16-query subset was how `sessionize`'s 12× shape was caught —
    * and why nothing proved the other queries' scaling. */
  val ScaleSubset: Seq[String] = Headline

  /** Locale-proof numeric literal for hand-assembled JSON. */
  private def num(v: Double): String =
    "%.3f".formatLocal(java.util.Locale.ROOT, v)

  /** JSON string-literal escape for hand-assembled artifact lines: a
    * note containing a quote or backslash must never corrupt the line
    * (r13, ADVICE) — and neither may a NEWLINE or control char (r15:
    * exception messages carry plan trees; a raw \n would split the
    * one-line artifact, poisoning BENCH_LOCAL.jsonl's line-oriented
    * lineage and the driver's JSON parse). */
  private def esc(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '\\' => sb.append("\\\\")
      case '"' => sb.append("\\\"")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' =>
        sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  /** Flag-note discipline, enforced at JSON-assembly time (r12): a
    * flagged key WITHOUT a diagnosis is indistinguishable from an
    * undiagnosed super-linear shape, so every flagged key maps to a
    * note — the diagnosed one from `notes`, else an explicit auto-note
    * that says so out loud (the getOrElse makes a note-less flagged
    * entry unrepresentable). `voluntary` (r13) adds watch notes for
    * UNflagged keys — stage-counted evidence attached before a ratio
    * ever crosses the factor; a flagged key's diagnosed note wins. */
  private[graft] def flagNotesJson(flagged: Seq[String],
      notes: Map[String, String],
      voluntary: Map[String, String] = Map.empty): String = {
    val flaggedKeys = flagged.map(_.replace("\"", ""))
    val entries = flaggedKeys.map { k =>
      // a freshly-flagged key with no diagnosed note still prefers the
      // run's own voluntary stage-counted evidence over the generic
      // auto-note — real measured counts must never lose to a
      // placeholder (r13 review)
      k -> notes.getOrElse(k, voluntary.getOrElse(k,
        "UNDIAGNOSED: ratio exceeded the factor and no diagnosed note " +
        "exists for this key; auto-note inserted by the flag-note " +
        "discipline - needs a stage-counted diagnosis next round"))
    } ++ voluntary.toSeq.sortBy(_._1).filterNot(v => flaggedKeys.contains(v._1))
    entries.map { case (k, v) => "\"" + esc(k) + "\":\"" + esc(v) + "\"" }
      .mkString("{", ",", "}")
  }

  /** Release persisted blocks between measured queries. Operators that
    * persist an intermediate (the dedup sketch/signature tables) return
    * lazy frames, so THEY cannot unpersist — cache lifetime is owned by
    * the driving loop (Verify does the same per query). Outside the
    * measured window: each query's timing covers its own compute, not
    * the previous query's cleanup. */
  private def releaseCaches(spark: SparkSession): Unit =
    try spark.catalog.clearCache() catch { case _: Throwable => () }

  /** Wall-clock budget for the whole run (seconds; env
    * SPARK_GRAFT_BENCH_BUDGET_SEC overrides). The driver kills
    * over-long runs — r12's artifact was rc 124 / parsed null because
    * the kill landed mid-OPTIMIZE and the one JSON line was only
    * emitted at the very end; r11's 2908 s run survived. The default
    * sits comfortably below the observed kill window, and each
    * optional section starts only if elapsed + its cost hint fits. */
  val DefaultBudgetSec = 3000.0

  /** Per-section wall-clock cost hints (seconds, sized from the r12
    * closing run at sf0.1): the guard never BEGINS a section it cannot
    * afford to finish — skipping at the boundary is recorded in the
    * artifact, a kill mid-section records nothing for it. */
  val SectionHints: Map[String, Double] = Map(
    // maintenance hints include the r16 optimize_waved_sql campaign
    // (a second full re-cluster per lifecycle); sf10 includes the r16
    // min-of-2 second pass
    "maintenance" -> 80, "sf1" -> 340,
    "indexed_sf1" -> 130, "maintenance_sf1" -> 115, "skew" -> 400,
    "skew_vec" -> 240, "maintenance_skew" -> 130, "sf10" -> 900,
    "maintenance_sf10" -> 700)

  /** Cold-fixture surcharge for [[SectionHints]] (r13 ADVICE): the
    * hints are WARM-run costs, but a cold machine generates the
    * scale/skew fixture inside the section — without this term the
    * guard can start a section it cannot finish (a mid-section kill
    * instead of a recorded skip). Values are conservative generation
    * estimates; a warm marker zeroes them. `maintenance_skew` shares
    * the skew dir, so it is warm whenever the skew section ran. */
  private def coldFixtureExtraSec(key: String, sfDir: String): Double = {
    def dirOf(env: String, dflt: String) = sys.env.getOrElse(env,
      new java.io.File(dflt).getAbsolutePath)
    key match {
      case "sf1" if !BenchScale.scaledIsWarm(
        dirOf("SPARK_GRAFT_SF1_DIR", "target/graft_sf1")) => 120.0
      case "sf10" if !BenchScale.scaledIsWarm(
        dirOf("SPARK_GRAFT_SF10_DIR", "target/graft_sf10")) => 420.0
      case "skew" | "maintenance_skew" if !BenchScale.skewIsWarm(
        dirOf("SPARK_GRAFT_SKEW_DIR", "target/graft_skew")) => 60.0
      case "skew_vec" if !BenchScale.skewVecIsWarm(sfDir,
        dirOf("SPARK_GRAFT_SKEWVEC_DIR", "target/graft_skew_vec")) => 40.0
      case _ => 0.0
    }
  }

  /** Durable artifact-trail location (env override for a non-repo
    * checkout; CWD-relative default). */
  private[graft] def benchLogPath: String =
    sys.env.getOrElse("SPARK_GRAFT_BENCH_LOG",
      new java.io.File("BENCH_LOCAL.jsonl").getAbsolutePath)

  // ---- run-wide budget state (set by main; the benign defaults keep
  // the helpers usable standalone and under test) ----
  @volatile private var runStartNs: Long = System.nanoTime()
  @volatile private var runBudgetSec: Double = Double.MaxValue
  private def runElapsedSec: Double = (System.nanoTime() - runStartNs) / 1e9

  /** True when `costSec` more seconds still fit the run budget — the
    * gate every flag-triggered RE-measure must pass: the section guard
    * admits a section at its single-run cost, and a re-run that blows
    * the budget would recreate exactly the mid-section kill the
    * incremental emission exists to survive. The estimate is the
    * FIRST run's own measured cost — the one number known to be the
    * re-run's price. */
  private def reMeasureFits(costSec: Double): Boolean =
    runElapsedSec + costSec < runBudgetSec

  /** Test hook: run `body` with the run-budget state pinned, restoring
    * the benign defaults afterwards. */
  private[graft] def withBudgetForTest[T](budgetSec: Double)(body: => T): T = {
    val (s0, b0) = (runStartNs, runBudgetSec)
    runStartNs = System.nanoTime(); runBudgetSec = budgetSec
    try body finally { runStartNs = s0; runBudgetSec = b0 }
  }

  def main(args: Array[String]): Unit = {
    val startNs = System.nanoTime()
    def elapsedSec: Double = (System.nanoTime() - startNs) / 1e9
    val budgetSec = sys.env.get("SPARK_GRAFT_BENCH_BUDGET_SEC")
      .flatMap(s => scala.util.Try(s.toDouble).toOption)
      .getOrElse(DefaultBudgetSec)
    runStartNs = startNs
    runBudgetSec = budgetSec
    // r15: reclaim stale fixture dirs earlier runs leaked into tmpdir —
    // the /tmp-fill candidate for the run-over-run merge creep; standing
    // indexes are spared (cross-run reuse is their point)
    locally {
      val (n, b) = sweepStaleTmp()
      if (n > 0) System.err.println(
        s"[bench] tmp sweep: $n stale fixture dirs, $b bytes reclaimed")
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // the shipped extensions (r16): the bench session now runs the
      // library's user-facing configuration — the graft SQL parser
      // (needed by the lifecycle's optimize_waved_sql campaign), the
      // registered functions, and the scan-stats rule — exactly what a
      // production session built per the README gets. Pre-r16 numbers
      // ran without the stats rule; the code fingerprint in each
      // artifact line attributes any resulting plan shift.
      .withExtensions(new org.apache.spark.sql.graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // at bench scale the shuffles are KB-sized: let AQE coalesce to the
      // advisory size instead of splitting to max parallelism — task
      // launch overhead dominates otherwise (local[32] was 2x local[4])
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val queries = SparkEntry.queries
    val names = Headline.filter(queries.contains)
    // JVM/codegen warmup outside the measured window: touch every fact
    // path (lineitem scan; events scan incl. nanos conversion; documents
    // scan incl. regex/hash codegen; embeddings scan incl. array
    // kernels) — first-touch JIT costs ~2s and would otherwise land on
    // whichever measured query hits each path first
    Seq("count_rows", "count_by_type", "text_stats", "embedding_quantize")
      .foreach { w =>
        try queries(w)(spark, sfDir).count()
        catch { case _: Throwable => () }
      }
    // min-of-N per query (r12): the four r11 runs spanned 74-118 s on
    // identical code — single-run per-query numbers cannot distinguish a
    // 1.5× regression from a GC pause. Each query runs RunsPerQuery
    // times back-to-back (caches released between runs) and the
    // ARTIFACT records each query's minimum — the least-noise estimate
    // of its true cost — plus a noise_band summarizing the observed
    // run-to-run spread so readers can size the noise envelope.
    val runsByQuery = names.map { name =>
      name -> (1 to RunsPerQuery).map { _ =>
        val t0 = System.nanoTime()
        try {
          queries(name)(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          -1.0 // sentinel: failed queries must not skew the total
        } finally releaseCaches(spark)
      }
    }
    // a query that fails one run but succeeds another keeps its valid
    // measurement (min over successes; r13, ADVICE) — only an
    // all-runs-failed query poisons the total, and mixed outcomes are
    // surfaced in partial_failure rather than silently dropped
    var results = runsByQuery.map { case (k, ts) =>
      val ok = ts.filter(_ >= 0)
      k -> (if (ok.isEmpty) -1.0 else ok.min)
    }
    val logPath = benchLogPath
    // ---- cross-run load guard (r15, verdict #1) ----
    // The driver ships the LAST run as the artifact of record; r14's
    // last run was the session's worst by ~40% with UNIFORM per-query
    // inflation (machine load), and per-query min-of-N cannot defend
    // against whole-run load. Compare this run's headline to the
    // session's best prior FINAL line (same sf, common queries): when
    // the MEDIAN per-query inflation exceeds LoadGuardMedian — a single
    // legitimately-changed query cannot move the median, uniform load
    // does — re-run the headline once (budget-gated) keeping per-query
    // mins, and if the median still exceeds the guard, stamp the
    // artifact with a load_flag carrying the inflation vector so it
    // self-describes as load-contaminated instead of silently shipping.
    var loadFlagJson = "null"
    // per-query guard re-run durations (-1 = re-run failed): folded into
    // partial_failure below so the re-run never erases a failure record
    var reRunTimes = Map.empty[String, Double]
    // the guard runs BEFORE the first artifact emission: any failure in
    // it must degrade to "no guard", never kill the run (the r12
    // hard-gate lesson — a dead run parses as a missing one)
    val qsHash = querySetHash(names)
    try {
      val all = priorFinalRuns(logPath, sfDir)
        .filter(r => r.total > 0 && r.queries.nonEmpty)
      // candidate preference ([[preferredPrior]]): same query set AND
      // same code first — a cross-set comparison silently intersects
      // keys and a cross-code one can misattribute a real regression
      // to machine load. Falling back (with the mismatch NOTED in the
      // flag) beats refusing: pre-r16 lines carry no hash/fingerprint
      // at all, and a refusal would disable the guard for exactly the
      // first round after any format change.
      val prior = preferredPrior(all, qsHash, codeFingerprint)
      prior.foreach { p =>
        val setMismatch = p.setHash.exists(_ != qsHash)
        val codeMismatch = !p.code.contains(codeFingerprint)
        val mismatchJson =
          (if (setMismatch) """"set_mismatch":true,""" else "") +
            (if (codeMismatch)
              s""""prior_code":"${esc(p.code.getOrElse("unknown"))}",""" +
                """"code_mismatch":true,"""
            else "")
        val (med0, _, _) = inflationStats(results.toMap, p.queries)
        val fired = med0 > LoadGuardMedian
        var reRan = false
        if (fired) {
          val reCost = results.collect { case (_, v) if v > 0 => v }.sum
          if (reMeasureFits(reCost * 1.2)) {
            reRan = true
            System.err.println(s"[bench] load guard: median inflation " +
              s"${num(med0)} vs run ${p.runId} — re-running headline once")
            results = results.map { case (k, v) =>
              val t0 = System.nanoTime()
              val w =
                try { queries(k)(spark, sfDir).count()
                      (System.nanoTime() - t0) / 1e9 }
                catch { case _: Throwable => -1.0 }
                finally releaseCaches(spark)
              reRunTimes += k -> w
              k -> (if (v < 0 || w < 0) math.max(v, w) else math.min(v, w))
            }
          }
        }
        val (med, frac, perQ) = inflationStats(results.toMap, p.queries)
        if (med > LoadGuardMedian) {
          val top = perQ.take(8)
            .map { case (k, r) => "\"" + k + "\":" + num(r) }
            .mkString("{", ",", "}")
          loadFlagJson = s"""{"best_prior_run":${p.runId},""" +
            s""""best_prior_total":${num(p.total)},""" +
            mismatchJson +
            s""""median_inflation":${num(med)},""" +
            s""""inflated_frac":${num(frac)},"re_ran":$reRan,""" +
            s""""top_inflation":$top}"""
        } else if (fired) {
          loadFlagJson = s"""{"recovered_by_rerun":true,""" +
            s""""best_prior_run":${p.runId},""" + mismatchJson.stripSuffix(",") +
            (if (mismatchJson.nonEmpty) "," else "") +
            s""""median_inflation":${num(med)}}"""
        }
      }
    } catch { case e: Throwable =>
      System.err.println(s"[bench] load guard skipped: ${e.getMessage}")
      // truncated: an unbounded message could push the compact
      // last-resort line past the driver's 2000-char stdout tail
      loadFlagJson =
        s"""{"guard_error":"${esc(String.valueOf(e.getMessage).take(300))}"}"""
    }
    // the guard re-run counts as a run: a query whose CONTRACT runs all
    // failed but whose re-run succeeded must surface in partial_failure
    // (mixed outcomes are never silently laundered into a clean
    // measurement), and a re-run failure on an otherwise-green query
    // must surface the same way
    val partialFailed = runsByQuery.collect {
      case (k, ts0) if {
          val ts = ts0 ++ reRunTimes.get(k)
          ts.exists(_ < 0) && ts.exists(_ >= 0)
        } => "\"" + k + "\""
    }
    // per-query max/min spread over the N runs; sub-50 ms queries are
    // scheduling noise and excluded from the band
    val spreads = runsByQuery.collect {
      case (_, ts) if ts.forall(_ >= 0) && ts.min > 0.05 => ts.max / ts.min
    }.sorted
    val noiseBand =
      if (spreads.isEmpty) "{}"
      else s"""{"p50":${num(spreads(spreads.size / 2))},""" +
        s""""max":${num(spreads.last)},"n":${spreads.size}}"""
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // an all-runs failure poisons the total (-1): a dropped heavy query
    // must never read as a round-over-round speedup; "failed" names them
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
    val total = if (failed.nonEmpty) -1.0 else results.map(_._2).sum
    // the query set grew in r5: "total_r4set" is the sum over the r1–r4
    // set only, the number comparable against earlier rounds' totals
    val r4set = HeadlineR4.toSet
    val r4Results = results.filter(r => r4set(r._1))
    val totalR4 =
      if (r4Results.exists(_._2 < 0)) -1.0 else r4Results.map(_._2).sum
    val failedJson = failed.mkString("[", ",", "]")

    // ---- incremental artifact emission (r13) ----
    // The FULL artifact line re-prints after the headline block and
    // after every section (un-run sections read {"pending":true}), with
    // partial:false only on the last line. A kill anywhere leaves the
    // latest complete line on stdout and in the log — a dead run can no
    // longer be confused with a missing one (the r12 hard-gate miss:
    // one line emitted only after ALL sections, rc 124 → parsed null).
    // The reference prints each op's timing as it completes
    // (maintenance.py:148-151); this is that ethos at artifact grain.
    val sectionKeys = Seq("maintenance", "sf1", "indexed_sf1",
      "maintenance_sf1", "skew", "skew_vec", "maintenance_skew", "sf10",
      "maintenance_sf10")
    val sections = scala.collection.mutable.LinkedHashMap(
      sectionKeys.map(k => k -> "{\"pending\":true}"): _*)
    // intermediate emissions land in a sibling scratch file, truncated
    // per run: a killed run still leaves its latest complete state on
    // disk, without growing the tracked log ~12 lines of redundant
    // prefixes per healthy run (the tracked log gets ONE final line)
    val partialPath = logPath + ".partial"
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(partialPath),
      "", java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.TRUNCATE_EXISTING)
    catch { case _: Throwable => () }
    val runId = System.currentTimeMillis()
    def emit(partial: Boolean): Unit = {
      val sj = sections.map { case (k, v) => "\"" + k + "\":" + v }
        .mkString(",")
      // query_set names the ACTUAL set (r16, verdict #3 — the "r5-42q"
      // label had drifted to 72 queries) and the hash pins its exact
      // membership for guard comparisons; "code" is the fingerprint the
      // guard uses to prefer same-code priors
      val line = s"""{"metric":"total","value":$total,"unit":"sec","query_set":"r16-${results.size}q","query_set_hash":"$qsHash","code":"${esc(codeFingerprint)}","runs_per_query":$RunsPerQuery,"partial":$partial,"elapsed_sec":${num(elapsedSec)},"budget_sec":${num(budgetSec)},"noise_band":$noiseBand,"load_flag":$loadFlagJson,"total_r4set":$totalR4,"failed":$failedJson,"partial_failure":${partialFailed.mkString("[", ",", "]")},"queries":$qs,$sj,"sf":"$sfDir"}"""
      println(line)
      // durable full-JSON trail: the driver records only a 2000-char
      // tail of stdout, so every emission also lands on disk
      // (CWD-relative default; the env var overrides)
      try {
        val target = if (partial) partialPath else logPath
        java.nio.file.Files.writeString(java.nio.file.Paths.get(target),
          s"""{"ts_ms":${System.currentTimeMillis()},"run_id":$runId,"bench":$line}""" + "\n",
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.APPEND)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] bench-log write failed: ${e.getMessage}")
      }
    }
    def section(key: String)(body: => String): Unit = {
      val hint = SectionHints.getOrElse(key, 120.0) +
        coldFixtureExtraSec(key, sfDir)
      // per-section graft-tmp fixture delta (r16 verdict #2): each
      // section's JSON carries how many namespace entries IT left
      // behind, so a leak names its section instead of showing up as
      // an unattributable end-of-run census bump
      val tmpBefore = graft.GraftTmp.entries()
      sections(key) =
        if (elapsedSec + hint > budgetSec)
          s"""{"skipped":"over_budget","elapsed_sec":${num(elapsedSec)},"hint_sec":${num(hint)}}"""
        else
          try body
          catch { case e: Throwable =>
            System.err.println(s"[bench] section $key failed: ${e.getMessage}")
            s"""{"error":"${esc(String.valueOf(e.getMessage))}"}"""
          }
      sections(key) = withTmpDelta(sections(key),
        graft.GraftTmp.entries() - tmpBefore)
      emit(partial = true)
    }
    // the 2×-contract numbers land BEFORE any optional section runs
    emit(partial = true)

    var maint01: Map[String, Double] = Map.empty
    section("maintenance") {
      val m = maintenanceBench(spark, sfDir)
      maint01 = m.toMap
      m.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    }
    // the sf0.1 `indexed` section was DROPPED in r15 (r14 verdict #7):
    // at sf0.1 the twins measure fixed overheads, not the index —
    // shipped-run "speedups" of 0.04×–1.23× contradicted the same
    // artifact's sf1 numbers and informed no decision. indexed_sf1
    // below is the informative section.
    var sf1Times: Map[String, Double] = Map.empty
    var sf1Dir: Option[String] = None
    section("sf1") {
      val (json, times, d) = scaleBench(spark, sfDir, results.toMap, logPath)
      sf1Times = times; sf1Dir = d; json
    }
    section("indexed_sf1") {
      // min-of-2 like the headline set, budget-gated: the section hint
      // (130) prices build + ONE pass; the second pass costs roughly
      // the hint again minus the (now warm) build, so the upgrade is
      // gated on the full two-pass price still fitting — r13's runs=1
      // section was noise-exposed enough to invert its own recorded
      // speedups run-to-run
      sf1Dir.map { d =>
        val twoPass = 2 * SectionHints("indexed_sf1")
        indexedBench(spark, d, sf1Times,
          if (reMeasureFits(twoPass)) RunsPerQuery else 1,
          sfDir, logPath)
      }.getOrElse("{\"skipped\":\"no sf1 dir\"}")
    }
    // r10: the reference's daily loop IS maintenance — the table
    // lifecycle gets its own 10× datapoint (ratios vs the sf0.1 run).
    // factor is a PARAMETER (r12, ADVICE): each decade flags against
    // its own data factor.
    var maintSf1: Option[Seq[(String, Double)]] = None
    section("maintenance_sf1") {
      sf1Dir.filter(_ => !sys.env.contains("SPARK_GRAFT_SKIP_SF1")) match {
        case Some(d) =>
          val (json, m) = maintBlock(() => maintenanceLifecycle(spark, d),
            maint01, "ratio_vs_sf01", BenchScale.Factor,
            preState = preStateJson(d, elapsedSec),
            guard = Some(("maintenance_sf1", logPath, sfDir)))
          maintSf1 = Some(m); json
        case None => "{\"skipped\":true}"
      }
    }
    // r11: planted-skew fixture — the adversarial corpus the uniform
    // scale sections cannot represent; r12: the same question for the
    // EMBEDDING family (one IVF mega-cell) and the table lifecycle
    // (one mega-partition)
    section("skew")(skewBench(spark, sfDir))
    section("skew_vec")(skewVecBench(spark, sfDir))
    section("maintenance_skew")(maintenanceSkewBench(spark, sfDir))
    // r10: second decade — ×10 of sf1 for the heaviest shapes; runs
    // LAST with the sf10 lifecycle: the most expensive sections sit
    // where a budget skip costs the artifact the least novelty
    var sf10Dir: Option[String] = None
    section("sf10") {
      sf1Dir.filter(_ => !sys.env.contains("SPARK_GRAFT_SKIP_SF10")) match {
        case Some(d) =>
          val (json, d10) = scale10Bench(spark, d, sf1Times, sfDir, logPath)
          sf10Dir = d10; json
        case None => "{\"skipped\":\"no sf1 dir or SPARK_GRAFT_SKIP_SF10\"}"
      }
    }
    section("maintenance_sf10") {
      (sf10Dir, maintSf1) match {
        case (Some(d), Some(m1)) =>
          maintBlock(() => maintenanceLifecycle(spark, d), m1.toMap,
            "ratio_vs_sf1", BenchScale.Factor10,
            preState = preStateJson(d, elapsedSec),
            guard = Some(("maintenance_sf10", logPath, sfDir)))._1
        case _ => "{\"skipped\":true}"
      }
    }
    emit(partial = false)
    // the very last stdout line is a COMPACT summary — a few hundred
    // bytes, guaranteed to sit entirely inside the driver's 2000-char
    // stored output tail: whichever line a parser picks (the first
    // headline partial, the full final artifact, or this) parses. The
    // full artifact with the per-query map is the line above and every
    // BENCH_LOCAL.jsonl entry.
    println(s"""{"metric":"total","value":$total,"unit":"sec","query_set":"r16-${results.size}q","query_set_hash":"$qsHash","code":"${esc(codeFingerprint)}","n_queries":${results.size},"partial":false,"total_r4set":$totalR4,"failed":$failedJson,"partial_failure":${partialFailed.mkString("[", ",", "]")},"compact":true,"load_flag":$loadFlagJson,"elapsed_sec":${num(elapsedSec)},"budget_sec":${num(budgetSec)},"full_artifact":"BENCH_LOCAL.jsonl","sf":"$sfDir"}""")
    spark.stop()
  }

  /** Lifecycle scale block with flag-triggered re-measure (r13): ONE
    * lifecycle run; a second min-merged run happens only when a ratio
    * flags WITHOUT a diagnosed note. r12 paid an unconditional second
    * lifecycle at every decade (~520 s at sf10, its OPTIMIZE 340 s) to
    * re-confirm ratios that are diagnosed properties of the op
    * (O(n log n) full-table re-cluster) — most of why the driver's
    * clock ran out; an UNdiagnosed flag still earns the min-of-2
    * confirmation noise demands. Returns (json, per-op seconds) so the
    * next decade ratios against the confirmed numbers. */
  private[graft] def maintBlock(run: () => Seq[(String, Double)],
      base: Map[String, Double], ratioKey: String, factor: Int,
      preState: String = "null",
      guard: Option[(String, String, String)] = None)
      : (String, Seq[(String, Double)]) = {
    var m = run()
    def ratiosOf(mm: Seq[(String, Double)]): Seq[(String, Double)] =
      mm.flatMap { case (k, v) =>
        base.get(k).filter(t => t > 0 && v >= 0).map(t => k -> v / t)
      }
    val undiagnosed = ratiosOf(m).exists { case (k, r) =>
      r > factor && m.toMap.getOrElse(k, 0.0) >= 0.5 && !MaintNotes.contains(k)
    }
    // a re-run costs what the first run cost — only pay it if it fits
    val reCost = m.collect { case (_, v) if v > 0 => v }.sum
    val remeasured = undiagnosed && reMeasureFits(reCost)
    if (remeasured) {
      val second = run().toMap
      m = m.map { case (k, v) =>
        val w = second.getOrElse(k, v)
        k -> (if (v < 0 || w < 0) math.max(v, w) else math.min(v, w))
      }
    }
    // section-grain cross-run load guard (r16, verdict #1): the
    // lifecycle sections carry the maintenance scale evidence and
    // shipped without lineage defense in r15. The guard's own re-run
    // (another full lifecycle, min-merged) runs only when the ratio
    // logic above did not already buy one.
    var loadFlag = "null"
    guard.foreach { case (sectionKey, logPath, sf) =>
      val order = m.map(_._1)
      val (merged, flag) = sectionLoadGuard(sectionKey, "ops", logPath,
        sf, m.toMap,
        if (remeasured) None else Some(() => run().toMap))
      loadFlag = flag
      m = order.flatMap(k => merged.get(k).map(k -> _))
    }
    val ratioPairs = ratiosOf(m)
    val entries = m.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val ratios = ratioPairs
      .map { case (k, r) => "\"" + k + "\":" + num(r) }
      .mkString("{", ",", "}")
    // same flag discipline as the query scale sections: a lifecycle op
    // whose time ratio exceeds the data factor is named, with a note
    // ALWAYS (diagnosed from MaintNotes, else the explicit auto-note)
    val flagged = ratioPairs.collect {
      case (k, r) if r > factor && m.toMap.getOrElse(k, 0.0) >= 0.5 =>
        "\"" + k + "\""
    }
    (s"""{"pre_state":$preState,"load_flag":$loadFlag,""" +
      s""""ops":$entries,"$ratioKey":$ratios,""" +
      s""""remeasured":$remeasured,""" +
      (if (undiagnosed && !remeasured)
        s""""remeasure_skipped_over_budget":true,""" else "") +
      s""""flagged":${flagged.mkString("[", ",", "]")},""" +
      s""""flag_notes":${flagNotesJson(flagged, MaintNotes)}}""", m)
  }

  /** Standing-index pairs (r13): each scratch lexical operator beside
    * its `*_indexed` twin reading the standing postings table. */
  val IndexedPairs: Seq[(String, String)] = Seq(
    "tfidf_keywords" -> "tfidf_indexed",
    "collocations" -> "collocations_indexed",
    "ngram_lm_counts" -> "ngram_lm_counts_indexed",
    "ngram_novelty" -> "ngram_novelty_indexed",
    "vocab_growth" -> "vocab_growth_indexed",
    "source_similarity" -> "source_similarity_indexed",
    "bm25_rank" -> "bm25_indexed",
    "phrase_search" -> "phrase_indexed",
    "hybrid_rrf" -> "hybrid_indexed")

  /** Indexed-twin section (r13): the speedup the standing postings
    * table exists to deliver, measured rather than asserted. The
    * postings table is ensured OUTSIDE the timed window, so every
    * timed run reads the SAME standing state: the
    * run-N-depends-on-run-N−1 hazard that kept these out of the
    * headline set is pinned, and each timed run is the twin's pure
    * read-side cost (the content-addressed path answers freshness, so
    * no per-query anti-join runs — Postings.postings scaladoc).
    * postings_build_sec is that ensure step's wall time, and
    * `postings_cold` says what it actually was: a real build (cold
    * /tmp — the once-per-ingest cost the twins amortize) or a
    * metadata-cheap open of a table a previous run built (every warm
    * round) — without the flag the two are indistinguishable in the
    * artifact. speedup_vs_scratch = scratch twin's time (from the same
    * artifact: headline minima at sf0.1, the scale section at sf1) /
    * indexed time. */
  def indexedBench(spark: SparkSession, dir: String,
      scratchTimes: Map[String, Double], runs: Int,
      sfTag: String = "", logPath: String = benchLogPath): String = {
    val queries = SparkEntry.queries
    val cold = graft.table.GraftTable(spark,
      graft.text.Postings.postingsPath(dir)).currentVersion < 0
    val b0 = System.nanoTime()
    val buildSec =
      try {
        graft.text.Postings.postings(spark, dir).count()
        (System.nanoTime() - b0) / 1e9
      } catch { case e: Throwable =>
        System.err.println(s"[bench] postings build failed: ${e.getMessage}")
        return s"""{"skipped":"postings build failed: ${esc(String.valueOf(e.getMessage))}"}"""
      } finally releaseCaches(spark)
    def measureOnce(idx: String): Double = {
      val q0 = System.nanoTime()
      try {
        queries(idx)(spark, dir).count()
        (System.nanoTime() - q0) / 1e9
      } catch { case e: Throwable =>
        System.err.println(s"[bench] indexed/$idx failed: ${e.getMessage}")
        -1.0
      } finally releaseCaches(spark)
    }
    val pairs = IndexedPairs.filter(p => queries.contains(p._2))
    val rawRuns = pairs.map(_._2)
      .map(idx => idx -> (1 to runs).map(_ => measureOnce(idx))).toMap
    var times = rawRuns.map { case (k, ts) =>
      val ok = ts.filter(_ >= 0)
      k -> (if (ok.isEmpty) -1.0 else ok.min)
    }
    // section-grain load guard (r16, verdict #1): the re-run here is
    // cheap (one pass over the twins, the postings table already warm)
    val (mergedIdx, idxLoadFlag) = sectionLoadGuard("indexed_sf1",
      "queries", logPath, sfTag, times,
      Some(() => pairs.map { case (_, idx) => idx -> measureOnce(idx) }.toMap))
    times = mergedIdx
    val rows = pairs.map { case (scr, idx) =>
      (scr, idx, times.getOrElse(idx, -1.0), rawRuns(idx))
    }
    val qjson = rows.map { case (_, idx, v, _) => "\"" + idx + "\":" + num(v) }
      .mkString("{", ",", "}")
    val speedups = rows.flatMap { case (scr, idx, v, _) =>
      scratchTimes.get(scr).filter(_ > 0).filter(_ => v > 0)
        .map(s => "\"" + idx + "\":" + num(s / v))
    }.mkString("{", ",", "}")
    // same noise-band convention as the headline set (r13 verdict: the
    // single-run section inverted its own conclusion run-to-run —
    // speedups are only as trustworthy as the recorded spread)
    val spreads = rows.collect {
      case (_, _, _, ts) if ts.forall(_ >= 0) && ts.min > 0.05 =>
        ts.max / ts.min
    }.sorted
    val band =
      if (spreads.isEmpty) "{}"
      else s"""{"p50":${num(spreads(spreads.size / 2))},""" +
        s""""max":${num(spreads.last)},"n":${spreads.size}}"""
    s"""{"postings_build_sec":${num(buildSec)},"postings_cold":$cold,""" +
      s""""runs":$runs,"load_flag":$idxLoadFlag,""" +
      s""""noise_band":$band,"queries":$qjson,""" +
      s""""speedup_vs_scratch":$speedups}"""
  }

  /** Diagnosed explanations for maintenance ops whose scale ratio can
    * exceed the data factor by the op's own contract. */
  val MaintNotes: Map[String, String] = Map(
    "merge" -> ("r14 observed a monotonic run-over-run creep at sf10 " +
      "(24.0->37.2 s across six consecutive runs) — the session-state " +
      "signature, not noise. r15 counters: every maintenance section " +
      "now stamps pre_state (tmpdir population, standing-index bytes, " +
      "fixture files/bytes, elapsed offset into the run) so any future " +
      "drift carries its own correlate, and bench start sweeps the " +
      "stale fixture dirs earlier runs leaked into tmpdir (the " +
      "leading candidate pool: thousands of leaked entries measured). " +
      "Flat post-sweep lineage confirms the fix; a re-creep indicts " +
      "whichever pre_state counter moved with it."),
    "optimize_waved" -> ("The full re-cluster in byte-budgeted waves " +
      "(one bounded sort + one commit each, same-epoch resumable): " +
      "total work is n/waveBytes bounded in-memory sorts — LINEAR in " +
      "table bytes with no fixed-overhead cushion (the write/purge " +
      "argument), so the decade ratio sits AT the data factor and a " +
      "flag here is noise around it, not the retired one-shot sort's " +
      "O(n log n) + spill-transition shape."),
    "optimize_waved_sql" -> ("The SQL-driven twin of optimize_waved " +
      "(same byte-budgeted waves, parameterized from TBLPROPERTIES, a " +
      "fresh epoch forcing the full re-cluster): linear in table bytes " +
      "with no fixed-overhead cushion, so the decade ratio sits AT the " +
      "data factor and a flag here is noise around it. It runs SECOND, " +
      "on the table the API campaign just clustered, so its input is " +
      "already range-sorted and better-compressed (fewer bytes -> " +
      "sometimes one fewer wave) — measured ~0.5x the API time at " +
      "every decade (r16: 1.34/2.27 s sf0.1, 7.4/17.3 sf1, 33.2/62.3 " +
      "sf10). The drift alarm this op exists for is SQL >> API (a " +
      "parser/command regression); SQL < API is the expected " +
      "already-clustered-input asymmetry, not drift."),
    "optimize_wave_max" -> ("Per-wave ceiling: flat across decades " +
      "once the table exceeds one wave (256 MiB here). A decade whose " +
      "SMALLER side fits in a single sub-cap wave (sf1's whole scope " +
      "is one partial wave) compares a partial wave against a full " +
      "one, so that transition ratio can reach cap/smaller-table — " +
      "bounded by construction, and gone from sf10 onward."),
    "optimize_incremental" -> ("Cost = each partition's undersized " +
      "clustered TAIL + the appended delta (the provenance skip carries " +
      "every >=half-target file unread). Tail bytes are corpus-size mod " +
      "target-file-size per partition — bounded by partitions x 1 GiB, " +
      "a CONSTANT at scale, but NOT proportional between adjacent bench " +
      "scales, so the ratio is a modulo artifact, not a shape. The " +
      "fixed point is measured right after it: optimize_converged is a " +
      "metadata-only commit (0.4 s at sf10, 60M rows)."),
    "purge" -> ("REORG PURGE rewrites every file that carries a deletion " +
      "vector. The delete_dv step before it marks ~1% of rows via a " +
      "key-mod predicate whose keys land in EVERY file, so the whole " +
      "table is DV'd and purge's work is a full-table rewrite — linear " +
      "in table bytes by the op's contract, with no fixed-overhead " +
      "cushion (the containment_dedup argument): the ratio sits AT the " +
      "data factor and a flag here is noise around it, not a " +
      "super-linear shape. A production daily loop DVs only the files " +
      "that churned, so its purge rewrites that bounded set; the bench " +
      "deliberately pays the worst case."),
    "write" -> ("Byte-targeted writers since r13: parallelism = source " +
      "size estimate over 32 MiB per-writer source bins, floored at " +
      "session parallelism — the fixed repartition(8) r12 diagnosed at " +
      "sf10 is retired (write_repart8 ran its one declared transition " +
      "round in r13 and is gone since r14). " +
      "The write is linear in table bytes with NO fixed-overhead " +
      "cushion (the containment_dedup/purge argument), so its decade " +
      "ratio sits AT the data factor and straddles it run to run — " +
      "measured 9.9x and 10.6x on adjacent same-code runs, with the " +
      "retired fixed-8 fixture straddling identically (10.1x/8.8x): a " +
      "flag here is noise around the factor plus writer-count " +
      "quantization off a size ESTIMATE, not a super-linear shape."),
    "merge" -> ("MERGE's source is every 101st key, and those keys land " +
      "in EVERY file, so the matched-file rewrite is the whole table — " +
      "linear in table bytes by the op's contract with no fixed-" +
      "overhead cushion, exactly the purge argument: the decade ratio " +
      "sits AT the data factor and a flag here is noise around it. A " +
      "production daily merge touches the files its keys actually hit; " +
      "the bench deliberately pays the worst case (reference " +
      "maintenance.py's full-sync shape)."),
    "point_lookup" -> ("The lookup reads ONE file's row group at any " +
      "scale (bloom sidecar pruning) — what scales is the driver-side " +
      "proof walk, linear in FILE COUNT with a tiny per-file constant, " +
      "over a sub-second base. At 10x the files the walk alone puts the " +
      "ratio near the factor, and the op is small enough (0.5 s at sf1) " +
      "that one GC pause doubles it — the per-op min-of-2 bounds that; " +
      "data bytes read stay one file regardless of table size."),
    "mv_refresh" -> ("Refresh cost = the appended batch's change feed " +
      "(a CONSTANT 5000 rows in this lifecycle) + the view-sized merge; " +
      "both are scale-invariant here, so the RATIO between decades is " +
      "fixed-overhead noise around 1x, not a shape — an above-factor " +
      "ratio means one side's constant landed badly (GC/JIT), which the " +
      "min-of-N re-measure bounds."))

  /** Skew-fixture section (r11): the census/blocking family against the
    * [[BenchScale.ensureSkew]] corpus — base sf0.1 documents plus one
    * boilerplate template duplicated 30000× (≈86% of rows in ONE
    * blocking key, every word a stopword). Each query is measured on
    * the base dir and the skew dir in the same session; the flag
    * compares the time ratio against the ROW factor (≈7×) with the
    * same preliminary-flag re-measure discipline as the scale
    * sections. A skew-robust plan pays ~linear in the planted rows; a
    * single-task serialization pays the mega-block quadratically or
    * serially and blows past the factor. */
  val SkewSubset: Seq[String] = Seq(
    "dedup_substring", "dup_rate_report", "cluster_minsh",
    "pagerank_dups", "containment_dedup", "bm25_rank", "block_stats",
    // the other two r11-hardened shapes: edit_dedup's partial-agg hub
    // election (30k star candidates, each DP capped at EditPrefix²)
    // and exact dedup's groupBy on the hot content hash — plus the
    // trigram first-occurrence census (every planted trigram is hot)
    "edit_dedup", "dedup_exact", "ngram_novelty",
    // r12: the selection cascade — its exact-dedup election groups by
    // norm_text, and the planted template IS one norm_text holding 86%
    // of rows (the content-keyed analogue of the word-key hazard)
    "corpus_select", "filter_funnel")

  /** Diagnosed explanations for skew ratios above the row factor whose
    * cause is planted-data amplification, not a serialization shape. */
  val SkewNotes: Map[String, String] = Map(
    "pagerank_dups" -> ("Work is EDGE-count-driven, not row-count-driven: " +
      "the base corpus yields a few hundred blocking edges, the planted " +
      "block alone yields 30k (one per copy — linear in planted rows), " +
      "so edges grow ~60x while rows grow 7x. Per-edge cost is flat: the " +
      "running-sum window sorts/spills the mega-hub partition instead of " +
      "buffering it (the r11 fix this fixture exists to prove)."),
    "cluster_minsh" -> ("Same edge amplification as pagerank_dups (one " +
      "edge per planted copy vs a near-edge-free base corpus); CC " +
      "converges in one round on a star and the hub election is a " +
      "partial-agg groupBy, so cost is linear in the 30k edges."),
    "bm25_rank" -> ("The planted docs genuinely match query terms " +
      "(stopwords are in the query docs too), so the candidate set " +
      "grows with every planted copy x every query sharing a stopword " +
      "— real retrieval work, linear in planted postings; the df census " +
      "stays a partial-agg groupBy (no word-keyed window task)."),
    "edit_dedup" -> ("Star candidates = one per planted copy (30k pairs " +
      "vs a few hundred in the base corpus), each paying the " +
      "EditPrefix-capped DP — work is linear in planted rows with a " +
      "large constant, never quadratic in the block (the hub-star " +
      "construction; hub election is a partial-agg groupBy since r11)."),
    "corpus_select" -> ("Work is the per-row gate computation (stopword " +
      "hits x 5 languages, quality composite — linear in rows, and the " +
      "planted all-stopword docs genuinely pay it) plus the norm_text " +
      "min census, which partial-aggregation collapses to one row per " +
      "(task, distinct text) map-side; the dedup gate joins back on the " +
      "uniform doc_id key. Nothing content-keyed crosses a single task " +
      "(the r12 rewrite this fixture measures)."),
    "filter_funnel" -> ("Same shape as corpus_select (shared " +
      "firstDocsByNormText census, read through a LEFT join tag so " +
      "non-survivors count too); the funnel itself is a per-source " +
      "partial agg — linear in planted rows."),
    "ngram_novelty" -> ("Work amplification on the hot gram key, not " +
      "serialization: every planted copy contributes the SAME 118 " +
      "distinct trigrams, so the first-doc census join fans each hot " +
      "gram out to all 30k copies — rows through the join grow with " +
      "planted copies x planted grams (real linear work), while the " +
      "census itself stays a partial-agg groupBy (no hot TASK: the " +
      "join back is AQE-skew-splittable). Measured 5.7x at a 7x row " +
      "factor in r11 — sub-linear; this note exists in case noise " +
      "pushes a future run past the factor."))

  def skewBench(spark: SparkSession, sfDir: String): String = {
    if (sys.env.contains("SPARK_GRAFT_SKIP_SKEW"))
      return "{\"skipped\":\"SPARK_GRAFT_SKIP_SKEW set\"}"
    if (!sfDir.stripSuffix("/").endsWith("sf0.1"))
      return "{\"skipped\":\"not an sf0.1 bench dir\"}"
    // CWD-relative default like the bench-log path (r13, ADVICE): the
    // env var overrides for a non-repo checkout
    val outDir = sys.env.getOrElse("SPARK_GRAFT_SKEW_DIR",
      new java.io.File("target/graft_skew").getAbsolutePath)
    val dir =
      try BenchScale.ensureSkew(spark, sfDir, outDir)
      catch { case e: Throwable =>
        System.err.println(s"[bench] skew generation failed: ${e.getMessage}")
        return "{\"skipped\":\"generation failed\"}"
      }
    val baseRows = graft.tables.Tables.documents(spark, sfDir).count()
    val factor =
      (baseRows + BenchScale.SkewCopies).toDouble / math.max(baseRows, 1)
    val queries = SparkEntry.queries
    def measure(name: String, d: String): Double =
      try {
        val t0 = System.nanoTime()
        queries(name)(spark, d).count()
        (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        System.err.println(s"[bench] skew/$name failed: ${e.getMessage}")
        -1.0
      } finally releaseCaches(spark)
    val names = SkewSubset.filter(queries.contains)
    val base = scala.collection.mutable.Map(
      names.map(n => n -> measure(n, sfDir)): _*)
    val skew = scala.collection.mutable.Map(
      names.map(n => n -> measure(n, dir)): _*)
    // section-grain load guard (r16, verdict #1) on the skew-dir times
    // (the section's absolute evidence; the base side is additionally
    // bounded by the per-flag re-measure below)
    val (mergedSkew, skewLoadFlag) = sectionLoadGuard("skew", "skew",
      benchLogPath, sfDir, skew.toMap,
      Some(() => names.map(n => n -> measure(n, dir)).toMap))
    mergedSkew.foreach { case (k, v) => skew(k) = v }
    def ratioOf(k: String): Option[Double] =
      base.get(k).filter(_ > 0).flatMap(b =>
        skew.get(k).filter(_ >= 0).map(_ / b))
    // preliminary flags re-measured best-vs-best, as in the scale sections
    names.filter(k => skew(k) >= 0.5 && ratioOf(k).exists(_ > factor) &&
        reMeasureFits(skew(k) + math.max(base(k), 0.0)))
      .foreach { k =>
        val s2 = measure(k, dir); if (s2 >= 0) skew(k) = math.min(skew(k), s2)
        val b2 = measure(k, sfDir); if (b2 >= 0) base(k) = math.min(base(k), b2)
      }
    val ratios = names.flatMap(k => ratioOf(k).map(k -> _))
    val flagged = ratios.collect {
      case (k, r) if r > factor && skew.getOrElse(k, 0.0) >= 0.5 =>
        "\"" + k + "\""
    }
    // stage-counted evidence for the fleet's worst UNflagged skew point
    // (r13: corpus_select sat at 3.13× of a 7× row factor in r12 —
    // sub-linear, but the composed operator a 100 TB run executes ONCE
    // over everything). Counted, not argued: rows into the per-row
    // gates grow by the planted factor (every copy pays the
    // language/quality arithmetic — linear, unavoidable), the norm_text
    // election output grows by ~1 row (all copies collapse to one group
    // map-side), so the residual time is gate-side work, not a
    // content-keyed shuffle. Ships as a voluntary flag_notes entry plus
    // the raw counts.
    val stageCounts = scala.util.Try {
      val b = graft.text.TextAnalysis.corpusSelectStageCounts(spark, sfDir).toMap
      val s = graft.text.TextAnalysis.corpusSelectStageCounts(spark, dir).toMap
      releaseCaches(spark)
      (b, s)
    }.toOption
    val stageJson = stageCounts.map { case (b, s) =>
      def m(x: Map[String, Long]) = x.toSeq.sorted
        .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
      s"""{"corpus_select":{"base":${m(b)},"skew":${m(s)}}}"""
    }.getOrElse("{}")
    val voluntary = stageCounts.map { case (b, s) =>
      Map("corpus_select" -> ("voluntary watch note (unflagged; r12's " +
        "worst unflagged skew point): stage counts measured this run - " +
        s"rows into the per-row gates ${b("rows_in")} -> ${s("rows_in")} " +
        "(the planted row factor: every copy pays the language/quality " +
        "gate arithmetic, linear unavoidable work), norm_text election " +
        s"output ${b("election_out")} -> ${s("election_out")} (planted " +
        "copies collapse to one group map-side), selected rows " +
        s"${b("selected_out")} -> ${s("selected_out")}; no stage " +
        "amplifies beyond the row factor - the residual time is " +
        "gate-side arithmetic, not a content-keyed shuffle."))
    }.getOrElse(Map.empty[String, String])
    def js(kvs: Seq[(String, Double)]): String = kvs
      .map { case (k, v) => "\"" + k + "\":" + num(v) }
      .mkString("{", ",", "}")
    s"""{"copies":${BenchScale.SkewCopies},"row_factor":${num(factor)},""" +
      s""""load_flag":$skewLoadFlag,""" +
      s""""base":${js(names.map(k => k -> base(k)))},""" +
      s""""skew":${js(names.map(k => k -> skew(k)))},""" +
      s""""ratio":${js(ratios)},""" +
      s""""stage_counts":$stageJson,""" +
      s""""flagged":${flagged.mkString("[", ",", "]")},""" +
      s""""flag_notes":${flagNotesJson(flagged, SkewNotes, voluntary)}}"""
  }

  /** Embedding-skew section (r12): the vector-side counterpart of
    * [[skewBench]] — [[BenchScale.ensureSkewVec]] plants
    * [[BenchScale.SkewVecCopies]] byte-identical copies of ONE
    * embedding, so every copy lands in a single IVF mega-cell (the
    * hazard the √n-balanced-cell contracts of `semantic_dedup`'s
    * per-cell quadratic and `knn_ivf`'s probe fraction assume away).
    * Each family member runs on the base dir and the skew dir; the
    * flag compares the time ratio against the planted ROW factor with
    * the same min-of-N re-measure discipline.
    *
    * `knn_incremental_append` (r13) is the BUILD-vs-APPEND split the
    * r12 artifact lacked: r12 timed `knn_incremental` with a full
    * index build inside the window (honest 6.36× flag, but the append
    * path — the op's entire selling point — was never measured on its
    * own, so an append regression would hide inside build noise). Now
    * the standing index is cleared and pre-built WITHOUT a 1-in-20
    * held-out corpus slice OUTSIDE the timed window
    * ([[graft.similarity.Similarity.prebuildIvfIndexExcept]]; the
    * build cost is this section's `knn_ivf` line), and the timed
    * window pays exactly the day-2 cost: appending the held-out slice
    * against STORED centroids plus the batch probe. The index is
    * cleared again afterwards so a seed-trained quantizer never leaks
    * into a later full-contract run.
    *
    * r14: the fixture plants its copies INDEX-SIDE ONLY (ids ≡ 2 mod
    * 20 — see BenchScale), so no planted row is ever a query or an
    * appended-slice member; the flag gate compares engine work against
    * the row factor instead of the old fixture-geometry quadratic
    * (planted queries × planted postings), which carried a permanent
    * counted-but-flagged note. */
  val SkewVecSubset: Seq[String] =
    Seq("semantic_dedup", "knn_ivf", "knn_incremental_append",
      "topic_profile")

  /** Held-out corpus slice for the append split: vec_id % 20 == 1
    * (~5% of rows, disjoint from the % 5 == 0 query batch) — the
    * day-2 ingest batch the timed window appends. */
  val AppendHoldoutMod = 20
  val AppendHoldoutRem = 1

  /** Diagnosed explanations for embedding-skew ratios above the row
    * factor whose cause is the planted data, not a serialization
    * shape. */
  val SkewVecNotes: Map[String, String] = Map(
    "semantic_dedup" -> ("The mega-cell makes the KEEP-FIRST prune " +
      "cheap, not quadratic: every planted copy is cos-1 with every " +
      "earlier copy, so the anti-join short-circuits at its FIRST " +
      "earlier cell-mate — planted work is linear in copies. The " +
      "residual above-factor risk is the handful of base-corpus " +
      "members assigned to the mega-cell, each scanning O(cell) before " +
      "surviving — a bounded set (cell count x survivors), measured " +
      "here rather than argued."),
    "knn_ivf" -> ("Queries whose nprobe set includes the mega-cell " +
      "genuinely score 10k+ postings — real probe work, linear in the " +
      "planted rows that joined the probed cell; the per-row " +
      "assignment kernel is flat per vector and the mega-cell's " +
      "centroid attracts exactly the planted copies."),
    "knn_incremental_append" -> ("Fixture geometry (r14, one-sided): " +
      "planted ids ≡ 2 (mod 20) sit index-side only — zero " +
      "planted queries, zero planted appends — so probe pairs grow " +
      "linearly with the planted rows and the timed window pays the " +
      "same append slice as the base run plus linear mega-cell probes."),
    "topic_profile" -> ("The mega-cell is one GROUP in a partial-agg " +
      "groupBy (map-side combine collapses the hot cell key per task); " +
      "per-member scoring is the flat assignment kernel — linear in " +
      "planted rows by construction."))

  def skewVecBench(spark: SparkSession, sfDir: String): String = {
    if (sys.env.contains("SPARK_GRAFT_SKIP_SKEW"))
      return "{\"skipped\":\"SPARK_GRAFT_SKIP_SKEW set\"}"
    if (!sfDir.stripSuffix("/").endsWith("sf0.1"))
      return "{\"skipped\":\"not an sf0.1 bench dir\"}"
    // CWD-relative default like the bench-log path (r13, ADVICE)
    val outDir = sys.env.getOrElse("SPARK_GRAFT_SKEWVEC_DIR",
      new java.io.File("target/graft_skew_vec").getAbsolutePath)
    val dir =
      try BenchScale.ensureSkewVec(spark, sfDir, outDir)
      catch { case e: Throwable =>
        System.err.println(s"[bench] skew_vec generation failed: ${e.getMessage}")
        return "{\"skipped\":\"generation failed\"}"
      }
    val baseRows = graft.tables.Tables.embeddings(spark, sfDir).count()
    val factor =
      (baseRows + BenchScale.SkewVecCopies).toDouble / math.max(baseRows, 1)
    val queries = SparkEntry.queries
    def clearIvf(d: String): Unit =
      scala.util.Try(org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(graft.similarity.Similarity.ivfIndexPath(d))))
    def measure(name: String, d: String): Double = {
      val isAppend = name == "knn_incremental_append"
      try {
        if (isAppend) { // build-vs-append split: build OUTSIDE the window
          clearIvf(d)
          graft.similarity.Similarity.prebuildIvfIndexExcept(spark, d,
            AppendHoldoutMod, AppendHoldoutRem)
          releaseCaches(spark)
        }
        val t0 = System.nanoTime()
        queries(if (isAppend) "knn_incremental" else name)(spark, d).count()
        (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        System.err.println(s"[bench] skew_vec/$name failed: ${e.getMessage}")
        -1.0
      } finally {
        // a seed-trained quantizer must never leak into a later
        // full-contract knn_incremental run (its oracle replays
        // centroids as a pure function of the FULL corpus side)
        if (isAppend) clearIvf(d)
        releaseCaches(spark)
      }
    }
    val names = SkewVecSubset.filter(n => queries.contains(
      if (n == "knn_incremental_append") "knn_incremental" else n))
    val base = scala.collection.mutable.Map(
      names.map(n => n -> measure(n, sfDir)): _*)
    val skew = scala.collection.mutable.Map(
      names.map(n => n -> measure(n, dir)): _*)
    def ratioOf(k: String): Option[Double] =
      base.get(k).filter(_ > 0).flatMap(b =>
        skew.get(k).filter(_ >= 0).map(_ / b))
    // a re-measure of the append split ALSO pays the untimed
    // clearIvf + prebuild on both dirs — the dominant cost. The
    // section's own knn_ivf times (a full from-scratch build + probe
    // per dir) are the measured proxy for that prebuild, so the budget
    // estimate adds them rather than admitting a re-run the wall
    // budget can't absorb (r13 ADVICE).
    def reMeasureEstimate(k: String): Double = {
      val timed = skew(k) + math.max(base(k), 0.0)
      if (k != "knn_incremental_append") timed
      else timed + (base.get("knn_ivf").toSeq ++ skew.get("knn_ivf"))
        .filter(_ > 0).sum
    }
    names.filter(k => skew(k) >= 0.5 && ratioOf(k).exists(_ > factor) &&
        reMeasureFits(reMeasureEstimate(k)))
      .foreach { k =>
        val s2 = measure(k, dir); if (s2 >= 0) skew(k) = math.min(skew(k), s2)
        val b2 = measure(k, sfDir); if (b2 >= 0) base(k) = math.min(base(k), b2)
      }
    val ratios = names.flatMap(k => ratioOf(k).map(k -> _))
    val flagged = ratios.collect {
      case (k, r) if r > factor && skew.getOrElse(k, 0.0) >= 0.5 =>
        "\"" + k + "\""
    }
    def js(kvs: Seq[(String, Double)]): String = kvs
      .map { case (k, v) => "\"" + k + "\":" + num(v) }
      .mkString("{", ",", "}")
    s"""{"copies":${BenchScale.SkewVecCopies},"row_factor":${num(factor)},""" +
      s""""base":${js(names.map(k => k -> base(k)))},""" +
      s""""skew":${js(names.map(k => k -> skew(k)))},""" +
      s""""ratio":${js(ratios)},""" +
      s""""flagged":${flagged.mkString("[", ",", "]")},""" +
      s""""flag_notes":${flagNotesJson(flagged, SkewVecNotes)}}"""
  }

  /** sf1 scale section: generate a deterministic ×10 scale-up of the
    * bench dir ([[BenchScale]] — structure-preserving, not copy-paste
    * duplication) and run [[ScaleSubset]] on it. Reports per-query
    * seconds, the sf1/sf0.1 ratio, and flags any query whose ratio
    * exceeds 1.5× the data ratio — the super-linear-shape alarm the
    * small bench can't ring. Runs only when benching an sf0.1 dir
    * (SPARK_GRAFT_SKIP_SF1=1 disables); failures degrade to -1 like the
    * main bench, and a generation failure reports {"skipped":…}. */
  def scaleBench(
      spark: SparkSession,
      sfDir: String,
      sf01Times: Map[String, Double],
      logPath: String = benchLogPath)
      : (String, Map[String, Double], Option[String]) = {
    if (sys.env.contains("SPARK_GRAFT_SKIP_SF1"))
      return ("{\"skipped\":\"SPARK_GRAFT_SKIP_SF1 set\"}", Map.empty, None)
    if (!sfDir.stripSuffix("/").endsWith("sf0.1"))
      return ("{\"skipped\":\"not an sf0.1 bench dir\"}", Map.empty, None)
    val outDir = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR",
      new java.io.File("target/graft_sf1").getAbsolutePath)
    val t0 = System.nanoTime()
    val dir =
      try BenchScale.ensure(spark, sfDir, outDir)
      catch { case e: Throwable =>
        System.err.println(s"[bench] sf1 generation failed: ${e.getMessage}")
        return ("{\"skipped\":\"generation failed\"}", Map.empty, None)
      }
    val genSec = (System.nanoTime() - t0) / 1e9
    val queries = SparkEntry.queries
    def onePass(): Seq[(String, Double)] =
      ScaleSubset.filter(queries.contains).map { name =>
        val q0 = System.nanoTime()
        try {
          queries(name)(spark, dir).count()
          name -> (System.nanoTime() - q0) / 1e9
        } catch { case e: Throwable =>
          System.err.println(s"[bench] sf1/$name failed: ${e.getMessage}")
          name -> -1.0
        } finally releaseCaches(spark)
      }
    var results = onePass()
    // section-grain load guard (r16, verdict #1): the sf1 ratios feed
    // every downstream decade comparison, so a load-inflated sf1 pass
    // poisons sf10's ratio base too — one budget-gated min-merged
    // re-pass, else the flag
    val (mergedSf1, sf1LoadFlag) = sectionLoadGuard("sf1", "queries",
      logPath, sfDir, results.toMap, Some(() => onePass().toMap))
    results = results.map { case (k, _) =>
      k -> mergedSf1.getOrElse(k, -1.0) }
    // a super-linear shape is ratio > data factor (r8's 1.5× threshold
    // let a 12.1× ratio pass at factor 10). Sub-half-second sf1 queries
    // are exempt: at that size the ratio is JIT/scheduling noise, not a
    // scale shape — their absolute ceiling still bounds the damage.
    // Single-measurement ratios are noisy (one GC pause doubles a 2 s
    // query): a PRELIMINARY flag is confirmed by re-measuring BOTH
    // sides and taking each side's min — a real super-linear shape
    // reproduces, a scheduling hiccup doesn't (q21 flagged at 11.8×
    // then measured 3.9× in the adjacent run).
    def remeasure(name: String, dirFor: String): Option[Double] = {
      val r = scala.util.Try {
        val q0 = System.nanoTime()
        queries(name)(spark, dirFor).count()
        (System.nanoTime() - q0) / 1e9
      }.toOption
      releaseCaches(spark)
      r
    }
    val sf1Time = scala.collection.mutable.Map(results: _*)
    val sf01Best = scala.collection.mutable.Map(sf01Times.toSeq: _*)
    def ratioOf(k: String): Option[Double] =
      sf01Best.get(k).filter(_ > 0).flatMap(t =>
        sf1Time.get(k).filter(_ >= 0).map(_ / t))
    val preliminary = results.collect {
      case (k, v) if v >= 0.5 && ratioOf(k).exists(_ > BenchScale.Factor) => k
    }
    // best-vs-best on both sides (standard min-of-N benchmarking): the
    // min is the least-noise estimate of each side's true cost — each
    // re-measure pays what the first runs paid, so it must fit the
    // remaining budget
    preliminary.foreach { k =>
      if (reMeasureFits(sf1Time(k) + sf01Best.getOrElse(k, 0.0))) {
        remeasure(k, dir).foreach(v => sf1Time(k) = math.min(sf1Time(k), v))
        remeasure(k, sfDir).foreach(v => sf01Best(k) = math.min(sf01Best(k), v))
      }
    }
    val ratios = results.flatMap { case (k, _) => ratioOf(k).map(k -> _) }
    val flagged = ratios.collect {
      case (k, r) if r > BenchScale.Factor &&
        sf1Time.getOrElse(k, 0.0) >= 0.5 => "\"" + k + "\""
    }
    val total =
      if (results.exists(_._2 < 0)) -1.0 else results.map(_._2).sum
    def n(v: Double): String = // locale-proof numeric literal
      "%.3f".formatLocal(java.util.Locale.ROOT, v)
    def js(kvs: Seq[(String, Double)]): String = kvs
      .map { case (k, v) => "\"" + k + "\":" + n(v) }
      .mkString("{", ",", "}")
    val confirmed = results.map { case (k, _) => k -> sf1Time(k) }
    // fix-or-explain notes for flags (the flag still prints — the note
    // explains, it does not suppress); flagNotesJson guarantees every
    // flagged key carries one
    val json = s"""{"factor":${BenchScale.Factor},"gen_sec":${n(genSec)},""" +
      s""""load_flag":$sf1LoadFlag,""" +
      s""""total":$total,"queries":${js(confirmed)},"ratio":${js(ratios)},""" +
      s""""flagged":${flagged.mkString("[", ",", "]")},""" +
      s""""flag_notes":${flagNotesJson(flagged, FlagNotes)}}"""
    (json, confirmed.toMap, Some(dir))
  }

  /** Second-decade scale section (r10): the TOP-10 heaviest shapes at
    * ×10 of sf1 (= ×100 of the bench dir). One decade of evidence
    * extrapolates; two decades catch the shapes that only bend on the
    * second (LSH bucket skew, CC round growth, per-cell quadratics
    * whose cells stop fitting). Same flag discipline as sf1: ratio >
    * factor flags, preliminary flags re-measured on both sides. */
  val Scale10Subset: Seq[String] = Seq(
    "dedup_minhash", "semantic_dedup", "knn_pq", "knn_ivf",
    "cluster_minsh", "profile_orders", "q21_waiting_supplier",
    "sessionize", "quality_classifier", "canonical_selection",
    // late-r10: three more distinct heavy shapes earn a second decade —
    // the inverted-index BM25 join, the iterative checkpointed PageRank
    // rounds (the shape where round growth would bend), and the widest
    // (5-table) TPC-H join. containment_dedup stays one-decade: its
    // ~40 s sf1 time would add ~7 min of ×100 wall-clock for a shape
    // already pinned linear by construction (see FlagNotes).
    "bm25_rank", "pagerank_dups", "q9_product_profit",
    // r16 (verdict #6): the approx (HLL) profile benched BESIDE the
    // exact one at the decade — the 100 TB path's scale point, and the
    // control that says whether an exact-profile drift is the Expand
    // fan-out or the machine
    "profile_orders_approx")

  def scale10Bench(
      spark: SparkSession,
      sf1Dir: String,
      sf1Times: Map[String, Double],
      sfDir: String,
      logPath: String): (String, Option[String]) = {
    val outDir = sys.env.getOrElse("SPARK_GRAFT_SF10_DIR",
      new java.io.File("target/graft_sf10").getAbsolutePath)
    val t0 = System.nanoTime()
    val dir =
      try BenchScale.ensure10x(spark, sf1Dir, outDir)
      catch { case e: Throwable =>
        System.err.println(s"[bench] sf10 generation failed: ${e.getMessage}")
        return ("{\"skipped\":\"generation failed\"}", None)
      }
    val genSec = (System.nanoTime() - t0) / 1e9
    val queries = SparkEntry.queries
    val sub = Scale10Subset.filter(queries.contains)
    def onePass(): Map[String, Double] = sub.map { name =>
      val q0 = System.nanoTime()
      try {
        queries(name)(spark, dir).count()
        name -> (System.nanoTime() - q0) / 1e9
      } catch { case e: Throwable =>
        System.err.println(s"[bench] sf10/$name failed: ${e.getMessage}")
        name -> -1.0
      } finally releaseCaches(spark)
    }.toMap
    // min-of-2 under the same discipline as the headline set (r16,
    // verdict #5): single-shot section measurements made every
    // cross-round sf10 comparison noise-limited — r15's only apparent
    // sf10 regressions were unrepeated single measurements. The second
    // pass is budget-gated at the first pass's own measured cost; when
    // it doesn't fit, the artifact says so instead of shipping a
    // silently weaker measurement.
    val pass1 = onePass()
    val secondFits = reMeasureFits(pass1.values.filter(_ > 0).sum * 1.1)
    var times = if (secondFits) minMerge(pass1, onePass()) else pass1
    val runs = if (secondFits) 2 else 1
    // section-grain load guard (r16, verdict #1): one more min-merged
    // pass when the whole section reads inflated vs the best prior
    // same-sf section, else just the flag
    val (merged, loadFlag) = sectionLoadGuard("sf10", "queries",
      logPath, sfDir, times, Some(() => onePass()))
    times = merged
    def remeasure(name: String, dirFor: String): Option[Double] = {
      val r = scala.util.Try {
        val q0 = System.nanoTime()
        queries(name)(spark, dirFor).count()
        (System.nanoTime() - q0) / 1e9
      }.toOption
      releaseCaches(spark)
      r
    }
    val sf10Time = scala.collection.mutable.Map(times.toSeq: _*)
    val sf1Best = scala.collection.mutable.Map(sf1Times.toSeq: _*)
    def ratioOf(k: String): Option[Double] =
      sf1Best.get(k).filter(_ > 0).flatMap(t =>
        sf10Time.get(k).filter(_ >= 0).map(_ / t))
    val preliminary = sub.collect {
      case k if sf10Time.getOrElse(k, -1.0) >= 0.5 &&
        ratioOf(k).exists(_ > BenchScale.Factor10) => k
    }
    preliminary.foreach { k =>
      if (reMeasureFits(sf10Time(k) + sf1Best.getOrElse(k, 0.0))) {
        remeasure(k, dir).foreach(v => sf10Time(k) = math.min(sf10Time(k), v))
        remeasure(k, sf1Dir).foreach(v =>
          sf1Best(k) = math.min(sf1Best.getOrElse(k, v), v))
      }
    }
    val ratios = sub.flatMap(k => ratioOf(k).map(k -> _))
    val flagged = ratios.collect {
      case (k, r) if r > BenchScale.Factor10 &&
        sf10Time.getOrElse(k, 0.0) >= 0.5 => "\"" + k + "\""
    }
    val confirmed = sub.map(k => k -> sf10Time(k))
    val total =
      if (confirmed.exists(_._2 < 0)) -1.0 else confirmed.map(_._2).sum
    def n(v: Double): String =
      "%.3f".formatLocal(java.util.Locale.ROOT, v)
    def js(kvs: Seq[(String, Double)]): String = kvs
      .map { case (k, v) => "\"" + k + "\":" + n(v) }
      .mkString("{", ",", "}")
    (s"""{"factor":${BenchScale.Factor10},"vs":"sf1","gen_sec":${n(genSec)},""" +
      s""""runs":$runs,""" +
      (if (runs == 1) """"second_pass_skipped":"over_budget",""" else "") +
      s""""load_flag":$loadFlag,""" +
      s""""total":$total,"queries":${js(confirmed)},"ratio":${js(ratios)},""" +
      s""""flagged":${flagged.mkString("[", ",", "]")},""" +
      s""""flag_notes":${flagNotesJson(flagged, FlagNotes)}}""", Some(dir))
  }

  /** Skewed-PARTITION maintenance section (r12): the reference's daily
    * loop IS maintenance, and the r11 skew fixture only ran queries.
    * This runs the write → append → OPTIMIZE → converged-OPTIMIZE →
    * MERGE → DV-delete → PURGE → VACUUM lifecycle on the planted skew
    * corpus under its NATURAL layout — hive-partitioned by `source`,
    * so `boilerplate_mill` holds ~86% of rows in ONE partition — and
    * on a UNIFORM twin of the SAME rows (partitioned by a doc_id mod
    * bucket with the same partition count). Identical volume, only the
    * layout differs: ratios near 1 say the lifecycle is layout-robust
    * (OPTIMIZE range-partitions on (partition, key), so a fat
    * partition gets proportionally many bins, never one fat task), and
    * `converged_files_changed` records the churn-guard proof — the
    * converged re-run must rewrite ZERO files regardless of layout. */
  val MaintSkewFactor = 2.0

  /** Diagnosed notes for lifecycle ops whose skew/uniform ratio can
    * exceed [[MaintSkewFactor]] by construction. */
  val MaintSkewNotes: Map[String, String] = Map(
    "vacuum" -> ("Vacuum walks removed files; both layouts remove the " +
      "same count, so an above-factor ratio is filesystem-latency noise " +
      "on a sub-second op, bounded by the min-of-N re-measure."),
    "delete_dv" -> ("The DV build scans every file for matching row " +
      "positions on BOTH layouts (same rows, same key-mod predicate, " +
      "same DV cardinality); the layouts differ only in how rows pack " +
      "into files. A first single-run pass flagged this op at 2.2x and " +
      "the per-op min-of-2 is the bound: identical bytes scanned means " +
      "a residual above-factor ratio here is commit/IO scheduling " +
      "noise on a ~1-2 s op, not a skew shape."))

  def maintenanceSkewBench(spark: SparkSession, sfDir: String): String = {
    if (sys.env.contains("SPARK_GRAFT_SKIP_SKEW"))
      return "{\"skipped\":\"SPARK_GRAFT_SKIP_SKEW set\"}"
    if (!sfDir.stripSuffix("/").endsWith("sf0.1"))
      return "{\"skipped\":\"not an sf0.1 bench dir\"}"
    // CWD-relative default like the bench-log path (r13, ADVICE)
    val outDir = sys.env.getOrElse("SPARK_GRAFT_SKEW_DIR",
      new java.io.File("target/graft_skew").getAbsolutePath)
    val dir =
      try BenchScale.ensureSkew(spark, sfDir, outDir)
      catch { case e: Throwable =>
        System.err.println(s"[bench] skew generation failed: ${e.getMessage}")
        return "{\"skipped\":\"generation failed\"}"
      }
    val docs = graft.tables.Tables.documents(spark, dir)
    val nParts = docs.select("source").distinct().count().toInt
    val skewed = docs.withColumn("part_key", col("source"))
    val uniform = docs.withColumn("part_key",
      pmod(col("doc_id"), lit(nParts)).cast("string"))
    // ONE lifecycle per layout; min-of-2 only flag-triggered (r13, the
    // budget discipline): lifecycle ops are stateful, so the re-measure
    // unit is the whole lifecycle pair — a single-run ratio on a 1-2 s
    // op cannot distinguish a skew tax from one commit's IO hiccup
    // (r12's first smoke run flagged delete_dv at 2.2x that way), but
    // paying four lifecycles unconditionally is what the diagnosed-flag
    // re-measure replaces.
    var (skewOps, skewDelta) = docLifecycle(spark, skewed)
    var (unifOps, unifDelta) = docLifecycle(spark, uniform)
    def ratiosOf: Seq[(String, Double)] = {
      val unifMap = unifOps.toMap
      skewOps.flatMap { case (k, v) =>
        unifMap.get(k).filter(u => u > 0 && v >= 0).map(u => k -> v / u)
      }
    }
    // needs-re-measure and budget-fit reported SEPARATELY (r13 ADVICE):
    // a flag skipped for budget must be distinguishable in the artifact
    // from a run that needed no re-measure
    val needsReMeasure = ratiosOf.exists { case (k, r) =>
      r > MaintSkewFactor && skewOps.toMap.getOrElse(k, 0.0) >= 0.5 &&
        !MaintSkewNotes.contains(k)
    }
    val undiagnosed = needsReMeasure && reMeasureFits(
      (skewOps ++ unifOps).collect { case (_, v) if v > 0 => v }.sum)
    if (undiagnosed) {
      def minMerge(a: Seq[(String, Double)], b: Map[String, Double]) =
        a.map { case (k, v) =>
          val w = b.getOrElse(k, v)
          k -> (if (v < 0 || w < 0) math.max(v, w) else math.min(v, w))
        }
      val (s2, sd2) = docLifecycle(spark, skewed)
      val (u2, ud2) = docLifecycle(spark, uniform)
      skewOps = minMerge(skewOps, s2.toMap)
      unifOps = minMerge(unifOps, u2.toMap)
      skewDelta = math.max(skewDelta, sd2)
      unifDelta = math.max(unifDelta, ud2)
    }
    val ratios = ratiosOf
    val flagged = ratios.collect {
      case (k, r) if r > MaintSkewFactor &&
        skewOps.toMap.getOrElse(k, 0.0) >= 0.5 => "\"" + k + "\""
    }
    def js(kvs: Seq[(String, Double)]): String = kvs
      .map { case (k, v) => "\"" + k + "\":" + num(v) }
      .mkString("{", ",", "}")
    s"""{"partitions":$nParts,"factor":$MaintSkewFactor,""" +
      s""""ops":${js(skewOps)},"uniform":${js(unifOps)},""" +
      s""""remeasured":$undiagnosed,""" +
      s""""remeasure_skipped_over_budget":${needsReMeasure && !undiagnosed},""" +
      s""""ratio_vs_uniform":${js(ratios)},""" +
      s""""converged_files_changed":{"skew":$skewDelta,"uniform":$unifDelta},""" +
      s""""flagged":${flagged.mkString("[", ",", "]")},""" +
      s""""flag_notes":${flagNotesJson(flagged, MaintSkewNotes)}}"""
  }

  /** One documents-table lifecycle run for [[maintenanceSkewBench]]:
    * the table is hive-partitioned by `part_key` and clustered by
    * doc_id. Returns the per-op seconds plus the converged-OPTIMIZE
    * file delta (0 = metadata-only commit — the churn-guard proof). */
  private def docLifecycle(spark: SparkSession, rows: org.apache.spark.sql.DataFrame)
      : (Seq[(String, Double)], Long) = {
    import graft.table.GraftTable
    val out = Seq.newBuilder[(String, Double)]
    def timed[T](name: String)(body: => T): Unit = {
      val t0 = System.nanoTime()
      try {
        body
        out += name -> (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        System.err.println(
          s"[bench] maintenance_skew/$name failed: ${e.getMessage}")
        out += name -> -1.0
      }
    }
    val path =
      graft.GraftTmp.dir("graft_bench_mskew").toString
    var convergedDelta = -1L
    try {
      val t = GraftTable(spark, path, Seq("part_key"))
      timed("write")(t.write(rows.repartition(writeParts(spark, rows))))
      timed("append")(t.write(
        rows.limit(1000).withColumn("doc_id", col("doc_id") + lit(10000000000L)),
        SaveMode.Append))
      timed("optimize")(t.optimize(Seq("doc_id")))
      val before = t.detail().numFiles
      timed("optimize_converged")(t.optimize(Seq("doc_id")))
      convergedDelta = t.detail().numFiles - before
      timed("merge")(
        t.mergeInto(
            t.read().filter(pmod(col("doc_id"), lit(101)) === 0)
              .select("doc_id"),
            Seq("doc_id"))
          .whenMatchedUpdate(Map("n_chars" -> lit(0L)))
          .execute())
      timed("delete_dv")(t.delete(pmod(col("doc_id"), lit(97)) === 0,
        mergeOnRead = true))
      timed("purge")(t.purge())
      timed("vacuum")(t.vacuum(retainHours = 0.0,
        retentionCheckEnabled = false,
        nowMs = System.currentTimeMillis() + 3600 * 1000))
      (out.result(), convergedDelta)
    } finally {
      scala.util.Try(org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(path)))
      ()
    }
  }

  /** Table-layer micro-bench: the write → append → OPTIMIZE → DV DELETE
    * → MERGE → PURGE → VACUUM lifecycle on a lineitem-derived graft
    * table, one wall-clock second count per op. Read queries alone
    * can't see a table-layer regression (commit cost, rewrite planning,
    * vector plumbing) — this gives those a per-round timing trail.
    * Failures report as -1 for the failing op, like the query bench.
    * Per-op MIN-OF-2 (r12): lifecycle ops are stateful, so the
    * re-measure unit is the whole lifecycle — single-run ratios on
    * sub-second ops (point_lookup, vacuum) flagged on GC/IO noise.
    * Since r13 this unconditional min-of-2 runs only at the sf0.1 BASE
    * decade (cheap, and it anchors every ratio); the sf1/sf10
    * lifecycles run once via [[maintBlock]] with a re-run only on an
    * UNdiagnosed flag — the unconditional second sf10 lifecycle was
    * the r12 budget's largest line item. */
  def maintenanceBench(spark: SparkSession, sfDir: String): Seq[(String, Double)] = {
    val a = maintenanceLifecycle(spark, sfDir)
    val b = maintenanceLifecycle(spark, sfDir).toMap
    a.map { case (k, v) =>
      val w = b.getOrElse(k, v)
      k -> (if (v < 0 || w < 0) math.max(v, w) else math.min(v, w))
    }
  }

  /** Byte-targeted writer count for the lifecycle fixtures (r13):
    * parallelism = the source's optimizer size estimate over a 32 MiB
    * per-writer SOURCE bin, floored at the session's parallelism so
    * small fixtures keep every core busy — replacing the fixed
    * `repartition(8)` whose per-writer sort spilled at sf10 (the r12
    * `write` 10.2× flag: 60M rows through 8 sort buffers). The bin is
    * SOURCE bytes, and compressed columnar bytes expand ~4× in the
    * writer's row-based sort buffer, so 32 MiB source ≈ 128 MiB
    * in-memory per writer — a first cut at 128 MiB of source bytes
    * still spilled at sf10 (5 writers × 12M rows, measured 49 s vs the
    * old fixture's 37 s). Write parallelism and final file size stay
    * decoupled exactly as in a production optimized write: OPTIMIZE
    * afterwards bin-packs files toward its 1 GiB target from logged
    * bytes. */
  private def writeParts(spark: SparkSession,
      df: org.apache.spark.sql.DataFrame): Int = {
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    // clamp in BigInt BEFORE toInt: an unknown-stats sentinel
    // (Long.MaxValue) or future huge estimate must saturate at the cap,
    // never wrap through the low 32 bits into an arbitrary count
    val byBytes = ((est / BigInt(32L * 1024 * 1024)) + 1).min(BigInt(2048)).toInt
    math.max(spark.sparkContext.defaultParallelism, byBytes)
  }

  private[graft] def maintenanceLifecycle(spark: SparkSession, sfDir: String): Seq[(String, Double)] = {
    import graft.table.GraftTable
    val out = Seq.newBuilder[(String, Double)]
    def timed[T](name: String)(body: => T): Option[T] = {
      val t0 = System.nanoTime()
      try {
        val r = body
        out += name -> (System.nanoTime() - t0) / 1e9
        Some(r)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] maintenance/$name failed: ${e.getMessage}")
        out += name -> -1.0
        None
      }
    }
    val path = graft.GraftTmp.dir("graft_bench_maint").toString
    try {
      val t = GraftTable(spark, path, Seq("l_returnflag"))
      val li = graft.tables.Tables.lineitem(spark, sfDir)
        .select("l_orderkey", "l_linenumber", "l_quantity",
          "l_extendedprice", "l_returnflag", "l_shipdate")
      timed("write")(t.write(li.repartition(writeParts(spark, li))))
      // the r13 write_repart8 transition fixture (old fixed-8 writer
      // timed beside the byte-targeted one) served its one declared
      // round and is retired — its verdict lives in MaintNotes("write")
      timed("append")(t.write(li.limit(1000), SaveMode.Append))
      // r14: the full re-cluster runs WAVED — byte-budgeted bounded
      // sorts, one commit per wave (optimizeFullWaved): the
      // interruptible form a 100 TB OPTIMIZE needs, and the structural
      // fix for the r13 sf10 14.5× flag (the one-shot global sort paid
      // O(n log n) plus the in-memory→spill transition; per-wave sorts
      // are bounded and never spill). "optimize_waved" is end-to-end
      // (linear in bytes: n/waveBytes bounded sorts), "optimize_wave
      // _max" the per-wave ceiling (the flat-across-decades unit once
      // the table exceeds one wave), "optimize_waves" the wave count.
      // file-size target scaled to the BENCH tables (sf10's whole
      // lineitem subset is under 1 GB compressed, so the production
      // 1 GiB default cannot demonstrate waves at any benched decade):
      // 64 MiB files, 256 MiB waves → sf0.1/sf1 fit in one wave, sf10
      // takes several, and each wave sorts in 4 parallel in-memory
      // range bins. Every optimize call below shares the target so the
      // provenance skip's half-target size test keeps recognizing the
      // waved outputs (incremental stays incremental).
      val liTarget = 64L * 1024 * 1024
      val waveSecs = scala.collection.mutable.ArrayBuffer[Double]()
      timed("optimize_waved") {
        var more = true
        while (more) {
          val w0 = System.nanoTime()
          val vs = t.optimizeFullWaved(Seq("l_orderkey"),
            targetFileSizeBytes = liTarget, maxWaveBytes = 4 * liTarget,
            epoch = "bench-e1", maxWaves = 1)
          if (vs.isEmpty) more = false
          else waveSecs += (System.nanoTime() - w0) / 1e9
        }
      }
      if (waveSecs.nonEmpty) {
        out += "optimize_wave_max" -> waveSecs.max
        out += "optimize_waves" -> waveSecs.size.toDouble
      }
      // r16 (verdict #7): the SAME waved campaign driven through the
      // SQL surface (`OPTIMIZE t ZORDER BY (…) MAX WAVES 1` per
      // statement, per-wave bytes/target/epoch from TBLPROPERTIES) —
      // the user-facing path, timed beside the API path. A fresh epoch
      // forces a full re-cluster of the just-clustered table, so the
      // work is the same shape and the two timings should sit within
      // noise of each other; parser/command drift between the SQL and
      // Scala paths shows up here as a divergence. The statement loop
      // ends when a converged campaign returns zero wave rows.
      val sqlWaves = scala.collection.mutable.ArrayBuffer[Double]()
      // campaign policy as table metadata (how the SQL surface is
      // parameterized) — committed OUTSIDE the timed window
      scala.util.Try(t.setProperties(Map(
        graft.table.GraftTable.TargetFileSizeProp -> liTarget.toString,
        graft.table.GraftTable.MaxWaveBytesProp -> (4 * liTarget).toString,
        graft.table.GraftTable.OptimizeEpochProp -> "bench-sql-e1")))
      timed("optimize_waved_sql") {
        val ref = "graft.`" + path + "`"
        var more = true
        while (more) {
          val w0 = System.nanoTime()
          val n = spark.sql(
            s"OPTIMIZE $ref ZORDER BY (l_orderkey) MAX WAVES 1").count()
          if (n == 0) more = false
          else sqlWaves += (System.nanoTime() - w0) / 1e9
        }
      }
      if (sqlWaves.nonEmpty)
        out += "optimize_waved_sql_waves" -> sqlWaves.size.toDouble
      // the daily-loop shapes the full-table ratio above deliberately
      // ISN'T: a second same-key OPTIMIZE after a small append must
      // converge via the provenance skip (only the appended tail
      // re-clusters), and a WHERE-scoped OPTIMIZE compacts one churned
      // partition while untouched partitions' files carry over unread
      timed("optimize_incremental") {
        t.write(li.limit(2000), SaveMode.Append)
        t.optimize(Seq("l_orderkey"), liTarget)
      }
      // a THIRD optimize with nothing new must converge to a metadata-
      // only commit (per-partition churn guard: every partition is one
      // provenance-matched clustered set, nothing to combine)
      timed("optimize_converged")(t.optimize(Seq("l_orderkey"), liTarget))
      timed("optimize_scoped")(
        t.optimize(Seq("l_orderkey"), liTarget,
          where = Some("l_returnflag = 'A'")))
      // narrow-source sync merge: keys + one changed column (before the
      // DV delete — its copy-on-write rewrite would materialize the
      // vectors and leave purge nothing to do)
      timed("merge")(
        t.mergeInto(
            t.read().filter(pmod(col("l_orderkey"), lit(101)) === 0)
              .select(col("l_orderkey"), col("l_linenumber"))
              .distinct() // the append above duplicated 1000 rows
              .withColumn("l_quantity", lit(1.0)),
            Seq("l_orderkey", "l_linenumber"))
          .whenMatchedUpdate(Map("l_quantity" -> col("source.l_quantity")))
          .execute())
      // ~1% of rows, spread across every file: the DV commit is
      // metadata-sized while a copy-on-write delete would rewrite all
      timed("delete_dv")(t.delete(pmod(col("l_orderkey"), lit(97)) === 0,
        mergeOnRead = true))
      timed("purge")(t.purge())
      timed("vacuum")(t.vacuum(retainHours = 0.0,
        retentionCheckEnabled = false,
        nowMs = System.currentTimeMillis() + 3600 * 1000))
      // bloom index lifecycle: backfill cost over the whole table, then
      // a single-key read through the indexed scan (the 100 TB point-
      // lookup path: file pruning from sidecar proofs, not a full scan)
      timed("bloom_build") {
        t.setProperties(Map(graft.table.BloomIndex.ColumnsProp -> "l_orderkey"))
        t.buildBloomIndex()
      }
      timed("point_lookup")(
        spark.read.format("graft").load(path)
          .filter(col("l_orderkey") === 449L).count())
      // incremental MV lifecycle: full materialization once, then a
      // refresh that pays only an appended batch's change feed — the
      // refresh should be a small fraction of the create
      val mvPath = path + "_mv"
      timed("mv_create")(graft.table.MaterializedView.create(
        spark, mvPath, t, Seq("l_returnflag"), Seq("l_quantity")))
      timed("mv_refresh") {
        t.write(li.limit(5000), SaveMode.Append)
        graft.table.MaterializedView.refresh(spark, mvPath)
      }
      out.result()
    } finally {
      Seq(path, path + "_w8", path + "_mv").foreach(p =>
        scala.util.Try(org.apache.commons.io.FileUtils.deleteDirectory(
          new java.io.File(p))))
      ()
    }
  }
}
