package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench harness's artifact-assembly contracts — the pieces
  * whose failure modes r12 proved are round-killing (a malformed or
  * missing JSON line is a hard-gate miss even when every query is
  * fast). Pure-helper tests only: the measured sections are exercised
  * by the bench run itself.
  */
class BenchSpec extends AnyFunSuite {

  private def parse(json: String): Map[String, String] = {
    // minimal flat {"k":"v",...} reader for the note objects under test
    val inner = json.stripPrefix("{").stripSuffix("}")
    if (inner.isEmpty) Map.empty
    else inner.split("(?<!\\\\)\",\"").map { kv =>
      val Array(k, v) = kv.split("\":\"", 2)
      k.stripPrefix("\"") -> v.stripSuffix("\"")
    }.toMap
  }

  test("flagNotesJson: diagnosed note for a flagged key, auto-note otherwise") {
    val json = Bench.flagNotesJson(
      Seq("\"optimize\"", "\"mystery_op\""),
      Map("optimize" -> "full-table re-cluster, O(n log n) by contract"))
    val notes = parse(json)
    assert(notes("optimize").contains("re-cluster"))
    assert(notes("mystery_op").contains("UNDIAGNOSED"))
  }

  test("flagNotesJson: quotes and backslashes in notes are escaped") {
    val json = Bench.flagNotesJson(Seq("\"op\""),
      Map("op" -> """ratio "spiked" at C:\tmp"""))
    // the emitted object must be well-formed JSON despite the specials
    assert(json.contains("\\\"spiked\\\""))
    assert(json.contains("C:\\\\tmp"))
    // and round-trips through a real JSON parser shape: no bare quote
    // may appear inside the value region
    val body = json.stripPrefix("{\"op\":\"").stripSuffix("\"}")
    assert(!body.replace("\\\"", "").replace("\\\\", "").contains("\""))
  }

  test("flagNotesJson: control characters never reach the artifact raw") {
    // exception messages carry plan trees: a raw \n in any assembled
    // string would split the one-line artifact and poison the
    // line-oriented BENCH_LOCAL.jsonl lineage
    val json = Bench.flagNotesJson(Seq("\"op\""),
      Map("op" -> "line1\nline2\ttab\rretctl"))
    assert(!json.exists(_ < ' '), "no raw control char may survive")
    assert(json.contains("\\n") && json.contains("\\t") &&
      json.contains("\\r") && json.contains("\\u0001"))
  }

  test("sweepStaleTmp: namespaced — stale dirs inside graft-tmp swept, " +
      "top-level tmpdir never touched") {
    val tmp = new java.io.File(sys.props("java.io.tmpdir"))
    val old = System.currentTimeMillis() - 3 * 3600 * 1000L
    def mk(parent: java.io.File, name: String, stale: Boolean): java.io.File = {
      val d = new java.io.File(parent, name)
      d.mkdirs()
      java.nio.file.Files.writeString(d.toPath.resolve("x"), "x")
      if (stale) d.setLastModified(old)
      d
    }
    val root = graft.GraftTmp.root.toFile
    val swept = mk(root, "gt_sweepspec" + System.nanoTime(), stale = true)
    val young = mk(root, "gt_sweepspec" + (System.nanoTime() + 7),
      stale = false)
    // a stale dir at the tmpdir TOP LEVEL — even one matching an old
    // graft fixture prefix — is outside the sweep's blast radius: the
    // r15 prefix-heuristic top-level sweep is retired (ADVICE r16)
    val topLevel = mk(tmp, "gt_sweepspec_top" + System.nanoTime(),
      stale = true)
    // standing indexes live at the top level too and must survive
    val standing = mk(tmp, "graft_postings_" + System.nanoTime(),
      stale = true)
    try {
      Bench.sweepStaleTmp()
      assert(!swept.exists(), "stale namespace fixture must be swept")
      assert(young.exists(), "young namespace dirs must be spared")
      assert(topLevel.exists(), "top-level tmpdir dirs must never be touched")
      assert(standing.exists(), "standing indexes must be spared")
    } finally Seq(young, topLevel, standing).foreach { d =>
      Option(d.listFiles()).foreach(_.foreach(_.delete())); d.delete()
    }
  }

  test("withTmpDelta: splices the fixture delta into assembled section JSON") {
    assert(Bench.withTmpDelta("""{"ops":{"write":1.0}}""", 3) ==
      """{"tmp_delta":3,"ops":{"write":1.0}}""")
    assert(Bench.withTmpDelta("{}", 0) == """{"tmp_delta":0}""")
    // non-object payloads (defensive) pass through untouched
    assert(Bench.withTmpDelta("null", 1) == "null")
  }

  test("flagNotesJson: voluntary watch notes merge; flagged diagnosis wins") {
    val json = Bench.flagNotesJson(
      Seq("\"a\""),
      Map("a" -> "diagnosed"),
      voluntary = Map("a" -> "voluntary-must-lose", "b" -> "watching b"))
    val notes = parse(json)
    assert(notes("a") == "diagnosed")
    assert(notes("b") == "watching b")
  }

  test("maintBlock: no flag means exactly one lifecycle run") {
    var runs = 0
    val (json, m) = Bench.maintBlock(
      () => { runs += 1; Seq("write" -> 2.0, "optimize" -> 3.0) },
      base = Map("write" -> 1.0, "optimize" -> 1.0),
      ratioKey = "ratio_vs_base", factor = 10)
    assert(runs == 1)
    assert(m.toMap.apply("write") == 2.0)
    assert(json.contains("\"remeasured\":false"))
    assert(json.contains("\"flagged\":[]"))
  }

  test("maintBlock: a DIAGNOSED above-factor ratio does not trigger a re-run") {
    // "optimize_waved" carries a MaintNotes diagnosis (linear at the
    // factor, like write/purge) — a noise excursion over the factor
    // must not re-buy the 520 s sf10 lifecycle (the r12 budget's
    // largest line item)
    assert(Bench.MaintNotes.contains("optimize_waved"))
    var runs = 0
    val (json, _) = Bench.maintBlock(
      () => { runs += 1; Seq("optimize_waved" -> 20.0) },
      base = Map("optimize_waved" -> 1.0),
      ratioKey = "r", factor = 10)
    assert(runs == 1)
    assert(json.contains("\"flagged\":[\"optimize_waved\"]"))
    assert(json.contains("waves")) // the diagnosed note shipped
  }

  test("maintBlock: an UNdiagnosed flag earns one min-merged re-run") {
    assert(!Bench.MaintNotes.contains("mystery_op"))
    var runs = 0
    val (json, m) = Bench.maintBlock(
      () => {
        runs += 1
        // noisy first run, clean second: the min must survive
        Seq("mystery_op" -> (if (runs == 1) 20.0 else 5.0))
      },
      base = Map("mystery_op" -> 1.0),
      ratioKey = "r", factor = 10)
    assert(runs == 2)
    assert(m.toMap.apply("mystery_op") == 5.0)
    assert(json.contains("\"remeasured\":true"))
    // 5.0 / 1.0 is back under the factor: the noise flag died
    assert(json.contains("\"flagged\":[]"))
  }

  test("maintBlock: a failed re-run never erases a real first measurement") {
    var runs = 0
    val (_, m) = Bench.maintBlock(
      () => {
        runs += 1
        Seq("mystery_op" -> 20.0,
          "flaky_op" -> (if (runs == 1) 4.0 else -1.0))
      },
      base = Map("mystery_op" -> 1.0, "flaky_op" -> 1.0),
      ratioKey = "r", factor = 10)
    assert(runs == 2)
    // the re-run (triggered by mystery_op) failed flaky_op: the
    // max(v, w) merge keeps the valid 4.0 sample — min-merging the -1
    // sentinel would report a real op as faster-than-possible, and
    // only a BOTH-runs failure may surface as -1
    assert(m.toMap.apply("flaky_op") == 4.0)
    assert(m.toMap.apply("mystery_op") == 20.0)
  }

  test("maintBlock: an exhausted budget skips the undiagnosed re-run") {
    // simulate a run that has already spent its budget: the re-measure
    // gate must refuse the second lifecycle rather than recreate the
    // mid-section kill the budget guard exists to prevent
    Bench.withBudgetForTest(budgetSec = 0.001) {
      var runs = 0
      val (json, _) = Bench.maintBlock(
        () => { runs += 1; Seq("mystery_op" -> 20.0) },
        base = Map("mystery_op" -> 1.0),
        ratioKey = "r", factor = 10)
      assert(runs == 1)
      assert(json.contains("\"remeasured\":false"))
      assert(json.contains("\"remeasure_skipped_over_budget\":true"))
    }
  }

  test("indexed pairs: every twin is registered with the oracle of its scratch sibling") {
    val qs = SparkEntry.queries
    val oracles = SparkEntry.oracleSql
    Bench.IndexedPairs.foreach { case (scratch, indexed) =>
      assert(qs.contains(scratch), s"missing scratch query $scratch")
      assert(qs.contains(indexed), s"missing indexed twin $indexed")
      assert(oracles(scratch) == oracles(indexed),
        s"$indexed must share $scratch's oracle (bit-identical contract)")
    }
  }

  test("priorFinalRuns: parses only same-sf FINAL lines with query maps") {
    val dir = graft.GraftTmp.dir("bench_lineage")
    val log = dir.resolve("BENCH_LOCAL.jsonl")
    def wrap(runId: Long, bench: String): String =
      s"""{"ts_ms":1,"run_id":$runId,"bench":$bench}"""
    java.nio.file.Files.writeString(log, Seq(
      // partial line: skipped
      wrap(1, """{"metric":"total","value":40.0,"partial":true,"queries":{"q1":1.0},"sf":"/d/sf0.1"}"""),
      // final line, matching sf: kept
      wrap(2, """{"metric":"total","value":46.8,"partial":false,"noise_band":{"p50":1.1},"queries":{"q1":1.5,"q2":2.25E-1},"maintenance":{"queries":{"decoy":9.9}},"sf":"/d/sf0.1"}"""),
      // final line, other sf: skipped
      wrap(3, """{"metric":"total","value":9.0,"partial":false,"queries":{"q1":0.5},"sf":"/d/sf0.01"}"""),
      // compact summary (no query map): skipped
      wrap(4, """{"metric":"total","value":46.8,"partial":false,"compact":true,"sf":"/d/sf0.1"}""")
    ).mkString("\n") + "\n")
    val runs = Bench.priorFinalRuns(log.toString, "/d/sf0.1")
    assert(runs.map(_.runId) == Seq(2L))
    assert(runs.head.total == 46.8)
    // the FIRST queries map on the line (the headline one), decoys in
    // section payloads ignored; scientific notation parses
    assert(runs.head.queries == Map("q1" -> 1.5, "q2" -> 0.225))
    assert(Bench.priorFinalRuns(dir.resolve("absent.jsonl").toString,
      "/d/sf0.1").isEmpty)
  }

  test("jsonObjectAfter: balanced, string-aware brace matching") {
    val line =
      """{"a":{"x":{"y":1},"s":"br{ace\"}"},"b":{"z":2},"bb":{"w":3}}"""
    assert(Bench.jsonObjectAfter(line, "b").contains("""{"z":2}"""))
    // nested objects and braces/escaped quotes inside strings span fine
    assert(Bench.jsonObjectAfter(line, "a")
      .contains("""{"x":{"y":1},"s":"br{ace\"}"}"""))
    // exact-key tag: "b" must not match "bb"'s payload
    assert(Bench.jsonObjectAfter(line, "bb").contains("""{"w":3}"""))
    assert(Bench.jsonObjectAfter(line, "missing").isEmpty)
  }

  test("querySetHash: order-insensitive, membership-sensitive") {
    val h1 = Bench.querySetHash(Seq("a", "b", "c"))
    assert(h1 == Bench.querySetHash(Seq("c", "a", "b")))
    assert(h1 != Bench.querySetHash(Seq("a", "b")))
    assert(h1.matches("[0-9a-f]{12}"))
  }

  private def writeLog(lines: Seq[String]): String = {
    val dir = graft.GraftTmp.dir("bench_lineage")
    val log = dir.resolve("BENCH_LOCAL.jsonl")
    java.nio.file.Files.writeString(log, lines.mkString("\n") + "\n")
    log.toString
  }

  private def wrap(runId: Long, bench: String): String =
    s"""{"ts_ms":1,"run_id":$runId,"bench":$bench}"""

  test("priorSectionRuns: extracts a section's flat map despite nested objects") {
    val log = writeLog(Seq(
      wrap(7, """{"metric":"total","value":9.0,"code":"abc123","partial":false,"queries":{"q1":1.0},"sf10":{"pre_state":{"tmp_entries":5},"queries":{"hv":10.0,"lt":2.0},"ratio":{"hv":9.0}},"maintenance_sf10":{"ops":{"write":3.0},"flag_notes":{"w":"a {brace} note"}},"sf":"/d/sf0.1"}"""),
      // partial lines and other-sf lines are excluded
      wrap(8, """{"metric":"total","value":9.0,"partial":true,"sf10":{"queries":{"hv":1.0}},"sf":"/d/sf0.1"}"""),
      wrap(9, """{"metric":"total","value":9.0,"partial":false,"sf10":{"queries":{"hv":1.0}},"sf":"/d/sf0.01"}""")))
    val runs = Bench.priorSectionRuns(log, "/d/sf0.1", "sf10", "queries")
    assert(runs.map(_._1) == Seq(7L))
    assert(runs.head._2.contains("abc123"))
    assert(runs.head._3 == Map("hv" -> 10.0, "lt" -> 2.0))
    val maint = Bench.priorSectionRuns(log, "/d/sf0.1",
      "maintenance_sf10", "ops")
    assert(maint.head._3 == Map("write" -> 3.0))
    // a section absent from every line yields no prior runs
    assert(Bench.priorSectionRuns(log, "/d/sf0.1", "skew", "skew").isEmpty)
  }

  test("sectionLoadGuard: clean section → null flag, map untouched") {
    val log = writeLog(Seq(wrap(7,
      """{"metric":"total","value":9.0,"partial":false,"sf10":{"queries":{"a":10.0,"b":2.0,"c":1.0}},"sf":"/d/sf0.1"}""")))
    val cur = Map("a" -> 10.5, "b" -> 2.1, "c" -> 0.9)
    val (merged, flag) = Bench.sectionLoadGuard("sf10", "queries", log,
      "/d/sf0.1", cur, Some(() => fail("clean run must not re-run")))
    assert(flag == "null")
    assert(merged == cur)
  }

  test("sectionLoadGuard: inflated section re-runs once and recovers") {
    val log = writeLog(Seq(wrap(7,
      """{"metric":"total","value":9.0,"partial":false,"sf10":{"queries":{"a":10.0,"b":2.0,"c":1.0}},"sf":"/d/sf0.1"}""")))
    val inflated = Map("a" -> 15.0, "b" -> 3.0, "c" -> 1.5)
    var reRan = 0
    val (merged, flag) = Bench.sectionLoadGuard("sf10", "queries", log,
      "/d/sf0.1", inflated,
      Some(() => { reRan += 1; Map("a" -> 10.2, "b" -> 2.0, "c" -> 1.0) }))
    assert(reRan == 1)
    assert(flag.contains("recovered_by_rerun"))
    assert(merged("a") == 10.2, "min-merge must keep the clean re-run")
  }

  test("sectionLoadGuard: persistent inflation stamps the flag with the vector") {
    val log = writeLog(Seq(wrap(7,
      """{"metric":"total","value":9.0,"partial":false,"code":"other999","sf10":{"queries":{"a":10.0,"b":2.0,"c":1.0}},"sf":"/d/sf0.1"}""")))
    val inflated = Map("a" -> 15.0, "b" -> 3.0, "c" -> 1.5)
    val (_, flag) = Bench.sectionLoadGuard("sf10", "queries", log,
      "/d/sf0.1", inflated, Some(() => inflated))
    assert(flag.contains("\"median_inflation\":1.500"))
    assert(flag.contains("\"re_ran\":true"))
    assert(flag.contains("top_inflation"))
    // the prior line carries a different code fingerprint: noted, so a
    // real cross-version regression is attributable (r16, ADVICE)
    assert(flag.contains("\"code_mismatch\":true"))
  }

  test("sectionLoadGuard: exhausted budget skips the re-run but still flags") {
    val log = writeLog(Seq(wrap(7,
      """{"metric":"total","value":9.0,"partial":false,"sf10":{"queries":{"a":10.0,"b":2.0,"c":1.0}},"sf":"/d/sf0.1"}""")))
    Bench.withBudgetForTest(budgetSec = 0.001) {
      val inflated = Map("a" -> 15.0, "b" -> 3.0, "c" -> 1.5)
      val (_, flag) = Bench.sectionLoadGuard("sf10", "queries", log,
        "/d/sf0.1", inflated,
        Some(() => fail("over-budget guard must not re-run")))
      assert(flag.contains("\"re_ran\":false"))
      assert(flag.contains("median_inflation"))
    }
  }

  test("priorFinalRuns: parses the r16 set hash and code fields when present") {
    val log = writeLog(Seq(
      wrap(2, """{"metric":"total","value":46.8,"query_set_hash":"deadbeef0123","code":"abc-dirty","partial":false,"queries":{"q1":1.5},"sf":"/d/sf0.1"}"""),
      wrap(3, """{"metric":"total","value":50.0,"partial":false,"queries":{"q1":1.7},"sf":"/d/sf0.1"}""")))
    val runs = Bench.priorFinalRuns(log, "/d/sf0.1")
    assert(runs.size == 2)
    assert(runs.head.setHash.contains("deadbeef0123"))
    assert(runs.head.code.contains("abc-dirty"))
    assert(runs(1).setHash.isEmpty && runs(1).code.isEmpty)
  }

  test("maintBlock: section guard min-merges a load re-run and stamps load_flag") {
    val log = writeLog(Seq(wrap(7,
      """{"metric":"total","value":9.0,"partial":false,"maintenance_sf10":{"ops":{"write":3.0,"merge":4.0}},"sf":"/d/sf0.1"}""")))
    var runs = 0
    val (json, m) = Bench.maintBlock(
      () => { runs += 1
        if (runs == 1) Seq("write" -> 6.0, "merge" -> 8.0)
        else Seq("write" -> 3.1, "merge" -> 4.1) },
      base = Map("write" -> 1.0, "merge" -> 1.0),
      ratioKey = "r", factor = 10,
      guard = Some(("maintenance_sf10", log, "/d/sf0.1")))
    assert(runs == 2, "2x-inflated lifecycle must earn the guard re-run")
    assert(m.toMap.apply("write") == 3.1)
    assert(json.contains("\"load_flag\":{\"recovered_by_rerun\""))
  }

  test("preferredPrior: same-set same-code first, unknown hashes admitted") {
    import Bench.PriorRun
    def run(id: Long, total: Double, hash: Option[String],
        code: Option[String]) =
      PriorRun(id, total, Map("q" -> 1.0), hash, code)
    val h = "aaaaaaaaaaaa"
    val all = Seq(
      run(1, 10.0, Some(h), Some("codeA")),        // same set+code, slow
      run(2, 20.0, Some(h), Some("codeA")),        // same set+code, slower
      run(3, 5.0, Some(h), Some("codeB")),         // same set, other code
      run(4, 1.0, Some("bbbbbbbbbbbb"), Some("codeA")), // other set, fastest
      run(5, 7.0, None, None))                     // pre-r16 line: unknown
    // same-code pool wins even when a cross-code/cross-set run is faster
    assert(Bench.preferredPrior(all, h, "codeA").map(_.runId).contains(1L))
    // no same-code prior → best of the same-set pool (unknown hash
    // counts as same-set: pre-r16 lines must not disable the guard)
    assert(Bench.preferredPrior(all, h, "codeZ").map(_.runId).contains(3L))
    // nothing matches the set → best overall (the caller notes mismatch)
    val otherSet = all.filterNot(_.setHash.forall(_ == h))
    assert(Bench.preferredPrior(otherSet, h, "codeZ").map(_.runId)
      .contains(4L))
    assert(Bench.preferredPrior(Nil, h, "codeA").isEmpty)
  }

  test("headline set stays disjoint from the standing-state families") {
    // indexed twins and incremental ops are benched in their own
    // pinned-state sections; the headline's min-of-N assumes run N is
    // independent of run N-1
    val banned = Bench.IndexedPairs.map(_._2).toSet ++
      Set("dedup_incremental", "knn_incremental", "knn_stream_index")
    assert(Bench.Headline.toSet.intersect(banned).isEmpty)
  }
}
