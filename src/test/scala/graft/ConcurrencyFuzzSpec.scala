package graft

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import graft.table.GraftTable

/** Randomized many-writer stress over one table: N threads interleave a
  * seeded-random mix of append / idempotent append / copy-on-write and
  * merge-on-read DELETE / MERGE / OPTIMIZE / setProperties commits,
  * then the final state is checked against a per-thread model.
  *
  * What the targeted two-thread races in MutationSpec cannot pin, this
  * does: the WriteSerializable conflict matrix under arbitrary
  * interleavings — every landed commit must serialize (no lost update,
  * no double-applied idempotent batch, no dropped concurrent append,
  * one history row per version), with stale-snapshot rewrites either
  * carried correctly or aborted loudly (the app-level retry here is
  * exactly what a production writer does on
  * ConcurrentModificationException).
  *
  * Determinism: thread t draws from Random(0xF00D + t); the
  * INTERLEAVING still varies run to run — the invariants hold for every
  * interleaving, which is the point. Each thread owns a disjoint id
  * space (tid·10^7 + counter) so the model is exact: cross-thread
  * conflicts happen at the COMMIT level (claim races, carried files, DV
  * divergence, property merges), which is the layer under test.
  */
class ConcurrencyFuzzSpec extends SparkSpec {

  test("fuzz: mixed-op many-writer interleavings keep every invariant") {
    import spark.implicits._
    val path = graft.GraftTmp.dir("gt_fuzz").toString
    val seedT = GraftTable(spark, path, Nil)
    seedT.write(Seq((-1L, 0L)).toDF("id", "v"))

    val nThreads = 6
    val opsPerThread = 16
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    // abandonment accounting: retried() may abandon an op after its
    // conflict-retry budget, which keeps the invariants honest under CI
    // scheduler pressure — but a commit path that conflicted FOREVER
    // would otherwise pass vacuously with near-zero landed ops. Count
    // both sides and assert a landed-ops floor at the end.
    val landedOps = new java.util.concurrent.atomic.AtomicInteger(0)
    val abandonedOps = new java.util.concurrent.atomic.AtomicInteger(0)
    // per-thread expected final state, written only after a landed op
    val models = Array.fill(nThreads)(
      scala.collection.mutable.Map.empty[Long, Long])
    val lastProp = new Array[Long](nThreads)

    def worker(tid: Int): Thread = new Thread(() => {
      val t = GraftTable(spark, path, Nil)
      val rnd = new scala.util.Random(0xF00D + tid)
      val model = models(tid)
      var nextId = tid.toLong * 10_000_000L
      var txnV = 0L
      def freshIds(k: Int): Seq[Long] = {
        val ids = (nextId until nextId + k)
        nextId += k
        ids
      }
      // a stale-snapshot rewrite abort is the documented app contract:
      // retry against the new snapshot (all our ops are idempotent by
      // construction — absolute assignments, id-range deletes). Returns
      // whether the op LANDED: commits are atomic, so a retry budget
      // exhausted under contention (6 writers on an overloaded CI box)
      // abandons the op cleanly — the caller skips its model update and
      // every invariant still holds. Failing the test there would turn
      // scheduler pressure into a false conflict-matrix alarm.
      def retried(body: => Unit): Boolean = {
        var attempts = 0
        while (attempts <= 60) {
          try { body; landedOps.incrementAndGet(); return true }
          catch {
            case _: java.util.ConcurrentModificationException =>
              attempts += 1
              Thread.sleep(3L * attempts)
          }
        }
        abandonedOps.incrementAndGet()
        false
      }
      for (op <- 1 to opsPerThread) {
        val opVal = tid.toLong * 1000 + op
        rnd.nextInt(6) match {
          case 0 => // plain append
            val ids = freshIds(5 + rnd.nextInt(10))
            t.write(ids.map(_ -> opVal).toDF("id", "v"), SaveMode.Append)
            ids.foreach(model(_) = opVal)
          case 1 => // idempotent append, deliberately submitted twice:
            // the replay MUST be a no-op (None), never a double apply
            val ids = freshIds(5)
            txnV += 1
            val first = t.idempotentAppend(
              ids.map(_ -> opVal).toDF("id", "v"), s"fuzz-app-$tid", txnV)
            val replay = t.idempotentAppend(
              ids.map(_ -> opVal).toDF("id", "v"), s"fuzz-app-$tid", txnV)
            if (first.isEmpty) errs.add(s"t$tid op$op: first txn write skipped")
            if (replay.nonEmpty) errs.add(s"t$tid op$op: txn replay applied")
            ids.foreach(model(_) = opVal)
          case 2 => // delete a random chunk of OWN landed ids
            val own = model.keys.toSeq.sorted
            if (own.nonEmpty) {
              val lo = own(rnd.nextInt(own.size))
              val hi = lo + 1 + rnd.nextInt(8)
              val mor = rnd.nextBoolean()
              if (retried(t.delete(
                col("id") >= lo && col("id") < hi &&
                  col("id") >= tid.toLong * 10_000_000L &&
                  col("id") < (tid + 1).toLong * 10_000_000L,
                mergeOnRead = mor)))
                (lo until hi).foreach(model.remove)
            }
          case 3 => // merge: absolute-value upsert over own space
            val own = model.keys.toSeq.sorted
            val updates = own.take(5)
            val inserts = freshIds(3 + rnd.nextInt(5))
            val src = (updates ++ inserts).map(_ -> opVal).toDF("id", "v")
            if (retried(
              t.mergeInto(src, Seq("id"))
                .whenMatchedUpdate(Map("v" -> col("source.v")))
                .whenNotMatchedInsert(
                  Map("id" -> col("source.id"), "v" -> col("source.v")))
                .execute()))
              (updates ++ inserts).foreach(model(_) = opVal)
          case 4 => // compaction: must never change any row
            retried(t.optimize(Seq("id"), targetFileSizeBytes = 1 << 20)); ()
          case 5 => // property set: a later unrelated commit must not
            // revert it (property deltas recompute over the claimed base);
            // record the expectation only for a LANDED commit
            if (retried(t.setProperties(Map(s"fuzz.t$tid" -> opVal.toString))))
              lastProp(tid) = opVal
        }
      }
    })

    val threads = (0 until nThreads).map(worker)
    threads.foreach(th =>
      th.setUncaughtExceptionHandler((_, e) => errs.add(s"uncaught: $e")))
    threads.foreach(_.start())
    threads.foreach(_.join(600000))
    assert(errs.isEmpty, s"fuzz errors: ${errs.toArray.mkString("; ")}")
    // throughput floor: conflicts must resolve, not livelock — at least
    // 80% of retried ops have to LAND across all threads, or the state
    // checks below would be validating a near-empty table. (Un-retried
    // ops — plain/idempotent appends — throw and fail the test directly.)
    val landed = landedOps.get(); val abandoned = abandonedOps.get()
    info(s"retried ops: landed=$landed abandoned=$abandoned")
    assert(landed + abandoned == 0 ||
      landed.toDouble / (landed + abandoned) >= 0.8,
      s"conflict livelock: only $landed/${landed + abandoned} retried ops landed")

    val t = GraftTable(spark, path, Nil)
    // 1) exact row accounting: union of the disjoint per-thread models
    //    (plus the seed row) — any lost update, dropped carried file,
    //    resurrected delete or double-applied txn breaks this equality
    val expected = models.flatten.toMap + (-1L -> 0L)
    val got = t.read().as[(Long, Long)].collect().toMap
    assert(got.size == t.read().count(), "duplicate ids in final state")
    assert(got == expected,
      s"state diverged: missing=${(expected.keySet -- got.keySet).take(5)} " +
        s"extra=${(got.keySet -- expected.keySet).take(5)} " +
        s"changed=${expected.collect {
          case (k, v) if got.get(k).exists(_ != v) => k }.take(5)}")
    // 2) every thread's LAST property value survived all later commits
    (0 until nThreads).foreach { tid =>
      if (lastProp(tid) != 0)
        assert(t.properties.get(s"fuzz.t$tid").contains(lastProp(tid).toString),
          s"t$tid property lost: ${t.properties.get(s"fuzz.t$tid")}")
    }
    // 3) serializable history: versions are gapless and singly-claimed
    val hist = t.history().select("version").as[Long].collect().sorted
    assert(hist.toSeq == (0L to t.currentVersion),
      s"history gaps: ${hist.length} rows for v0..${t.currentVersion}")
    // 4) every retained version still reconstructs (snapshot fold sane
    //    across the whole interleaved log) — spot-check a sample
    val sample = (0L to t.currentVersion by math.max(1, t.currentVersion / 8))
    sample.foreach(v => t.readVersion(v).count())
  }
}
