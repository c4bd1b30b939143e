package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Media
import graft.queries.Relational
import graft.streaming.Streaming

class StreamingSpec extends SparkSpec {

  test("streaming daily counts equal the batch aggregation") {
    val streamed = Streaming.streamingDailyCounts(spark, sf)
    val batch = graft.tables.Tables.events(spark, sf)
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("total_value"))
      .orderBy("day", "event_type")
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("streaming dedup matches distinct counts") {
    val streamed = Streaming.streamingDedupCounts(spark, sf)
    val n = streamed.agg(sum("cnt")).collect()(0).getLong(0)
    assert(n == graft.tables.Tables.events(spark, sf)
      .select("event_id").distinct().count())
  }

  test("sliding windows double-count each event") {
    val total = Streaming.streamingSlidingValue(spark, sf)
      .agg(sum("cnt")).collect()(0).getLong(0)
    assert(total == 2 * graft.tables.Tables.events(spark, sf).count())
  }

  test("stream-stream interval join equals the batch range join") {
    val streamed = Streaming.streamingIntervalJoin(spark, sf)
    val ev = graft.tables.Tables.events(spark, sf)
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("view_id"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
    val batch = v.join(p,
        col("v_user") === col("p_user") &&
          col("p_ts") >= col("v_ts") &&
          col("p_ts") <= col("v_ts") + expr("INTERVAL 2 HOURS"))
      .select(col("view_id"), col("purchase_id"), col("v_user").as("user_id"),
        (unix_micros(col("p_ts")) - unix_micros(col("v_ts"))).as("gap_us"))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }
}

class StreamingTableSpec extends SparkSpec {

  test("foreachBatch merge ingest lands every event exactly once") {
    val path = graft.GraftTmp.dir("graft_stream_tbl").toString
    val table = Streaming.streamIntoTable(spark, sf, path)
    val ev = graft.tables.Tables.events(spark, sf)
    assert(table.read().count() == ev.select("event_id").distinct().count())
    // first micro-batch bootstraps the table; later batches are MERGEs
    val ops = table.history().select("operation")
      .collect().map(_.getString(0)).toSet
    assert(ops.subsetOf(Set("WRITE", "MERGE")))
    // re-running the same stream over the same table changes nothing
    // (upsert idempotence) and commits as MERGE
    val table2 = graft.table.GraftTable(spark, path, Seq("event_type"))
    val before = table2.read().count()
    Streaming.streamIntoTable(spark, sf, path)
    assert(table2.read().count() == before)
    val ops2 = table2.history().select("operation")
      .collect().map(_.getString(0)).toSet
    assert(ops2.contains("MERGE"))
  }

  test("readStream.format(graft): snapshot, incremental appends, update row versions — exactly once") {
    import spark.implicits._
    val path = graft.GraftTmp.dir("graft_stream_src").toString
    val t = graft.table.GraftTable(spark, path, Seq("grp"))
    val half1 = (0 until 500).map(i => (i.toLong, if (i % 2 == 0) "a" else "b", i * 1.0))
      .toDF("id", "grp", "v")
    t.write(half1)
    val name = s"graft_read_stream_${System.nanoTime()}"
    val q = spark.readStream.format("graft").load(path)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table(name).count() == 500)          // initial snapshot
      val half2 = (500 until 800).map(i => (i.toLong, "a", i * 1.0)).toDF("id", "grp", "v")
      t.write(half2, org.apache.spark.sql.SaveMode.Append)
      q.processAllAvailable()
      assert(spark.table(name).count() == 800)          // only new rows flowed
      t.update(col("id") === 7L, Map("v" -> lit(-1.0)))
      q.processAllAvailable()
      // the rewritten file's carried-over rows do NOT reflow; only the
      // changed row's new version does
      assert(spark.table(name).count() == 801)
      assert(spark.table(name).filter(col("id") === 7L && col("v") === -1.0).count() == 1)
      assert(spark.table(name).select("id").distinct().count() == 800)
    } finally q.stop()
    // startingVersion: consume only changes after v0 (no initial snapshot)
    val name2 = s"graft_read_stream_sv_${System.nanoTime()}"
    val q2 = spark.readStream.format("graft").option("startingVersion", "0").load(path)
      .writeStream.format("memory").queryName(name2).outputMode("append").start()
    try {
      q2.processAllAvailable()
      assert(spark.table(name2).count() == 301)         // 300 appends + 1 new row version
    } finally q2.stop()
  }

  test("exactly-once ingest: replayed batches are skipped via txnAppId/txnVersion") {
    val path = graft.GraftTmp.dir("graft_txn_tbl").toString
    val table = Streaming.streamIntoTableExactlyOnce(spark, sf, path)
    val n = table.read().count()
    assert(n == graft.tables.Tables.events(spark, sf).count())
    assert(table.lastTxnVersion(Streaming.IngestAppId) >= 0)
    // replay the whole stream (a restart with a stale checkpoint): every
    // batch id was already committed → all skipped, row count unchanged
    Streaming.streamIntoTableExactlyOnce(spark, sf, path)
    assert(table.read().count() == n)
    // direct API: same-version append is a no-op, newer version commits
    val one = table.read().limit(1)
    assert(table.idempotentAppend(one, "other-app", 0L).isDefined) // fresh app id
    assert(table.idempotentAppend(one, "other-app", 0L).isEmpty)   // replay skipped
    assert(table.read().count() == n + 1)
    assert(table.idempotentAppend(one, "other-app", 1L).isDefined)
    assert(table.read().count() == n + 2)
    assert(table.lastTxnVersion("other-app") == 1L)
    assert(table.lastTxnVersion("unknown-app") == -1L)
  }

  test("writeStream.format(graft): exactly-once append sink, restart-safe") {
    import spark.implicits._
    val srcPath = graft.GraftTmp.dir("graft_sink_src").toString
    val dstPath = graft.GraftTmp.dir("graft_sink_dst").toString
    val ckpt = graft.GraftTmp.dir("graft_sink_ckpt").toString
    val s = graft.table.GraftTable(spark, srcPath, Nil)
    s.write((0 until 500).map(i => (i.toLong, i * 1.0)).toDF("id", "v"))
    def startQuery() = spark.readStream.format("graft").load(srcPath)
      .writeStream.format("graft")
      .option("checkpointLocation", ckpt)
      .start(dstPath)
    val q = startQuery()
    val d = graft.table.GraftTable(spark, dstPath, Nil)
    try {
      q.processAllAvailable()
      assert(d.read().count() == 500)
      s.write((500 until 800).map(i => (i.toLong, i * 1.0)).toDF("id", "v"),
        org.apache.spark.sql.SaveMode.Append)
      q.processAllAvailable()
      assert(d.read().count() == 800)
    } finally q.stop()
    // restart from the same checkpoint: nothing re-lands, new data flows
    val q2 = startQuery()
    try {
      q2.processAllAvailable()
      assert(d.read().count() == 800, "restart must not duplicate batches")
      s.write((800 until 900).map(i => (i.toLong, i * 1.0)).toDF("id", "v"),
        org.apache.spark.sql.SaveMode.Append)
      q2.processAllAvailable()
      assert(d.read().count() == 900)
      assert(d.read().select("id").distinct().count() == 900)
    } finally q2.stop()
    // the sink's appends carry the txn contract in the audit log
    val metrics = d.history().selectExpr("operationMetrics.txnAppId")
      .collect().flatMap(r => Option(r.getString(0)))
    assert(metrics.nonEmpty && metrics.forall(_.startsWith("graft-sink-")))
    // non-append output modes are rejected with a clear error
    val e = intercept[Exception] {
      spark.readStream.format("graft").load(srcPath)
        .groupBy("id").count()
        .writeStream.format("graft").outputMode("complete")
        .option("checkpointLocation",
          graft.GraftTmp.dir("graft_sink_ckpt2").toString)
        .start(graft.GraftTmp.dir("graft_sink_dst2").toString)
    }
    assert(e.getMessage != null)
  }

  test("readStream on an empty table fails clearly; expired offsets name log retention") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.LongOffset
    // not-yet-written path: clear contract error, not a raw crash
    val empty = graft.GraftTmp.dir("graft_stream_empty").toString
    val e1 = intercept[IllegalStateException] {
      spark.readStream.format("graft").load(empty)
    }
    assert(e1.getMessage.contains("no commits yet"), e1.getMessage)

    // restart whose checkpointed offset predates log retention: explicit
    // start-version-expired error naming cleanupLog
    val path = graft.GraftTmp.dir("graft_stream_expired").toString
    val t = graft.table.GraftTable(spark, path, Nil)
    (0 until 5).foreach { i =>
      t.write(Seq(i.toLong).toDF("v"), org.apache.spark.sql.SaveMode.Append)
    }
    t.cleanupLog(keepVersions = 1) // drops v0..v3
    assert(!t.hasVersion(0L) && t.hasVersion(4L))
    val src = new graft.sources.GraftStreamSource(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], path, None)
    val e2 = intercept[IllegalStateException] {
      src.getBatch(Some(LongOffset(0L)), LongOffset(4L))
    }
    assert(e2.getMessage.contains("log retention"), e2.getMessage)
    // a retained offset still serves its batch
    assert(src.getBatch(Some(LongOffset(4L)), LongOffset(4L)).isStreaming)
  }

  test("txn checkpoints: exactly-once survives log cleanup; tail scan stays bounded") {
    import spark.implicits._
    val path = graft.GraftTmp.dir("graft_ckpt_tbl").toString
    val t = graft.table.GraftTable(spark, path, Nil)
    val one = Seq(1L).toDF("v")
    // a long-running stream: 25 batches → v0..v24, checkpoints at v10/v20
    (0 until 25).foreach { b => assert(t.idempotentAppend(one, "app", b).isDefined) }
    assert(t.latestCheckpointVersion().contains(20L))
    // the lookup reads ckpt + tail, never the whole log
    assert(t.currentVersion - t.latestCheckpointVersion().get <=
      graft.table.GraftTable.CheckpointInterval)
    // truncate the log hard: only the last 2 versions' records remain
    assert(t.cleanupLog(keepVersions = 2) > 0)
    // replay protection MUST survive the truncation (the dropped commit
    // records' txn state was folded into a checkpoint first)
    assert(t.lastTxnVersion("app") == 24L)
    (0 until 25).foreach { b => assert(t.idempotentAppend(one, "app", b).isEmpty) }
    assert(t.read().count() == 25)
    // and new batches keep committing on top
    assert(t.idempotentAppend(one, "app", 25L).isDefined)
    assert(t.lastTxnVersion("app") == 25L)
  }

  test("maxVersionsPerTrigger bounds catch-up to N versions per micro-batch") {
    import spark.implicits._
    val path = graft.GraftTmp.dir("graft_throttle").toString
    val t = graft.table.GraftTable(spark, path, Seq("grp"))
    // 5 versions of 10 rows each
    (0 until 5).foreach { v =>
      t.write((0 until 10).map(i => ((v * 10 + i).toLong, "a", 1.0)).toDF("id", "grp", "v"),
        if (v == 0) org.apache.spark.sql.SaveMode.Overwrite
        else org.apache.spark.sql.SaveMode.Append)
    }
    assert(t.currentVersion == 4L)
    val name = s"graft_throttle_${System.nanoTime()}"
    val q = spark.readStream.format("graft")
      .option("startingVersion", "0")
      .option("maxVersionsPerTrigger", "2")
      .load(path)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      q.processAllAvailable()
      // all four post-v0 versions eventually arrive, exactly once...
      assert(spark.table(name).count() == 40)
      assert(spark.table(name).select("id").distinct().count() == 40)
      // ...across multiple bounded micro-batches, not one giant batch
      assert(q.recentProgress.count(_.numInputRows > 0) >= 2)
      assert(q.recentProgress.forall(_.numInputRows <= 20))
    } finally q.stop()
  }

  test("maxFilesPerTrigger splits one oversized append commit across triggers") {
    import spark.implicits._
    val path = graft.GraftTmp.dir("graft_file_split").toString
    val t = graft.table.GraftTable(spark, path)
    t.write(Seq((-1L, 0)).toDF("id", "p"))                          // v0 seed
    // ONE backfill commit of 8 files — the shape maxVersionsPerTrigger
    // cannot throttle (version granularity floods a single trigger)
    t.write((0 until 80).map(i => (i.toLong, i % 8)).toDF("id", "p")
      .repartition(8), org.apache.spark.sql.SaveMode.Append)        // v1
    assert(t.appendOnlyAdds(1L).exists(_.size == 8))
    t.write(Seq((100L, 0)).toDF("id", "p"),
      org.apache.spark.sql.SaveMode.Append)                         // v2

    val name = s"graft_files_${System.nanoTime()}"
    val q = spark.readStream.format("graft")
      .option("startingVersion", "0")
      .option("maxFilesPerTrigger", "3")
      .load(path)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      q.processAllAvailable()
      // every insert after v0 arrives EXACTLY once: 80 backfill + 1
      val got = spark.table(name).select("id").as[Long].collect().sorted
      assert(got.length == 81 && got.distinct.length == 81,
        s"got ${got.length} rows (${got.distinct.length} distinct)")
      assert(got.toSeq == ((0L until 80L) :+ 100L))
      // ...spread across >= 3 bounded micro-batches (3+3+2 files of v1,
      // then v2), never one 8-file flood
      val nonEmpty = q.recentProgress.filter(_.numInputRows > 0)
      assert(nonEmpty.length >= 3,
        s"expected >= 3 bounded batches, got ${nonEmpty.map(_.numInputRows).toSeq}")
      // file row counts are uneven under repartition(8); the invariant
      // is that no batch carried anywhere near all 8 files' 80 rows
      assert(nonEmpty.forall(_.numInputRows <= 50),
        s"a batch flooded: ${nonEmpty.map(_.numInputRows).toSeq}")
    } finally q.stop()

    // CDF mode has no per-file decomposition for rewrites: rejected
    val e = intercept[IllegalArgumentException] {
      new graft.sources.GraftStreamSource(
        spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
        path, None, changeFeed = true, maxFilesPerTrigger = Some(2L))
    }
    assert(e.getMessage.contains("maxFilesPerTrigger"), e.getMessage)
  }

  test("maxBytesPerTrigger bounds trigger volume by file bytes, exactly once") {
    import spark.implicits._
    val path = graft.GraftTmp.dir("graft_byte_split").toString
    val t = graft.table.GraftTable(spark, path)
    t.write(Seq((-1L, "seed")).toDF("id", "s"))                     // v0 seed
    // one 6-file backfill commit; files are a few KB each
    t.write((0 until 60).map(i => (i.toLong, "x" * 64)).toDF("id", "s")
      .repartition(6), org.apache.spark.sql.SaveMode.Append)        // v1
    val adds = t.appendOnlyAddsWithSizes(1L).get
    assert(adds.size == 6 && adds.forall(_._2 > 0))
    // cap at roughly two files' bytes: the commit must split across
    // >= 3 triggers (2+2+2 files), never one 6-file flood
    val cap = adds.map(_._2).sorted.take(2).sum

    val name = s"graft_bytes_${System.nanoTime()}"
    val q = spark.readStream.format("graft")
      .option("startingVersion", "0")
      .option("maxBytesPerTrigger", cap.toString)
      .load(path)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table(name).select("id").as[Long].collect().sorted
      assert(got.length == 60 && got.distinct.length == 60,
        s"got ${got.length} rows (${got.distinct.length} distinct)")
      assert(got.toSeq == (0L until 60L))
      val nonEmpty = q.recentProgress.filter(_.numInputRows > 0)
      assert(nonEmpty.length >= 3,
        s"expected >= 3 byte-bounded batches, got ${nonEmpty.map(_.numInputRows).toSeq}")
      assert(nonEmpty.forall(_.numInputRows <= 40),
        s"a batch flooded: ${nonEmpty.map(_.numInputRows).toSeq}")
    } finally q.stop()

    // suffixed byte strings parse binary units; CDF mode is rejected
    assert(graft.sources.GraftStreamSource.parseBytes("10k") == 10L << 10)
    assert(graft.sources.GraftStreamSource.parseBytes("2G") == 2L << 30)
    assert(graft.sources.GraftStreamSource.parseBytes("123") == 123L)
    val e = intercept[IllegalArgumentException] {
      new graft.sources.GraftStreamSource(
        spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
        path, None, changeFeed = true, maxBytesPerTrigger = Some(1L << 20))
    }
    assert(e.getMessage.contains("maxBytesPerTrigger"), e.getMessage)
  }

  test("initial snapshot splits across triggers under the file cap, restart-safe") {
    // a 100 TB table's FIRST delivery must not be one unbounded batch:
    // with no startingVersion the snapshot itself admits under the
    // file/byte caps, and a checkpointed mid-snapshot boundary resumes
    // with exactly the remainder
    import spark.implicits._
    val path = graft.GraftTmp.dir("graft_snap_split").toString
    val ckpt = graft.GraftTmp.dir("graft_snap_ck").toString
    val out = graft.GraftTmp.dir("graft_snap_out").toString
    val t = graft.table.GraftTable(spark, path)
    t.write((0 until 60).map(i => (i.toLong, i % 6)).toDF("id", "p")
      .repartition(6))                                               // v0: 6 files
    t.write(Seq((100L, 0)).toDF("id", "p"),
      org.apache.spark.sql.SaveMode.Append)                          // v1

    def stream(tr: org.apache.spark.sql.streaming.Trigger) =
      spark.readStream.format("graft")
        .option("maxFilesPerTrigger", "2")                           // no startingVersion
        .load(path)
        .writeStream.format("parquet").option("path", out)
        .outputMode("append").option("checkpointLocation", ckpt)
        .trigger(tr).start()
    // Trigger.Once: exactly one bounded chunk of the snapshot
    val q1 = stream(org.apache.spark.sql.streaming.Trigger.Once())
    try q1.awaitTermination(120000) finally q1.stop()
    val afterOnce = spark.read.parquet(out).count()
    assert(afterOnce > 0 && afterOnce < 60,
      s"one trigger must deliver a bounded snapshot slice, got $afterOnce")
    // resume: the rest of the snapshot + v1, exactly once
    val q2 = stream(org.apache.spark.sql.streaming.Trigger.AvailableNow())
    try {
      assert(q2.awaitTermination(120000))
      val got = spark.read.parquet(out).select("id").as[Long].collect().sorted
      assert(got.toSeq == ((0L until 60L) :+ 100L),
        s"exactly-once snapshot split: ${got.length} rows")
      val nonEmpty = q2.recentProgress.filter(_.numInputRows > 0)
      assert(nonEmpty.forall(_.numInputRows <= 40),
        s"a batch flooded: ${nonEmpty.map(_.numInputRows).toSeq}")
    } finally q2.stop()
  }

  test("skipChangeCommits: rewrite commits contribute nothing; appends still flow") {
    import spark.implicits._
    val path = graft.GraftTmp.dir("graft_skipcc").toString
    val t = graft.table.GraftTable(spark, path)
    t.write(Seq((0L, "seed")).toDF("id", "s"))                       // v0
    t.write(Seq((1L, "a"), (2L, "b")).toDF("id", "s"),
      org.apache.spark.sql.SaveMode.Append)                          // v1
    t.update(col("id") === 2L, Map("s" -> lit("B")))                 // v2 rewrite
    t.write(Seq((3L, "c")).toDF("id", "s"),
      org.apache.spark.sql.SaveMode.Append)                          // v3

    def drain(skip: Boolean): Seq[Long] = {
      val name = s"graft_skipcc_${skip}_${System.nanoTime()}"
      val q = spark.readStream.format("graft")
        .option("startingVersion", "0")
        .option("skipChangeCommits", skip.toString)
        .load(path)
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try { q.processAllAvailable(); spark.table(name).select("id").as[Long].collect().toSeq.sorted }
      finally q.stop()
    }
    // ignoreChanges default: the v2 UPDATE's postimage re-delivers row 2
    assert(drain(skip = false) == Seq(1L, 2L, 2L, 3L))
    // skipChangeCommits: the rewrite commit contributes nothing — each
    // append row exactly once, the update's postimage suppressed
    assert(drain(skip = true) == Seq(1L, 2L, 3L))
    // CDF mode rejects the option (the feed exists to surface rewrites)
    val e = intercept[IllegalArgumentException] {
      new graft.sources.GraftStreamSource(
        spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
        path, None, changeFeed = true, skipChangeCommits = true)
    }
    assert(e.getMessage.contains("skipChangeCommits"), e.getMessage)
  }

  test("Trigger.AvailableNow: bounded catch-up batches, then self-termination") {
    // the nightly-catch-up flow: process everything available under the
    // admission caps, then stop — no orchestrator-managed stop() needed.
    // The source implements SupportsTriggerAvailableNow natively, so the
    // planner drives latestOffset to a start-pinned target instead of
    // falling back to one unbounded batch.
    import spark.implicits._
    val path = graft.GraftTmp.dir("graft_avail_now").toString
    val t = graft.table.GraftTable(spark, path)
    t.write(Seq((-1L, 0)).toDF("id", "p"))                          // v0 seed
    t.write((0 until 60).map(i => (i.toLong, i % 6)).toDF("id", "p")
      .repartition(6), org.apache.spark.sql.SaveMode.Append)        // v1: 6 files
    t.write(Seq((100L, 0)).toDF("id", "p"),
      org.apache.spark.sql.SaveMode.Append)                         // v2
    val name = s"graft_avail_${System.nanoTime()}"
    val q = spark.readStream.format("graft")
      .option("startingVersion", "0")
      .option("maxFilesPerTrigger", "2")
      .load(path)
      .writeStream.format("memory").queryName(name).outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      assert(q.awaitTermination(120000), "available-now query must self-terminate")
      val got = spark.table(name).select("id").as[Long].collect().sorted
      assert(got.toSeq == ((0L until 60L) :+ 100L),
        s"exactly-once catch-up: got ${got.length} rows")
      // caps respected: the 6-file backfill never flooded one batch
      val nonEmpty = q.recentProgress.filter(_.numInputRows > 0)
      assert(nonEmpty.length >= 3,
        s"expected bounded batches, got ${nonEmpty.map(_.numInputRows).toSeq}")
    } finally q.stop()
  }

  test("checkpoint restart resumes at a partial-version file boundary") {
    // run 1 stops after ONE admitted chunk of a 5-file commit; run 2
    // reuses the checkpoint and must deliver exactly the remainder —
    // the (version, fileIndex) offset round-trips through the offset
    // log into the admission-control path
    import spark.implicits._
    val path = graft.GraftTmp.dir("graft_resume").toString
    val ckpt = graft.GraftTmp.dir("graft_resume_ck").toString
    val out = graft.GraftTmp.dir("graft_resume_out").toString
    val t = graft.table.GraftTable(spark, path)
    t.write(Seq((-1L, 0)).toDF("id", "p"))                          // v0 seed
    t.write((0 until 50).map(i => (i.toLong, i % 5)).toDF("id", "p")
      .repartition(5), org.apache.spark.sql.SaveMode.Append)        // v1: 5 files
    // memory sinks can't recover a checkpoint — a file sink pins the
    // cross-restart exactly-once contract end to end
    def stream(tr: org.apache.spark.sql.streaming.Trigger) =
      spark.readStream.format("graft")
        .option("startingVersion", "0")
        .option("maxFilesPerTrigger", "2")
        .load(path)
        .writeStream.format("parquet").option("path", out)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(tr).start()
    val q1 = stream(org.apache.spark.sql.streaming.Trigger.Once())
    try q1.awaitTermination(120000) finally q1.stop()
    val afterOnce = spark.read.parquet(out).count()
    assert(afterOnce < 50, s"Trigger.Once must respect the file cap, got $afterOnce")
    val q2 = stream(org.apache.spark.sql.streaming.Trigger.AvailableNow())
    try {
      assert(q2.awaitTermination(120000))
      val got = spark.read.parquet(out).select("id").as[Long].collect().sorted
      assert(got.toSeq == (0L until 50L),
        s"resume must deliver the remainder exactly once: ${got.length} rows")
    } finally q2.stop()
  }

  test("CDF stream under Trigger.AvailableNow: bounded versions, tombstones flow") {
    import spark.implicits._
    val path = graft.GraftTmp.dir("graft_cdf_avail").toString
    val t = graft.table.GraftTable(spark, path)
    t.write((0 until 6).map(i => (i.toLong, "a")).toDF("id", "tag"))  // v0
    t.write(Seq((10L, "b")).toDF("id", "tag"),
      org.apache.spark.sql.SaveMode.Append)                          // v1
    t.delete(col("id") === 3L)                                       // v2
    t.write(Seq((11L, "b")).toDF("id", "tag"),
      org.apache.spark.sql.SaveMode.Append)                          // v3
    val name = s"graft_cdf_avail_${System.nanoTime()}"
    val q = spark.readStream.format("graft")
      .option("readChangeFeed", "true")
      .option("startingVersion", "0")
      .option("maxVersionsPerTrigger", "1")
      .load(path)
      .writeStream.format("memory").queryName(name).outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      assert(q.awaitTermination(120000), "CDF available-now must self-terminate")
      val rows = spark.table(name).select("id", "_change_type")
        .as[(Long, String)].collect().toSet
      assert(rows.contains((3L, "delete")), s"tombstone must flow: $rows")
      assert(rows.contains((10L, "insert")) && rows.contains((11L, "insert")))
      // version-granular admission: at least the snapshot batch plus
      // one per subsequent version
      val nonEmpty = q.recentProgress.filter(_.numInputRows > 0)
      assert(nonEmpty.length >= 3,
        s"expected per-version batches, got ${nonEmpty.map(_.numInputRows).toSeq}")
    } finally q.stop()
  }

  test("startingTimestamp streams only commits at/after the timestamp") {
    import spark.implicits._
    val path = graft.GraftTmp.dir("graft_start_ts").toString
    val t = graft.table.GraftTable(spark, path)
    t.write((0 until 10).map(i => (i.toLong, "old")).toDF("id", "tag"))
    Thread.sleep(30) // commit timestamps have millisecond resolution
    val cut = System.currentTimeMillis()
    Thread.sleep(30)
    t.write((10 until 15).map(i => (i.toLong, "new")).toDF("id", "tag"),
      org.apache.spark.sql.SaveMode.Append)

    val name = s"graft_start_ts_${System.nanoTime()}"
    val q = spark.readStream.format("graft")
      .option("startingTimestamp", cut.toString)
      .load(path)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table(name).select("id").collect().map(_.getLong(0)).sorted
      assert(got.toSeq == (10L until 15L),
        s"only the post-timestamp commit must flow, got ${got.toSeq}")
    } finally q.stop()

    // a timestamp predating every commit degrades to the full snapshot
    val name2 = s"graft_start_ts0_${System.nanoTime()}"
    val q2 = spark.readStream.format("graft")
      .option("startingTimestamp", "0")
      .load(path)
      .writeStream.format("memory").queryName(name2).outputMode("append").start()
    try {
      q2.processAllAvailable()
      assert(spark.table(name2).count() == 15)
    } finally q2.stop()

    // both options together is a contract error
    val err = intercept[Exception] {
      spark.readStream.format("graft")
        .option("startingVersion", "0")
        .option("startingTimestamp", cut.toString)
        .load(path)
        .writeStream.format("memory")
        .queryName(s"x_${System.nanoTime()}").outputMode("append").start()
        .processAllAvailable()
    }
    assert(err.getMessage != null)
  }

  test("readChangeFeed stream: deletes flow as tombstones, updates as CDC image pairs") {
    import spark.implicits._
    val path = graft.GraftTmp.dir("graft_cdf_src").toString
    val t = graft.table.GraftTable(spark, path, Seq("grp"))
    t.write((0 until 100).map(i => (i.toLong, if (i % 2 == 0) "a" else "b", i * 1.0))
      .toDF("id", "grp", "v"))
    val name = s"graft_cdf_stream_${System.nanoTime()}"
    val q = spark.readStream.format("graft").option("readChangeFeed", "true").load(path)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      q.processAllAvailable()
      // initial snapshot: all rows as inserts
      assert(spark.table(name).count() == 100)
      assert(spark.table(name).filter(col("_change_type") =!= "insert").count() == 0)
      // a DELETE surfaces as tombstones for exactly the deleted rows
      t.delete(col("id") < 10L && col("grp") === "a")
      q.processAllAvailable()
      val dels = spark.table(name).filter(col("_change_type") === "delete")
      assert(dels.count() == 5)
      assert(dels.select("id").as[Long].collect().sorted.toSeq == Seq(0L, 2L, 4L, 6L, 8L))
      // an UPDATE surfaces as its CDC image pair: old row as
      // update_preimage, new row as update_postimage
      t.update(col("id") === 11L, Map("v" -> lit(-1.0)))
      q.processAllAvailable()
      val u = spark.table(name).filter(col("id") === 11L)
      assert(u.filter(col("_change_type") === "update_preimage" &&
        col("v") === 11.0).count() == 1)
      assert(u.filter(col("_change_type") === "update_postimage" &&
        col("v") === -1.0).count() == 1)
    } finally q.stop()
  }

  test("graft streaming round-trip: stream-ingested table reads back incrementally, equal to batch") {
    val ingestPath = graft.GraftTmp.dir("graft_rt_tbl").toString
    val table = Streaming.streamIntoTable(spark, sf, ingestPath)
    val batchRows = table.read().count()
    val name = s"graft_rt_stream_${System.nanoTime()}"
    val q = spark.readStream.format("graft").load(ingestPath)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table(name).count() == batchRows)
      assert(spark.table(name).select("event_id").distinct().count() == batchRows)
    } finally q.stop()
  }
}

class MediaSpec extends SparkSpec {
  import spark.implicits._

  test("decode stub kernel: checksum, frames, normalized histogram") {
    val m = Media.decodeStub("abcd".getBytes("UTF-8"))
    assert(m.n_bytes == 4)
    assert(m.checksum == ('a' + 'b' + 'c' + 'd').toLong)
    assert(m.n_frames == 1)
    assert(math.abs(m.features.sum - 1.0f) < 1e-6) // histogram normalized
    assert(Media.decodeStub(Array.emptyByteArray).n_bytes == 0)
  }

  test("media pipeline preserves every document through binary decode") {
    val n = graft.tables.Tables.documents(spark, sf).count()
    val meta = Media.decodeAll(Media.mediaTable(spark, sf)).cache()
    assert(meta.count() == n)
    assert(meta.filter(col("n_bytes") <= 0).count() == 0)
    assert(meta.select("doc_id").distinct().count() == n)
    // feature vector has fixed dim 16
    assert(meta.filter(size(col("features")) =!= 16).count() == 0)
  }

  test("media features match direct byte arithmetic") {
    val doc = graft.tables.Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect().take(10)
    val got = Media.mediaFeatures(spark, sf)
      .filter(col("doc_id") < 10)
      .select("doc_id", "checksum").as[(Long, Long)].collect().toMap
    doc.foreach { case (id, text) =>
      val expect = text.getBytes("UTF-8").map(_ & 0xff).map(_.toLong).sum % 1000000007L
      assert(got(id) == expect, s"doc $id")
    }
  }

  test("bucketed media_nearest_pair matches brute-force pairs exactly") {
    // brute-force ground truth, driver-side over the small spec corpus
    val feats = Media.decodeAll(Media.mediaTable(spark, sf))
      .select("doc_id", "features").as[(Long, Array[Float])].collect()
      .map { case (id, f) =>
        val v = f.map(_.toDouble)
        (id, v, math.sqrt(v.map(x => x * x).sum))
      }
    val brute = (for {
      (a, va, na) <- feats; (b, vb, nb) <- feats if a < b
      cos = math.rint(va.zip(vb).map { case (p, q) => p * q }.sum / (na * nb) * 1e6) / 1e6
      if cos >= Media.NearDupThreshold
    } yield (a, b)).sorted.take(100)
    val got = Media.mediaNearestPair(spark, sf)
      .select("a", "b").as[(Long, Long)].collect().toSeq.sorted
    assert(brute.nonEmpty, "spec corpus has no near-dup pairs — threshold dead")
    assert(got == brute.toSeq, s"bucketed pairs diverge: got ${got.size}, brute ${brute.size}")
    // and the plan is an equi-join, not a nested loop
    val plan = Media.mediaNearestPair(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }
}

class RelationalSpec extends SparkSpec {

  test("setops partition users: both + only_w1 covers week1 exactly") {
    val df = Relational.setOpsUsers(spark, sf).cache()
    val both = df.filter(col("op") === "both").count()
    val w1only = df.filter(col("op") === "only_w1").count()
    val w1 = graft.tables.Tables.events(spark, sf)
      .filter(to_date(col("ts")).between("2024-01-01", "2024-01-07"))
      .select("user_id").distinct().count()
    assert(both + w1only == w1)
  }

  test("rollup adds subtotals and a grand total") {
    val df = Relational.rollupCounts(spark, sf).cache()
    val grand = df.filter(col("gid") === 3).count()
    assert(grand == 1)
    val detailSum = df.filter(col("gid") === 0).agg(sum("cnt")).collect()(0).getLong(0)
    val total = df.filter(col("gid") === 3).agg(sum("cnt")).collect()(0).getLong(0)
    assert(detailSum == total)
  }

  test("cube has 4 grouping levels") {
    val df = Relational.cubeQuantity(spark, sf)
    assert(df.select("gid").distinct().count() == 4)
  }

  test("pivot row sums equal per-user event counts") {
    val df = Relational.pivotCounts(spark, sf)
    val rowSum = df.withColumn("total",
      col("click") + col("error") + col("purchase") + col("signup") + col("view"))
      .agg(sum("total")).collect()(0).getLong(0)
    assert(rowSum == graft.tables.Tables.events(spark, sf).count())
  }
}

class ApproxSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct (rsd=0.02) meets its 10% bound on every group") {
    val rows = graft.queries.Relational.approxDistinct(spark, sf)
      .select("exact_orders", "approx_within_10pct").as[(Long, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (exact, ok) => assert(ok, s"bound failed at exact=$exact") }
  }

  test("percentiles are ordered and within value range") {
    val df = graft.queries.Relational.percentiles(spark, sf)
    assert(df.filter(col("q25") > col("q50") || col("q50") > col("q75")).count() == 0)
  }
}
