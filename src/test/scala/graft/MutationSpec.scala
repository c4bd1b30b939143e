package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.ingest.BarSource
import graft.table.GraftTable
import graft.transform.Enrich

/** DELETE / UPDATE / MERGE on GraftTable — the Delta Lake mutation surface
  * (copy-on-write at file granularity). Verifies row semantics, that only
  * affected files are rewritten, and that pre-mutation versions stay
  * time-travel-readable.
  */
class MutationSpec extends SparkSpec {

  private def freshTable(prefix: String): GraftTable = {
    val path = graft.GraftTmp.dir(prefix).toString
    GraftTable(spark, path, Seq("ticker", "trade_date"))
  }

  private def bars = Enrich.withTimeColumns(
    BarSource.harvest(spark, delayMs = 0)).cache()

  test("delete removes only matching rows; null predicate rows are kept") {
    val t = freshTable("gt_del")
    t.write(bars.repartition(4))
    val total = t.read().count()
    val aapl = t.read().filter(col("ticker") === "AAPL").count()
    assert(aapl > 0)

    val v = t.delete(col("ticker") === "AAPL")
    assert(t.read().count() == total - aapl)
    assert(t.read().filter(col("ticker") === "AAPL").count() == 0)

    // SQL three-valued logic: a NULL predicate must not delete anything.
    // close has injected nulls (BarSource), so `close > 1e12` is NULL there
    // and FALSE elsewhere → zero deletions either way.
    t.delete(col("close") > 1e12)
    assert(t.read().count() == total - aapl)

    // time travel: the pre-delete version still shows AAPL
    assert(t.readVersion(v - 1).filter(col("ticker") === "AAPL").count() == aapl)
  }

  test("delete rewrites only the files of affected partitions") {
    val t = freshTable("gt_del_files")
    t.write(bars.repartition(4))
    val before = t.manifestFiles().toSet
    t.delete(col("ticker") === "MSFT" && col("trade_date") === "2024-01-08")
    val after = t.manifestFiles().toSet
    val untouched = before.filterNot(_.contains("ticker=MSFT/trade_date=2024-01-08"))
    // every untouched file is carried over verbatim (no rewrite)
    assert(untouched.subsetOf(after))
    // the affected partition's files were swapped out
    assert(before.diff(after).forall(_.contains("ticker=MSFT/trade_date=2024-01-08")))
  }

  test("update rewrites matching rows in place and leaves the rest") {
    val t = freshTable("gt_upd")
    t.write(bars.repartition(4))
    val othersBefore = t.read().filter(col("ticker") =!= "TSLA")
      .agg(sum("volume")).collect()(0).getLong(0)

    // assignment is a Double literal into a BIGINT column — the engine
    // must store-assign (cast to the existing type), not evolve the schema
    t.update(col("ticker") === "TSLA", Map("volume" -> lit(0.0)))

    val back = t.read()
    assert(back.count() == bars.count())
    assert(back.schema("volume").dataType.typeName == "long")
    assert(back.filter(col("ticker") === "TSLA")
      .agg(sum("volume")).collect()(0).getLong(0) == 0L)
    val othersAfter = back.filter(col("ticker") =!= "TSLA")
      .agg(sum("volume")).collect()(0).getLong(0)
    assert(othersAfter == othersBefore)
  }

  test("appends landing during a rewrite's scan-to-commit window are never lost") {
    import spark.implicits._
    val path = graft.GraftTmp.dir("gt_mixed").toString
    val t = graft.table.GraftTable(spark, path, Nil)
    t.write((0 until 1000).map(_.toLong).toDF("id").repartition(4))
    // one writer streams appends while the other runs snapshot-derived
    // rewrites; the rewrites must CARRY concurrently appended files
    // (WriteSerializable), not drop them from the new manifest
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val appender = new Thread(() => {
      val mine = graft.table.GraftTable(spark, path, Nil)
      (0 until 10).foreach { b =>
        mine.write(((10000 + b * 10) until (10000 + b * 10 + 10)).map(_.toLong)
          .toDF("id"), org.apache.spark.sql.SaveMode.Append)
      }
    })
    appender.setUncaughtExceptionHandler((_, e) => errs.add(e))
    appender.start()
    // three sequential deletes over the initial rows (never the appended
    // ids) racing the appender's commits
    (0 until 3).foreach { i =>
      t.delete(col("id") >= i * 100L && col("id") < (i + 1) * 100L)
    }
    appender.join()
    assert(errs.isEmpty, s"appender failed: ${Option(errs.peek()).map(_.toString)}")
    // exact accounting: 1000 initial − 300 deleted + 100 appended
    assert(t.read().count() == 800)
    assert(t.read().filter(col("id") >= 10000L).count() == 100)
    assert(t.read().filter(col("id") < 300L).count() == 0)
  }

  test("concurrent copy-on-write deletes on DISJOINT partitions both land") {
    import spark.implicits._
    val path = graft.GraftTmp.dir("gt_conc_disjoint").toString
    val t = graft.table.GraftTable(spark, path, Seq("p"))
    t.write((0 until 900).map(i => (i % 3, i.toLong)).toDF("p", "id").repartition(3))
    assert(t.read().count() == 900)

    // two writers race deletes scoped to DIFFERENT hive partitions: the
    // partition-pruned scans touch disjoint file sets, so the claim-race
    // loser retries onto the winner's manifest and lands cleanly (the
    // Delta disjoint-rewrite rule) — neither op may abort or lose rows
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = Seq(1, 2).map { p =>
      val th = new Thread(() => {
        val mine = graft.table.GraftTable(spark, path, Seq("p"))
        mine.delete(col("p") === p && col("id") < 600L)
      })
      th.setUncaughtExceptionHandler((_, e) => errs.add(e))
      th
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(errs.isEmpty, s"disjoint deletes must both land: ${Option(errs.peek())}")
    // p=0 intact; p=1 and p=2 keep only id >= 600
    assert(t.read().filter(col("p") === 0).count() == 300)
    assert(t.read().filter(col("p") =!= 0 && col("id") < 600L).count() == 0)
    assert(t.read().count() == 300 + 2 * 100)
    val ops = t.history().select("operation").as[String].collect()
    assert(ops.count(_ == "DELETE") == 2, "both deletes must commit")
  }

  test("SET TBLPROPERTIES racing an identity append: both property sets land") {
    import spark.implicits._
    val path = graft.GraftTmp.dir("gt_prop_race").toString
    val t = graft.table.GraftTable(spark, path, Nil)
    t.write(Seq((0L, "seed")).toDF("k", "s"))
    t.addIdentityColumn("rid", start = 1L, step = 1L)

    // one thread commits user properties, the other identity appends
    // (which advance the graft.identity.rid high-water mark property in
    // their own commits). The newProperties closure recomputes over the
    // predecessor that WON the claim, so neither side may revert the
    // other's keys, whatever the interleaving.
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val setter = new Thread(() => {
      val mine = graft.table.GraftTable(spark, path, Nil)
      (0 until 3).foreach(i => mine.setProperties(Map(s"user.k$i" -> s"v$i")))
    })
    val appender = new Thread(() => {
      val mine = graft.table.GraftTable(spark, path, Nil)
      (0 until 3).foreach { i =>
        mine.write(Seq((100L + i, s"a$i")).toDF("k", "s"),
          org.apache.spark.sql.SaveMode.Append)
      }
    })
    Seq(setter, appender).foreach(_.setUncaughtExceptionHandler((_, e) => errs.add(e)))
    Seq(setter, appender).foreach(_.start())
    Seq(setter, appender).foreach(_.join())
    assert(errs.isEmpty, s"racing commits must land: ${Option(errs.peek())}")

    val props = t.properties
    assert((0 until 3).forall(i => props.get(s"user.k$i").contains(s"v$i")),
      s"user properties lost in the race: $props")
    // the identity mark survived every SET and covers all assigned ids
    val ids = t.read().filter(col("rid").isNotNull).select("rid")
      .as[Long].collect()
    assert(ids.length == 3 && ids.distinct.length == 3, ids.toSeq.toString)
    val (_, _, hwm) = t.identityColumns("rid")
    assert(hwm >= ids.max, s"high-water mark $hwm below max id ${ids.max}")
  }

  test("overlapping concurrent rewrites: one clear abort or clean serialization, never lost updates") {
    import spark.implicits._
    val path = graft.GraftTmp.dir("gt_conc_overlap").toString
    val t = graft.table.GraftTable(spark, path, Nil)
    t.write((0 until 1000).map(_.toLong).toDF("id").repartition(2))

    // both deletes touch BOTH files: depending on interleaving either
    // they serialize cleanly (second snapshot taken after the first
    // commit) or the loser aborts with ConcurrentModificationException —
    // what must NEVER happen is silent corruption (a lost delete or
    // resurrected rows)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = Seq(col("id") < 500L, col("id") >= 500L).map { cond =>
      val th = new Thread(() => {
        val mine = graft.table.GraftTable(spark, path, Nil)
        mine.delete(cond)
      })
      th.setUncaughtExceptionHandler((_, e) => errs.add(e))
      th
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    val aborts = errs.size()
    assert(aborts <= 1, s"at most one loser: ${errs}")
    errs.forEach(e => assert(
      e.isInstanceOf[java.util.ConcurrentModificationException],
      s"overlap must abort with ConcurrentModificationException, got $e"))
    val n = t.read().count()
    if (aborts == 0) assert(n == 0, "both landed => all rows deleted")
    else assert(n == 500, "loser aborted => exactly the winner's delete applied")
  }

  test("merge-on-read DELETE racing a rewrite: no row resurrection, loser aborts cleanly") {
    import spark.implicits._
    val path = graft.GraftTmp.dir("gt_conc_dv").toString
    val t = graft.table.GraftTable(spark, path, Nil)
    t.write((0 until 1000).map(i => (i.toLong, 0L)).toDF("id", "v").repartition(4))

    // UPDATE rewrites every file; the merge-on-read DELETE changes only
    // deletion vectors of the same files. Valid outcomes: clean
    // serialization (both land, in either order) or the rewrite aborts
    // with ConcurrentModificationException because an input file's
    // vector moved under it. What must NEVER happen is both landing
    // with the deleted rows resurrected by the rewrite's output.
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val upd = new Thread(() => {
      val mine = graft.table.GraftTable(spark, path, Nil)
      mine.update(col("id") >= 0L, Map("v" -> lit(1L)))
    })
    val del = new Thread(() => {
      val mine = graft.table.GraftTable(spark, path, Nil)
      Thread.sleep(150) // land mid-rewrite with high probability
      mine.delete(pmod(col("id"), lit(7)) === 0, mergeOnRead = true)
    })
    Seq(upd, del).foreach(_.setUncaughtExceptionHandler((_, e) => errs.add(e)))
    Seq(upd, del).foreach(_.start())
    Seq(upd, del).foreach(_.join())
    errs.forEach(e => assert(
      e.isInstanceOf[java.util.ConcurrentModificationException],
      s"losers must abort with ConcurrentModificationException, got $e"))
    val ops = t.history().select("operation").collect().map(_.getString(0))
    val bothLanded = ops.contains("UPDATE") && ops.contains("DELETE")
    val deletedStillThere = t.read().filter(pmod(col("id"), lit(7)) === 0).count()
    if (bothLanded)
      assert(deletedStillThere == 0,
        "concurrently deleted rows must not resurrect through the rewrite")
    else assert(errs.size() == 1, s"one op missing => exactly one abort: $errs")
  }

  test("concurrent ADD COLUMN of distinct columns: both land with consistent schema") {
    import spark.implicits._
    val path = graft.GraftTmp.dir("gt_conc_addcol").toString
    val t = graft.table.GraftTable(spark, path, Nil)
    t.write((0 until 10).map(_.toLong).toDF("id").repartition(1))
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = Seq("extra_a", "extra_b").map { name =>
      val th = new Thread(() => {
        val mine = graft.table.GraftTable(spark, path, Nil)
        mine.addColumn(name, org.apache.spark.sql.types.StringType)
      })
      th.setUncaughtExceptionHandler((_, e) => errs.add(e))
      th
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(errs.isEmpty, s"distinct adds must both land: ${Option(errs.peek())}")
    val cols = t.read().columns.toSeq
    assert(cols.contains("extra_a") && cols.contains("extra_b"), cols.toString)
    assert(t.read().filter(col("extra_a").isNull && col("extra_b").isNull).count() == 10)
  }

  test("update predicate is pinned before assignments mutate its columns") {
    import spark.implicits._
    val path = graft.GraftTmp.dir("gt_upd_pin").toString
    val t = graft.table.GraftTable(spark, path, Nil)
    t.write(Seq((1L, 0L), (2L, 0L)).toDF("id", "v"))
    // the predicate references id, and id is itself assigned: the v
    // assignment must still apply to the originally-matching row
    // (assignment order must not change which rows later layers hit)
    t.update(col("id") === 1L, Map("id" -> lit(100L), "v" -> lit(9L)))
    assert(t.read().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      == Set((100L, 9L), (2L, 0L)))
  }

  test("update rejects unknown columns") {
    val t = freshTable("gt_upd_bad")
    t.write(bars.repartition(2))
    intercept[IllegalArgumentException] {
      t.update(lit(true), Map("no_such_col" -> lit(1)))
    }
  }

  test("merge upserts: matched keys replaced, new keys inserted, idempotent") {
    val t = freshTable("gt_merge")
    t.write(bars.repartition(4))
    val total = t.read().count()

    // source: 3 corrected AAPL bars (volume zeroed) + 2 brand-new bars
    val corrected = t.read()
      .filter(col("ticker") === "AAPL").orderBy("timestamp_ms").limit(3)
    val fresh = t.read()
      .filter(col("ticker") === "NVDA").orderBy("timestamp_ms").limit(2)
      .withColumn("ticker", lit("ZZZZ"))
    // Double literal into a BIGINT column: merge must store-assign
    val source = corrected.unionByName(fresh)
      .withColumn("volume", lit(0.0)).cache()
    source.count()

    val key = Seq("ticker", "timestamp_ms")
    t.merge(source, key)
    val after = t.read()
    assert(after.count() == total + 2)                       // 3 updated, 2 inserted
    assert(after.filter(col("ticker") === "ZZZZ").count() == 2)
    val touched = after.join(source.select("ticker", "timestamp_ms"), key, "left_semi")
    assert(touched.count() == 5)
    assert(touched.agg(sum("volume")).collect()(0).getLong(0) == 0L)

    // merging the same source again changes nothing (upsert idempotence)
    t.merge(source, key)
    assert(t.read().count() == total + 2)

    // only AAPL partitions (matched) were rewritten; other files carried over
    val hist = t.history().filter(col("operation") === "MERGE").count()
    assert(hist == 2)
  }

  test("merge into empty table is a plain write") {
    val path = graft.GraftTmp.dir("gt_merge_empty").toString
    val t = GraftTable(spark, path, Seq("ticker", "trade_date"))
    t.merge(bars.repartition(2), Seq("ticker", "timestamp_ms"))
    assert(t.read().count() == bars.count())
  }

  test("bar_mutations lifecycle query reflects delete+update+merge") {
    val df = graft.queries.StockPipeline.barMutations(spark, sf).cache()
    val byTicker = df.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(!byTicker.contains("JPM"))                 // deleted
    assert(byTicker("TSLA")._2 == 0L)                 // volume zeroed
    assert(byTicker.contains("NEWCO"))                // inserted
    assert(byTicker("NEWCO")._1 == byTicker("NVDA")._1 ||
      byTicker("NEWCO")._1 > 0)                       // one day's bars
    assert(df.filter(col("ticker") === "AAPL").count() == 1)
  }

  test("restore recommits an old version and is itself undoable") {
    val t = freshTable("gt_restore")
    t.write(bars.repartition(4))
    val total = t.read().count()
    val v0 = t.currentVersion
    t.delete(col("ticker") === "AAPL")
    val afterDelete = t.read().count()
    assert(afterDelete < total)

    val vr = t.restore(v0)
    assert(t.read().count() == total)                 // AAPL is back
    assert(vr == t.currentVersion)
    // restore is a commit, so the deleted state is still reachable
    assert(t.readVersion(vr - 1).count() == afterDelete)
    intercept[IllegalArgumentException] { t.restore(999) }
  }

  test("changes() reports delete, update, and merge as row-level diffs") {
    val t = freshTable("gt_cdf")
    t.write(bars.repartition(4))
    val v0 = t.currentVersion
    val aapl = t.read().filter(col("ticker") === "AAPL").count()

    t.delete(col("ticker") === "AAPL")
    val cdfDel = t.changes(v0, t.currentVersion).cache()
    assert(cdfDel.filter(col("_change_type") === "delete").count() == aapl)
    assert(cdfDel.filter(col("_change_type") === "insert").count() == 0)

    val v1 = t.currentVersion
    val tsla = t.read().filter(col("ticker") === "TSLA").count()
    t.update(col("ticker") === "TSLA", Map("volume" -> lit(0L)))
    val cdfUpd = t.changes(v1, t.currentVersion).cache()
    // an UPDATE surfaces its CDC images: every matched row's old and
    // new version, never inferred delete+insert
    val post = cdfUpd.filter(col("_change_type") === "update_postimage").count()
    assert(post == cdfUpd.filter(col("_change_type") === "update_preimage").count())
    assert(post == tsla && post > 0)
    assert(cdfUpd.filter(col("_change_type").isin("insert", "delete")).count() == 0)
    assert(cdfUpd.filter(col("_change_type") === "update_postimage")
      .agg(sum("volume")).collect()(0).getLong(0) == 0L)
    assert(cdfUpd.filter(col("_change_type") === "update_preimage" &&
      col("ticker") =!= "TSLA").count() == 0)

    // no-change range: empty feed, schema intact
    val empty = t.changes(t.currentVersion, t.currentVersion)
    assert(empty.count() == 0)
    assert(empty.columns.contains("_change_type"))
  }

  test("MERGE records CDC: update images, delete preimages, inserts — per clause") {
    import spark.implicits._
    val path = graft.GraftTmp.dir("gt_merge_cdc").toString
    val t = graft.table.GraftTable(spark, path)
    t.write(Seq((1L, "keep", 10.0), (2L, "upd", 20.0), (3L, "del", 30.0))
      .toDF("k", "tag", "v"))
    val v0 = t.currentVersion
    val source = Seq((2L, "upd", 200.0), (3L, "del", 0.0), (4L, "new", 40.0))
      .toDF("k", "tag", "v")
    t.mergeInto(source, Seq("k"))
      .whenMatchedDelete(col("target.tag") === "del")
      .whenMatchedUpdate(Map("v" -> col("source.v")))
      .whenNotMatchedInsertAll()
      .execute()
    val feed = t.changes(v0, t.currentVersion).cache()
    def rows(tpe: String) = feed.filter(col("_change_type") === tpe)
      .select("k", "v").as[(Long, Double)].collect().toSet
    assert(rows("update_preimage") == Set((2L, 20.0)))
    assert(rows("update_postimage") == Set((2L, 200.0)))
    assert(rows("delete") == Set((3L, 30.0)))
    assert(rows("insert") == Set((4L, 40.0)))
    // the carried row (k=1, rewritten verbatim) is NOT a change
    assert(feed.filter(col("k") === 1L).count() == 0)
  }

  test("CHECK constraints gate write, update, and merge; NULL passes") {
    val t = freshTable("gt_check")
    t.write(bars.repartition(4))
    t.addConstraint("vol_nonneg", "volume >= 0")
    // close has injected NULLs: SQL CHECK passes on NULL
    t.addConstraint("close_pos", "close > 0")

    // appending a violating batch is rejected
    val bad = bars.limit(5).withColumn("volume", lit(-1L))
    intercept[IllegalArgumentException] {
      t.write(bad, org.apache.spark.sql.SaveMode.Append)
    }
    // update that would violate is rejected
    intercept[IllegalArgumentException] {
      t.update(col("ticker") === "AAPL", Map("volume" -> lit(-5L)))
    }
    // merge with violating source is rejected
    intercept[IllegalArgumentException] {
      t.merge(bad, Seq("ticker", "timestamp_ms"))
    }
    // valid operations still pass
    t.update(col("ticker") === "AAPL", Map("volume" -> lit(0L)))

    // adding a constraint existing rows violate is rejected
    intercept[IllegalArgumentException] {
      t.addConstraint("impossible", "volume > 1000000000000")
    }
    // dropped constraint no longer gates
    t.dropConstraint("vol_nonneg")
    t.update(col("ticker") === "MSFT", Map("volume" -> lit(-1L)))
    assert(t.constraints.keySet == Set("close_pos"))
  }

  test("conditional merge: matched delete, conditional update, conditional insert") {
    val t = freshTable("gt_cmerge")
    t.write(bars.repartition(4))
    val total = t.read().count()
    val key = Seq("ticker", "timestamp_ms")

    val aapl2 = t.read().filter(col("ticker") === "AAPL").orderBy("timestamp_ms").limit(2)
    val msft3 = t.read().filter(col("ticker") === "MSFT").orderBy("timestamp_ms").limit(3)
    val newRows = t.read().filter(col("ticker") === "NVDA").orderBy("timestamp_ms").limit(2)
    val fresh = newRows.limit(1).withColumn("ticker", lit("YYYY"))
      .unionByName(newRows.orderBy(desc("timestamp_ms")).limit(1).withColumn("ticker", lit("XXXX")))
    val source = aapl2.unionByName(msft3).unionByName(fresh).cache()
    source.count()

    val msftVolBefore = t.read().filter(col("ticker") === "MSFT")
      .agg(sum("volume")).collect()(0).getLong(0)

    t.mergeInto(source, key)
      .whenMatchedDelete(col("source.ticker") === "AAPL")
      .whenMatchedUpdate(col("source.ticker") === "MSFT", Map("volume" -> lit(7L)))
      .whenNotMatchedInsertAll(col("source.ticker") === "YYYY") // XXXX dropped
      .execute()

    val after = t.read().cache()
    assert(after.count() == total - 2 + 1)                    // 2 deleted, 1 inserted
    // matched-delete removed exactly the two AAPL source keys
    assert(after.join(source.filter(col("ticker") === "AAPL")
      .select("ticker", "timestamp_ms"), key, "left_semi").count() == 0)
    // conditional update touched only the three matched MSFT rows
    val msftTouched = after.join(source.filter(col("ticker") === "MSFT")
      .select("ticker", "timestamp_ms"), key, "left_semi")
    assert(msftTouched.count() == 3)
    assert(msftTouched.agg(sum("volume")).collect()(0).getLong(0) == 21L)
    val msftVolAfter = after.filter(col("ticker") === "MSFT")
      .agg(sum("volume")).collect()(0).getLong(0)
    val msftVolTouchedBefore = t.readVersion(t.currentVersion - 1)
      .join(source.filter(col("ticker") === "MSFT").select("ticker", "timestamp_ms"),
        key, "left_semi").agg(sum("volume")).collect()(0).getLong(0)
    assert(msftVolAfter == msftVolBefore - msftVolTouchedBefore + 21L)
    // conditional insert: YYYY in, XXXX filtered out
    assert(after.filter(col("ticker") === "YYYY").count() == 1)
    assert(after.filter(col("ticker") === "XXXX").count() == 0)
  }

  test("merge clause order: first applicable clause wins") {
    val t = freshTable("gt_cmerge_order")
    t.write(bars.repartition(2))
    val key = Seq("ticker", "timestamp_ms")
    val src = t.read().filter(col("ticker") === "AAPL").orderBy("timestamp_ms").limit(2).cache()
    src.count()
    // both clauses match; the earlier (update volume=1) must win over delete
    t.mergeInto(src, key)
      .whenMatchedUpdate(Map("volume" -> lit(1L)))
      .whenMatchedDelete()
      .execute()
    val touched = t.read().join(src.select("ticker", "timestamp_ms"), key, "left_semi")
    assert(touched.count() == 2)
    assert(touched.agg(sum("volume")).collect()(0).getLong(0) == 2L)
  }

  test("merge raises the multiple-source-match error") {
    val t = freshTable("gt_merge_dup")
    t.write(bars.repartition(2))
    val one = t.read().filter(col("ticker") === "AAPL").orderBy("timestamp_ms").limit(1)
    val dup = one.unionByName(one.withColumn("volume", lit(99L))).cache()
    dup.count()
    intercept[IllegalStateException] {
      t.merge(dup, Seq("ticker", "timestamp_ms"))
    }
    // a duplicate key that matches NO target row is fine (insert-only path)
    val newDup = one.withColumn("ticker", lit("WWWW"))
    t.merge(newDup.unionByName(newDup), Seq("ticker", "timestamp_ms"))
    assert(t.read().filter(col("ticker") === "WWWW").count() == 2)
  }

  test("mergeIntoOn: differently-named keys with a residual condition") {
    val t = freshTable("gt_merge_keys")
    t.write(bars.repartition(4))
    val total = t.read().count()
    // source carries the keys under different names + a patch value
    val matchedSrc = t.read().filter(col("ticker") === "AAPL")
      .orderBy("timestamp_ms").limit(3)
      .select(col("ticker").as("sym"), col("timestamp_ms").as("ts"),
        col("close").as("close_src"), col("trade_date").as("dt"))
    val freshSrc = matchedSrc.limit(1)
      .withColumn("sym", lit("ZZZZ")).withColumn("close_src", lit(42.0))
    val source = matchedSrc.unionByName(freshSrc).cache()
    source.count()
    // residual: only matched rows with positive source close update;
    // AAPL has injected null closes, so some key matches fail the residual
    val passing = matchedSrc.filter(col("close_src") > 0).count()
    t.mergeIntoOn(source,
        Seq("ticker" -> "sym", "timestamp_ms" -> "ts"),
        Some(col("source.close_src") > 0))
      .whenMatchedUpdate(Map("volume" -> lit(123L)))
      .whenNotMatchedInsert(Map(
        "ticker" -> col("source.sym"),
        "timestamp_ms" -> col("source.ts"),
        "trade_date" -> col("source.dt"),
        "close" -> col("source.close_src")))
      .execute()
    val after = t.read().cache()
    // key-matched rows failing the residual are NOT MATCHED → inserted
    val inserted = source.count() - passing
    assert(after.count() == total + inserted)
    assert(after.filter(col("volume") === 123L).count() == passing)
    assert(after.filter(col("ticker") === "ZZZZ" && col("close") === 42.0).count() == 1)
  }

  test("mergeInto(condition): equi conjuncts split from the residual") {
    val t = freshTable("gt_merge_cond")
    t.write(bars.repartition(2))
    val src = t.read().filter(col("ticker") === "MSFT").orderBy("timestamp_ms").limit(2)
      .select(col("ticker").as("sym"), col("timestamp_ms").as("ts"))
      .withColumn("flag", lit(1)).cache()
    src.count()
    t.mergeInto(src,
        col("target.ticker") === col("source.sym") &&
        col("target.timestamp_ms") === col("source.ts") &&
        col("source.flag") === 1)
      .whenMatchedUpdate(Map("volume" -> lit(5L)))
      .execute()
    assert(t.read().filter(col("volume") === 5L).count() == 2)
    // a condition with no target=source equi conjunct is rejected
    intercept[IllegalArgumentException] {
      t.mergeInto(src, col("source.flag") === 1)
    }
  }

  test("merge residual: key dups disambiguated by the residual do not raise") {
    val t = freshTable("gt_merge_resid_dup")
    t.write(bars.repartition(2))
    val one = t.read().filter(col("ticker") === "AAPL").orderBy("timestamp_ms").limit(1)
    // two source rows, same key, but only pick=1 passes the residual
    val dup = one.withColumn("pick", lit(1))
      .unionByName(one.withColumn("volume", lit(99L)).withColumn("pick", lit(0)))
      .cache()
    dup.count()
    t.mergeIntoOn(dup, Seq("ticker" -> "ticker", "timestamp_ms" -> "timestamp_ms"),
        Some(col("source.pick") === 1))
      .whenMatchedUpdate(Map("volume" -> lit(7L)))
      .execute()
    assert(t.read().filter(col("volume") === 7L).count() == 1)
    // both dups passing the residual DOES raise the row-precise guard
    val both = one.withColumn("pick", lit(1))
      .unionByName(one.withColumn("volume", lit(99L)).withColumn("pick", lit(1)))
    intercept[IllegalStateException] {
      t.mergeIntoOn(both, Seq("ticker" -> "ticker", "timestamp_ms" -> "timestamp_ms"),
          Some(col("source.pick") === 1))
        .whenMatchedUpdate(Map("volume" -> lit(8L)))
        .execute()
    }
  }

  test("identity columns: unique engine-assigned values, ALWAYS semantics, merge fills inserts only") {
    import spark.implicits._
    val path = graft.GraftTmp.dir("gt_identity").toString
    val t = graft.table.GraftTable(spark, path, Nil)
    t.write((0 until 50).map(i => (i.toLong, s"r$i")).toDF("k", "s").repartition(4))
    t.addIdentityColumn("rid", start = 100L, step = 2L)
    // rows predating the column read NULL (no backfill — Delta behavior)
    assert(t.read().filter(col("rid").isNotNull).count() == 0)

    // appends WITHOUT the column get assigned unique values from the mark
    t.write((50 until 80).map(i => (i.toLong, s"r$i")).toDF("k", "s"),
      org.apache.spark.sql.SaveMode.Append)
    val first = t.read().filter(col("rid").isNotNull)
      .select("rid").as[Long].collect().sorted
    assert(first.length == 30 && first.distinct.length == 30)
    assert(first.head >= 100L && first.forall(v => (v - 100L) % 2 == 0))

    // a second append continues ABOVE the advanced mark
    t.write((80 until 90).map(i => (i.toLong, s"r$i")).toDF("k", "s"),
      org.apache.spark.sql.SaveMode.Append)
    val all = t.read().filter(col("rid").isNotNull)
      .select("rid").as[Long].collect()
    assert(all.length == 40 && all.distinct.length == 40)
    assert(all.max >= first.max + 2L)

    // GENERATED ALWAYS: user-supplied values are rejected on write,
    // UPDATE of the column is rejected
    intercept[IllegalArgumentException] {
      t.write(Seq((99L, "x", 7L)).toDF("k", "s", "rid"),
        org.apache.spark.sql.SaveMode.Append)
    }
    intercept[IllegalArgumentException] {
      t.update(col("k") === 0L, Map("rid" -> lit(1L)))
    }

    // MERGE: inserted rows get fresh ids; matched rows keep theirs;
    // ALL-clauses and explicit identity assignment are rejected
    val src = Seq((60L, "upd"), (990L, "new"), (991L, "new2")).toDF("k", "s")
    intercept[IllegalArgumentException] {
      t.mergeInto(src, Seq("k")).whenNotMatchedInsertAll().execute()
    }
    val beforeIds = t.read().filter(col("k") === 60L)
      .select("rid").as[Long].collect().toSet
    t.mergeInto(src, Seq("k"))
      .whenMatchedUpdate(Map("s" -> col("source.s")))
      .whenNotMatchedInsert(Map("k" -> col("source.k"), "s" -> col("source.s")))
      .execute()
    val afterIds = t.read().filter(col("k") === 60L)
      .select("rid").as[Long].collect().toSet
    assert(afterIds == beforeIds, "matched rows keep their identity values")
    val newIds = t.read().filter(col("k") >= 990L)
      .select("rid").as[Long].collect()
    assert(newIds.length == 2 && newIds.forall(_ > all.max))
    val everything = t.read().filter(col("rid").isNotNull)
      .select("rid").as[Long].collect()
    assert(everything.length == everything.distinct.length,
      "identity values stay globally unique")
  }

  test("merge differential: random clause sets match a driver-side reference (seeded)") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260813L)
    for (trial <- 0 until 6) {
      val path = graft.GraftTmp.dir(s"gt_merge_fuzz$trial").toString
      val t = graft.table.GraftTable(spark, path, Nil)
      val n = 60
      val tgtRows = (0 until n).map(i => (i.toLong, rnd.nextInt(100).toLong))
      t.write(tgtRows.toDF("id", "v").repartition(3))
      // distinct source keys: a sample of existing ids (under a RENAMED
      // key column) plus some fresh ids — exercises the key-pair path
      val existing = rnd.shuffle((0 until n).toList).take(20)
      val fresh = (n until n + 10).filter(_ => rnd.nextBoolean())
      val srcRows = (existing ++ fresh).map(i =>
        (i.toLong, rnd.nextInt(100).toLong, rnd.nextInt(2)))
      val srcMap = srcRows.map(r => r._1 -> r).toMap
      val useResidual = rnd.nextBoolean()

      val withMU = rnd.nextBoolean(); val condMU = rnd.nextBoolean()
      val withMD = rnd.nextBoolean(); val condMD = rnd.nextBoolean()
      val withNI = rnd.nextBoolean(); val condNI = rnd.nextBoolean()
      val withND = rnd.nextBoolean() // nmbs delete (target.v < 30)
      val withNU = rnd.nextBoolean() // nmbs update (v = -1) after delete
      val anyClause = withMU || withMD || withNI || withND || withNU
      val mu = withMU || !anyClause // ensure at least one clause

      var b = t.mergeIntoOn(srcRows.toDF("sid", "sv", "pick"),
        Seq("id" -> "sid"),
        if (useResidual) Some(col("source.pick") === 1) else None)
      if (mu) b = if (condMU)
          b.whenMatchedUpdate(col("source.sv") >= 50, Map("v" -> col("source.sv")))
        else b.whenMatchedUpdate(Map("v" -> col("source.sv")))
      if (withMD) b = if (condMD) b.whenMatchedDelete(col("source.sv") < 25)
        else b.whenMatchedDelete()
      if (withNI) b = if (condNI)
          b.whenNotMatchedInsert(col("source.sv") >= 20,
            Map("id" -> col("source.sid"), "v" -> col("source.sv")))
        else b.whenNotMatchedInsert(
          Map("id" -> col("source.sid"), "v" -> col("source.sv")))
      if (withND) b = b.whenNotMatchedBySourceDelete(col("target.v") < 30)
      if (withNU) b = b.whenNotMatchedBySourceUpdate(Map("v" -> lit(-1L)))
      b.execute()

      // driver-side reference over the same rows
      def isMatch(id: Long) =
        srcMap.get(id).exists(s => !useResidual || s._3 == 1)
      val keptTargets = tgtRows.flatMap { case (id, v) =>
        if (isMatch(id)) {
          val sv = srcMap(id)._2
          if (mu && (!condMU || sv >= 50)) Some((id, sv))
          else if (withMD && (!condMD || sv < 25)) None
          else Some((id, v))
        } else {
          if (withND && v < 30) None
          else if (withNU) Some((id, -1L))
          else Some((id, v))
        }
      }
      val inserts = srcRows.collect {
        case (sid, sv, pick)
          if !(tgtRows.exists(_._1 == sid) && (!useResidual || pick == 1)) &&
             withNI && (!condNI || sv >= 20) => (sid, sv)
      }
      val expected = (keptTargets ++ inserts).sorted
      val actual = t.read().select("id", "v").as[(Long, Long)].collect().sorted
      assert(actual.toSeq == expected.toSeq,
        s"trial $trial (residual=$useResidual mu=$mu/$condMU md=$withMD/$condMD " +
        s"ni=$withNI/$condNI nd=$withND nu=$withNU): " +
        s"got ${actual.toSeq.take(80)} expected ${expected.toSeq.take(80)}")
    }
  }

  test("merge withSchemaEvolution: new columns NULL-backfill, generated recompute") {
    val t = freshTable("gt_merge_evo")
    t.write(bars.repartition(2))
    t.write(t.read().withColumn("vol2", col("volume") * 2),
      org.apache.spark.sql.SaveMode.Overwrite, overwriteSchema = true)
    t.addGeneratedColumn("vol2", "volume * 2")
    val total = t.read().count()
    val src = t.read().limit(2).withColumn("volume", lit(888L))
      .withColumn("vol2", col("volume") * 2)  // generation rule must hold
      .withColumn("score", lit(3.5))          // not in the target schema
    t.mergeIntoOn(src, Seq("ticker" -> "ticker", "timestamp_ms" -> "timestamp_ms"))
      .withSchemaEvolution()
      .whenMatchedUpdateAll()
      .execute()
    val after = t.read()
    assert(after.columns.contains("score"))
    assert(after.count() == total)
    assert(after.filter(col("score") === 3.5).count() == 2)
    assert(after.filter(col("score").isNull).count() == total - 2)
    assert(after.filter(col("volume") === 888L && col("vol2") === 1776L).count() == 2)
    // without the flag, an unknown source column is NOT added — the
    // aligned select drops it and the schema is unchanged
    t.mergeIntoOn(src.withColumn("extra2", lit(1)),
        Seq("ticker" -> "ticker", "timestamp_ms" -> "timestamp_ms"))
      .whenMatchedUpdateAll()
      .execute()
    assert(!t.read().columns.contains("extra2"))
  }

  test("merge residual: not-matched-by-source sees the full condition") {
    val t = freshTable("gt_merge_resid_nmbs")
    t.write(bars.repartition(2))
    val aapl = t.read().filter(col("ticker") === "AAPL").cache()
    val aaplCount = aapl.count()
    // source covers ALL AAPL keys, but the residual disqualifies every
    // pair → every AAPL row is NOT MATCHED BY SOURCE and retires
    val src = aapl.select(col("ticker").as("sym"), col("timestamp_ms").as("ts"))
      .withColumn("live", lit(0)).cache()
    src.count()
    t.mergeIntoOn(src, Seq("ticker" -> "sym", "timestamp_ms" -> "ts"),
        Some(col("source.live") === 1))
      .whenNotMatchedBySourceDelete(col("target.ticker") === "AAPL")
      .execute()
    assert(t.read().filter(col("ticker") === "AAPL").count() == 0)
    assert(t.readVersion(t.currentVersion - 1)
      .filter(col("ticker") === "AAPL").count() == aaplCount)
  }

  test("constraints are versioned: add/drop are commits, RESTORE restores the set") {
    val t = freshTable("gt_check_ver")
    t.write(bars.repartition(2))
    val vData = t.currentVersion
    t.addConstraint("vol_nonneg", "volume >= 0")
    val vCons = t.currentVersion
    assert(vCons == vData + 1)                         // the add IS a commit
    val ops = t.history().select("operation").collect().map(_.getString(0)).toSet
    assert(ops.contains("ADD CONSTRAINT"))
    t.dropConstraint("vol_nonneg")
    assert(t.constraints.isEmpty)
    t.restore(vCons)                                   // brings the constraint back
    assert(t.constraints.keySet == Set("vol_nonneg"))
    intercept[IllegalArgumentException] {              // still enforced post-restore
      t.update(col("ticker") === "AAPL", Map("volume" -> lit(-5L)))
    }
    assert(t.constraintsOf(vData).isEmpty)             // time travel sees the old set
    intercept[IllegalArgumentException] { t.addConstraint("bad\tname", "volume >= 0") }
  }

  test("shallow clone: zero-copy, copy-on-write divergence, source untouched") {
    val src = freshTable("gt_clone_src")
    src.write(bars.repartition(4))
    src.addConstraint("vol_floor", "volume >= 0")
    val srcRows = src.read().count()
    val srcFiles = src.manifestFiles().toSet

    val clonePath = graft.GraftTmp.dir("gt_clone_dst").toString
    val clone = src.shallowClone(clonePath)
    // zero-copy: identical rows, no parquet under the clone root yet
    assert(clone.read().count() == srcRows)
    assert(clone.manifestFiles().forall(_.startsWith("/")))
    assert(clone.constraints.keySet == Set("vol_floor")) // constraints travel
    assert(clone.history().select("operation").collect().map(_.getString(0)).toSeq
      == Seq("CLONE"))
    assert(clone.detail().sizeInBytes == src.detail().sizeInBytes)
    // stats are CARRIED from the source sidecar, not re-read from
    // footers (zero footer reads — "clone costs one manifest write"):
    // byte-identical bounds under the rewritten absolute keys
    val srcRoot = new org.apache.hadoop.fs.Path(src.path).toUri.getPath
    val expectedStats = src.statsOf(src.currentVersion)
      .map { case (f, cols) => s"$srcRoot/$f" -> cols }
    assert(expectedStats.nonEmpty)
    assert(clone.statsOf(0L) == expectedStats)

    // copy-on-write divergence: delete on the clone rewrites ONLY the
    // affected files into the clone's directory; the source is untouched
    val aapl = clone.read().filter(col("ticker") === "AAPL").count()
    clone.delete(col("ticker") === "AAPL")
    assert(clone.read().count() == srcRows - aapl)
    assert(src.read().count() == srcRows)
    assert(src.manifestFiles().toSet == srcFiles)
    // unaffected entries still point at the source; none of the clone's
    // rewritten files live outside its root
    assert(clone.manifestFiles().exists(_.startsWith("/")))

    // constraints still gate the clone
    intercept[IllegalArgumentException] {
      clone.update(col("ticker") === "MSFT", Map("volume" -> lit(-1L)))
    }

    // OPTIMIZE materializes the clone fully local; vacuum afterwards
    // reclaims only clone-local orphans (source files were never local)
    clone.optimize(Seq("timestamp_ms"))
    assert(clone.manifestFiles().forall(!_.startsWith("/")))
    clone.vacuum(0.0, retentionCheckEnabled = false)
    assert(src.read().count() == srcRows) // source data intact end to end
    assert(clone.read().count() == srcRows - aapl)
  }

  test("clone at a version captures that version's files and constraints") {
    val src = freshTable("gt_clone_v")
    src.write(bars.repartition(2))
    val v0 = src.currentVersion
    val total = src.read().count()
    src.addConstraint("vol_floor", "volume >= 0")
    src.delete(col("ticker") === "AAPL")
    val clone = src.shallowClone(
      graft.GraftTmp.dir("gt_clone_v_dst").toString, v0)
    assert(clone.read().count() == total)                  // pre-delete rows
    assert(clone.constraints.isEmpty)                      // v0 had none
    intercept[IllegalArgumentException] { src.shallowClone("/tmp/x", 999L) }
  }

  test("time travel to a vacuumed version fails at scan time (Delta contract)") {
    val t = freshTable("gt_tt_vac")
    t.write(bars.repartition(2))
    t.optimize(Seq("timestamp_ms"))                        // v0 files become orphans
    t.vacuum(0.0, retentionCheckEnabled = false)
    intercept[Exception] { t.readVersion(0).count() }      // files are gone
    assert(t.read().count() == bars.count())               // current still fine
  }

  test("log cleanup bounds the manifest log; current version unaffected") {
    val t = freshTable("gt_logclean")
    t.write(bars.repartition(2))
    (1 to 6).foreach(_ => t.optimize(Seq("timestamp_ms")))
    assert(t.currentVersion == 6L)
    val dropped = t.cleanupLog(keepVersions = 2)
    assert(dropped == 5)                                   // v0..v4 gone
    assert(t.currentVersion == 6L)
    assert(t.read().count() == bars.count())               // current intact
    assert(t.history().count() == 2)                       // v5, v6 remain
    intercept[Exception] { t.readVersion(0) }              // time travel gone
    assert(t.readVersion(5).count() == bars.count())       // retained one works
    assert(t.cleanupLog(keepVersions = 2) == 0)            // idempotent
    // maintenance still works on the truncated log
    t.optimize(Seq("timestamp_ms"))
    assert(t.currentVersion == 7L)
  }

  test("merge rejects a source missing target columns") {
    val t = freshTable("gt_merge_bad")
    t.write(bars.repartition(2))
    intercept[IllegalArgumentException] {
      t.merge(bars.drop("volume"), Seq("ticker", "timestamp_ms"))
    }
  }

  test("merge accepts a NARROW source for explicit-assignment clauses (sync shape)") {
    val t = freshTable("gt_merge_narrow")
    t.write(bars.repartition(2))
    val total = t.read().count()
    // source carries only the key + the one changed column — the shape a
    // sync feed actually ships; UPDATE ALL would (rightly) reject it
    val narrow = t.read().limit(5)
      .select(col("ticker"), col("timestamp_ms"))
      .withColumn("volume", lit(31337L))
    t.mergeInto(narrow, Seq("ticker", "timestamp_ms"))
      .whenMatchedUpdate(Map("volume" -> col("source.volume")))
      .execute()
    assert(t.read().count() == total)
    assert(t.read().filter(col("volume") === 31337L).count() == 5)
  }

  test("whenNotMatchedBySource: delete and update retire rows absent from the source") {
    val t = freshTable("gt_merge_nmbs")
    t.write(bars.repartition(2))
    val total = t.read().count()
    val aapl = t.read().filter(col("ticker") === "AAPL").count()
    val msftEven = t.read()
      .filter(col("ticker") === "MSFT" && pmod(col("volume"), lit(2)) === 0).count()
    assert(aapl > 0 && msftEven > 0)

    // source covers AAPL + MSFT keys; every other ticker is unmatched-by-
    // source → deleted; MSFT rows match and keep; conditional NMBS must
    // not fire on matched rows
    val src = t.read().filter(col("ticker").isin("AAPL", "MSFT"))
    val msft = t.read().filter(col("ticker") === "MSFT").count()
    t.mergeInto(src, Seq("ticker", "timestamp_ms"))
      .whenNotMatchedBySourceDelete()
      .execute()
    assert(t.read().count() == aapl + msft)
    assert(t.read().select("ticker").distinct().count() == 2)

    // NMBS UPDATE with a target-side condition; unmatched rows below the
    // condition stay untouched
    val src2 = t.read().filter(col("ticker") === "AAPL")
    t.mergeInto(src2, Seq("ticker", "timestamp_ms"))
      .whenNotMatchedBySourceUpdate(pmod(col("target.volume"), lit(2)) === 0,
        Map("volume" -> lit(-5L)))
      .execute()
    assert(t.read().filter(col("volume") === -5L).count() == msftEven)
    assert(t.read().filter(col("ticker") === "AAPL" && col("volume") === -5L).count() == 0)
    assert(t.read().count() == aapl + msft, "NMBS UPDATE must not drop rows")
  }

  test("explicit insert list: unmentioned columns NULL, generated columns recompute") {
    val t = freshTable("gt_merge_inslist")
    t.write(bars.repartition(2))
    // declare close_x2 generated (over an existing column pattern: use a
    // derivable column on this schema — vwap is present; declare a rule
    // over volume instead on a fresh derived column via mergeSchema)
    t.write(t.read().withColumn("vol2", col("volume") * 2),
      org.apache.spark.sql.SaveMode.Overwrite, overwriteSchema = true)
    t.addGeneratedColumn("vol2", "volume * 2")
    val total = t.read().count()

    val fresh = t.read().limit(3)
      .select(col("ticker"), col("trade_date"),
        (col("timestamp_ms") + 987654321L).as("timestamp_ms"))
      .withColumn("volume", lit(999999937L))
    t.mergeInto(fresh, Seq("ticker", "timestamp_ms"))
      .whenNotMatchedInsert(Map(
        "ticker" -> col("source.ticker"),
        "trade_date" -> col("source.trade_date"),
        "timestamp_ms" -> col("source.timestamp_ms"),
        "volume" -> col("source.volume")))
      .execute()
    assert(t.read().count() == total + 3)
    val ins = t.read().filter(col("volume") === 999999937L)
    assert(ins.count() == 3)
    assert(ins.filter(col("close").isNull && col("open").isNull).count() == 3,
      "unmentioned columns must land NULL")
    // the generated column recomputed from its definition, not NULL
    assert(ins.filter(col("vol2") === col("volume") * 2).count() == 3)
  }
}
