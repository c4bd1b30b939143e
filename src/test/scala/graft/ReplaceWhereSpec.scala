package graft

import java.nio.file.Files

import org.apache.spark.sql.{SaveMode, Row}
import org.apache.spark.sql.functions._
import graft.ingest.BarSource
import graft.table.GraftTable
import graft.transform.Enrich

/** Targeted overwrites — Delta's `option("replaceWhere", …)` and
  * `partitionOverwriteMode=dynamic` — plus the round-8 commit-closure
  * hardening: base-derived property commits (concurrent SET survives an
  * interleaved identity append) and atomic MERGE schema evolution.
  */
class ReplaceWhereSpec extends SparkSpec {

  private def freshTable(prefix: String): (GraftTable, String) = {
    val path = graft.GraftTmp.dir(prefix).toString
    (GraftTable(spark, path, Seq("ticker", "trade_date")), path)
  }

  private def bars = Enrich.withTimeColumns(
    BarSource.harvest(spark, delayMs = 0)).cache()

  test("replaceWhere on partition columns swaps exactly the matching files") {
    val (t, _) = freshTable("rw_part")
    t.write(bars.repartition(4))
    val total = t.read().count()
    val slice = bars.filter(col("ticker") === "AAPL" &&
      col("trade_date") === "2024-01-08")
    val sliceN = slice.count()
    assert(sliceN > 0)
    val before = t.manifestFiles().toSet

    // halve the slice's volumes and put it back through replaceWhere
    val replacement = slice.withColumn("volume", (col("volume") / 2).cast("long"))
    t.write(replacement, SaveMode.Overwrite,
      replaceWhere = Some("ticker = 'AAPL' AND trade_date = '2024-01-08'"))

    val after = t.manifestFiles().toSet
    // untouched partitions' files carried over VERBATIM — no rewrite
    val untouched = before.filterNot(_.contains("ticker=AAPL/trade_date=2024-01-08"))
    assert(untouched.subsetOf(after))
    assert(before.diff(after).forall(_.contains("ticker=AAPL/trade_date=2024-01-08")))
    // row-level semantics: same total, halved volumes inside the slice
    assert(t.read().count() == total)
    val volNow = t.read().filter(col("ticker") === "AAPL" &&
      col("trade_date") === "2024-01-08").agg(sum("volume")).collect()(0).getLong(0)
    val volWas = slice.agg(sum("volume")).collect()(0).getLong(0)
    assert(volNow == replacement.agg(sum("volume")).collect()(0).getLong(0))
    assert(volNow < volWas)
    // pre-replace version still time-travels to the old slice
    assert(t.readVersion(t.currentVersion - 1).count() == total)
  }

  test("replaceWhere rejects incoming rows outside the predicate") {
    val (t, _) = freshTable("rw_viol")
    t.write(bars.repartition(2))
    val countBefore = t.read().count()
    val vBefore = t.currentVersion
    val e = intercept[IllegalArgumentException] {
      t.write(bars.filter(col("ticker").isin("AAPL", "MSFT")),
        SaveMode.Overwrite, replaceWhere = Some("ticker = 'AAPL'"))
    }
    assert(e.getMessage.contains("replaceWhere"))
    // nothing committed, nothing lost
    assert(t.currentVersion == vBefore)
    assert(t.read().count() == countBefore)
  }

  test("replaceWhere on a data predicate keeps non-matching rows of rewritten files") {
    val (t, _) = freshTable("rw_data")
    t.write(bars.repartition(4))
    val total = t.read().count()
    // volume is NOT a partition column: files holding matching rows are
    // rewritten keeping their non-matching rows
    val cut = t.read().agg(expr("percentile_approx(volume, 0.9)"))
      .collect()(0).getLong(0)
    val highN = t.read().filter(col("volume") >= cut).count()
    assert(highN > 0 && highN < total)
    // replace all high-volume rows with a single synthetic row
    val one = t.read().filter(col("volume") >= cut).limit(1)
      .withColumn("volume", lit(Long.MaxValue))
    t.write(one, SaveMode.Overwrite, replaceWhere = Some(s"volume >= $cut"))
    val now = t.read()
    assert(now.count() == total - highN + 1)
    assert(now.filter(col("volume") >= cut && col("volume") =!= Long.MaxValue)
      .count() == 0)
    // the low-volume rows all survived (NULL volumes never match the
    // predicate, so they are kept too — SQL three-valued semantics)
    assert(now.filter(col("volume") < cut || col("volume").isNull).count()
      == total - highN)
  }

  test("dynamic partition overwrite replaces only the partitions written") {
    val (t, _) = freshTable("rw_dpo")
    t.write(bars.repartition(4))
    val total = t.read().count()
    val before = t.manifestFiles().toSet
    val slice = bars.filter(col("ticker") === "MSFT" &&
      col("trade_date") === "2024-01-09")
    val sliceN = slice.count()
    assert(sliceN > 0)
    t.write(slice.withColumn("volume", lit(7L)), SaveMode.Overwrite,
      dynamicPartitionOverwrite = true)
    val after = t.manifestFiles().toSet
    val untouched = before.filterNot(_.contains("ticker=MSFT/trade_date=2024-01-09"))
    assert(untouched.subsetOf(after))
    assert(t.read().count() == total)
    assert(t.read().filter(col("ticker") === "MSFT" &&
      col("trade_date") === "2024-01-09")
      .agg(sum("volume")).collect()(0).getLong(0) == 7L * sliceN)
  }

  test("writer options: replaceWhere and partitionOverwriteMode reach format(\"graft\")") {
    val (t, path) = freshTable("rw_opts")
    bars.write.format("graft").option("partitionBy", "ticker,trade_date")
      .mode(SaveMode.Overwrite).save(path)
    val total = spark.read.format("graft").load(path).count()
    // option-level replaceWhere
    val slice = bars.filter(col("ticker") === "TSLA" &&
      col("trade_date") === "2024-01-10")
    slice.withColumn("volume", lit(1L)).write.format("graft")
      .option("partitionBy", "ticker,trade_date")
      .option("replaceWhere", "ticker = 'TSLA' AND trade_date = '2024-01-10'")
      .mode(SaveMode.Overwrite).save(path)
    assert(spark.read.format("graft").load(path).count() == total)
    // conf-level dynamic partition overwrite
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      slice.withColumn("volume", lit(2L)).write.format("graft")
        .option("partitionBy", "ticker,trade_date")
        .mode(SaveMode.Overwrite).save(path)
    } finally spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    val back = spark.read.format("graft").load(path)
    assert(back.count() == total)
    assert(back.filter(col("ticker") === "TSLA" &&
      col("trade_date") === "2024-01-10")
      .select(sum("volume")).collect()(0).getLong(0) == 2L * slice.count())
    // invalid combinations fail fast
    intercept[IllegalArgumentException] {
      t.write(slice, SaveMode.Append, replaceWhere = Some("ticker = 'TSLA'"))
    }
    intercept[IllegalArgumentException] {
      t.write(slice, SaveMode.Overwrite, replaceWhere = Some("ticker = 'TSLA'"),
        dynamicPartitionOverwrite = true)
    }
  }

  test("INSERT OVERWRITE PARTITION maps to replaceWhere through DSv2") {
    val (_, path) = freshTable("rw_sql")
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    import spark.implicits._
    val df = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("k", "v")
    df.write.format("graft").option("partitionBy", "k")
      .mode(SaveMode.Overwrite).save(path)
    spark.sql(s"INSERT OVERWRITE graft.`$path` PARTITION (k = 'a') VALUES (9)")
    val back = spark.read.format("graft").load(path)
    assert(back.filter(col("k") === "a").select("v").collect()
      .map(_.getLong(0)).toSeq == Seq(9L))
    assert(back.filter(col("k") === "b").count() == 1)
  }

  test("disjoint replaceWhere commits race without losing either slice") {
    val (t, _) = freshTable("rw_race")
    t.write(bars.repartition(4))
    val total = t.read().count()
    val a = bars.filter(col("ticker") === "AAPL")
      .withColumn("volume", lit(11L)).cache()
    val b = bars.filter(col("ticker") === "MSFT")
      .withColumn("volume", lit(22L)).cache()
    a.count(); b.count()
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val fa = Future(t.write(a, SaveMode.Overwrite,
      replaceWhere = Some("ticker = 'AAPL'")))
    val fb = Future(t.write(b, SaveMode.Overwrite,
      replaceWhere = Some("ticker = 'MSFT'")))
    Await.result(fa, 120.seconds); Await.result(fb, 120.seconds)
    val now = t.read()
    assert(now.count() == total)
    assert(now.filter(col("ticker") === "AAPL" && col("volume") =!= 11L).count() == 0)
    assert(now.filter(col("ticker") === "MSFT" && col("volume") =!= 22L).count() == 0)
  }

  test("concurrent SET TBLPROPERTIES commits both survive (no lost update)") {
    val (t, _) = freshTable("rw_props")
    t.write(bars.limit(10))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val fs = (1 to 4).map { i =>
      Future(t.setProperties(Map(s"user.key$i" -> i.toString)))
    }
    fs.foreach(Await.result(_, 60.seconds))
    val props = t.properties
    (1 to 4).foreach(i => assert(props.get(s"user.key$i").contains(i.toString),
      s"user.key$i lost: $props"))
  }

  test("identity append preserves a concurrently set property") {
    import spark.implicits._
    val path = graft.GraftTmp.dir("rw_idprop").toString
    val t = GraftTable(spark, path, Nil)
    t.write(Seq((1L, "x")).toDF("v", "s"))
    t.addIdentityColumn("id")
    // identity appends bake a property DELTA applied over the claimed
    // base — interleave a SET between plan and commit via a concurrent
    // writer storm
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    // identity allocation ABORTS under concurrency by contract — the
    // caller re-runs; the property assertion below is what must hold
    // regardless of interleaving
    def retryCme[T](body: => T): T = {
      var last: Throwable = null
      (1 to 10).foreach { _ =>
        try return body
        catch { case e: java.util.ConcurrentModificationException => last = e }
      }
      throw last
    }
    val writes = (1 to 3).map(i => Future(retryCme(
      t.write(Seq((i.toLong + 10, "y")).toDF("v", "s"), SaveMode.Append))))
    val setP = Future(t.setProperties(Map("graft.autoCompact" -> "false")))
    writes.foreach(Await.result(_, 60.seconds))
    Await.result(setP, 60.seconds)
    assert(t.properties.get("graft.autoCompact").contains("false"),
      s"concurrent SET lost by identity append: ${t.properties}")
    // identity values stayed unique (the first write predates the
    // identity column, so its rows legitimately read NULL)
    val ids = t.read().filter(col("id").isNotNull).select("id").as[Long].collect()
    assert(ids.length == 3 && ids.distinct.length == ids.length)
  }

  test("UNSET TBLPROPERTIES refuses reserved identity metadata") {
    import spark.implicits._
    val path = graft.GraftTmp.dir("rw_unset").toString
    val t = GraftTable(spark, path, Nil)
    t.write(Seq((1L, "x")).toDF("v", "s"))
    t.addIdentityColumn("id")
    val key = "graft.identity.id"
    assert(t.properties.contains(key))
    intercept[IllegalArgumentException] { t.unsetProperties(Seq(key)) }
    assert(t.properties.contains(key))
  }

  test("aborted MERGE WITH SCHEMA EVOLUTION leaves the schema unevolved") {
    import spark.implicits._
    val path = graft.GraftTmp.dir("rw_mergeevo").toString
    val t = GraftTable(spark, path, Nil)
    t.write(Seq((1L, "a"), (2L, "b")).toDF("k", "s"))
    t.addConstraint("k_pos", "k > 0")
    val vBefore = t.currentVersion
    val colsBefore = t.read().columns.toSeq
    // source carries a NEW column and a constraint-violating insert: the
    // merge must abort, and with it the schema evolution (atomicity)
    val source = Seq((-1L, "c", 99L)).toDF("k", "s", "extra")
    intercept[Exception] {
      t.mergeInto(source, Seq("k")).withSchemaEvolution()
        .whenNotMatchedInsertAll().execute()
    }
    assert(t.currentVersion == vBefore, "aborted merge must not commit")
    assert(t.read().columns.toSeq == colsBefore,
      "aborted merge must not evolve the schema")
    // the successful merge evolves schema + rows in ONE commit
    val ok = Seq((3L, "c", 99L)).toDF("k", "s", "extra")
    t.mergeInto(ok, Seq("k")).withSchemaEvolution()
      .whenNotMatchedInsertAll().execute()
    assert(t.currentVersion == vBefore + 1,
      "schema evolution and rows must land in one commit")
    assert(t.read().columns.contains("extra"))
    assert(t.read().filter(col("k") === 3).select("extra")
      .collect()(0).getLong(0) == 99L)
    // pre-existing rows read the new column as NULL
    assert(t.read().filter(col("k") === 1).select("extra")
      .collect()(0).isNullAt(0))
  }
}
