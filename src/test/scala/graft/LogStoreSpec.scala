package graft

import java.net.URI
import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataOutputStream, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable
import org.apache.spark.sql.functions._
import graft.table.{AtomicCreateLogStore, GraftTable, LogStore, SingleDriverLogStore}

/** The commit-claim seam (LogStore.scala). The load-bearing test is the
  * non-atomic-store simulation: a filesystem whose
  * `create(path, overwrite=false)` silently succeeds on an existing
  * path (the HEAD-then-PUT shape of plain S3) lets TWO claimers of the
  * same version both "succeed" under the default atomic-create store —
  * and the single-driver store catches exactly that race. */
class LogStoreSpec extends SparkSpec {

  /** HEAD-then-PUT store: create-no-overwrite silently overwrites.
    * All public `create` entry points funnel through the permission
    * variant, so forcing `overwrite=true` there simulates the race
    * deterministically. */
  private class NonAtomicFs extends RawLocalFileSystem {
    override def create(f: Path, overwrite: Boolean, bufferSize: Int,
        replication: Short, blockSize: Long,
        progress: Progressable): FSDataOutputStream =
      super.create(f, true, bufferSize, replication, blockSize, progress)
    override def create(f: Path, permission: FsPermission,
        overwrite: Boolean, bufferSize: Int, replication: Short,
        blockSize: Long, progress: Progressable): FSDataOutputStream =
      super.create(f, permission, true, bufferSize, replication,
        blockSize, progress)
  }

  private def nonAtomicFs(): NonAtomicFs = {
    val fs = new NonAtomicFs
    fs.initialize(URI.create("file:///"), new Configuration())
    fs
  }

  private def freshClaim(prefix: String): Path =
    new Path(graft.GraftTmp.dir(prefix).toString,
      "v00000000000000000007.claim")

  test("non-atomic create lets two claimers both succeed under the default store") {
    val fs = nonAtomicFs()
    val claim = freshClaim("ls_hazard")
    // the hazard the seam exists for: both writers believe they own v7
    AtomicCreateLogStore.createExclusive(fs, claim)
    AtomicCreateLogStore.createExclusive(fs, claim)
    assert(fs.exists(claim))
  }

  test("single-driver store rejects the second claimer on the same non-atomic store") {
    val fs = nonAtomicFs()
    val claim = freshClaim("ls_single")
    SingleDriverLogStore.createExclusive(fs, claim)
    val e = intercept[GraftTable.CommitConflictException] {
      SingleDriverLogStore.createExclusive(fs, claim)
    }
    assert(e.getMessage.contains("claimed"))
  }

  test("single-driver store rejects a claim file left by an earlier JVM") {
    val fs = nonAtomicFs()
    val claim = freshClaim("ls_stale")
    // simulate another process's claim: file exists, not in this JVM's registry
    fs.create(claim, true).close()
    intercept[GraftTable.CommitConflictException] {
      SingleDriverLogStore.createExclusive(fs, claim)
    }
  }

  test("single-driver store admits exactly one of N concurrent claimers") {
    val fs = nonAtomicFs()
    val claim = freshClaim("ls_race")
    val gate = new java.util.concurrent.CountDownLatch(1)
    val outcomes = new java.util.concurrent.ConcurrentLinkedQueue[Boolean]()
    val threads = (1 to 8).map { _ =>
      new Thread(() => {
        gate.await()
        try { SingleDriverLogStore.createExclusive(fs, claim); outcomes.add(true) }
        catch { case _: GraftTable.CommitConflictException => outcomes.add(false) }
      })
    }
    threads.foreach(_.start()); gate.countDown(); threads.foreach(_.join())
    import scala.jdk.CollectionConverters._
    assert(outcomes.asScala.count(identity) == 1)
  }

  test("atomic store stays exclusive on the real local filesystem (O_EXCL path)") {
    val spark0 = spark // force session init so Hadoop conf exists
    val claim = freshClaim("ls_local")
    val fs = claim.getFileSystem(spark0.sessionState.newHadoopConf())
    AtomicCreateLogStore.createExclusive(fs, claim)
    intercept[GraftTable.CommitConflictException] {
      AtomicCreateLogStore.createExclusive(fs, claim)
    }
  }

  test("resolver: default atomic, conf-selected single-driver, custom class") {
    assert(LogStore.resolve(spark) eq AtomicCreateLogStore)
    spark.conf.set(LogStore.ConfKey, "single-driver")
    try assert(LogStore.resolve(spark) eq SingleDriverLogStore)
    finally spark.conf.unset(LogStore.ConfKey)
    spark.conf.set(LogStore.ConfKey, classOf[CustomTestLogStore].getName)
    try assert(LogStore.resolve(spark).isInstanceOf[CustomTestLogStore])
    finally spark.conf.unset(LogStore.ConfKey)
  }

  test("release() forgets a single-driver claim so the slot is claimable again") {
    val fs = nonAtomicFs()
    val claim = freshClaim("ls_release")
    SingleDriverLogStore.createExclusive(fs, claim)
    // what the commit failure sweep does: claim FILE deleted, then release
    fs.delete(claim, false)
    intercept[GraftTable.CommitConflictException] {
      SingleDriverLogStore.createExclusive(fs, claim) // registry still holds it
    }
    SingleDriverLogStore.release(fs, claim)
    SingleDriverLogStore.createExclusive(fs, claim) // now retryable
    assert(fs.exists(claim))
  }

  test("a post-claim commit failure does not wedge the table under the single-driver store") {
    spark.conf.set(LogStore.ConfKey, "single-driver")
    try {
      val path = graft.GraftTmp.dir("ls_wedge").toString
      val t = GraftTable(spark, path)
      val df = spark.range(50).select(col("id"), (col("id") % 5).as("k"))
      t.write(df) // v0
      // deterministic failure AFTER claimVersion: commitClaimed's first
      // sidecar write creates `.v…actions.tsv.tmp`; a directory planted
      // at that path makes fs.create(tmp, overwrite=true) throw, which
      // exercises the failure sweep (claim file delete + store release)
      val fs = new Path(path).getFileSystem(
        spark.sessionState.newHadoopConf())
      val logDir = new Path(path, "_graft_log")
      val obstacle = new Path(logDir, f".v${1L}%020d.actions.tsv.tmp")
      fs.mkdirs(obstacle)
      intercept[Exception] {
        t.write(df, org.apache.spark.sql.SaveMode.Append)
      }
      fs.delete(obstacle, true)
      // before the sweep called release(), this retry of version 1 threw
      // "claimed in this JVM" forever — the wedge ADVICE flagged
      t.write(df.filter(col("k") === 0), org.apache.spark.sql.SaveMode.Append)
      assert(t.read().count() == 60)
      assert(t.currentVersion == 1)
    } finally spark.conf.unset(LogStore.ConfKey)
  }

  test("table commits run end-to-end under the single-driver store") {
    spark.conf.set(LogStore.ConfKey, "single-driver")
    try {
      val path = graft.GraftTmp.dir("ls_table").toString
      val t = GraftTable(spark, path)
      val df = spark.range(100).select(col("id"), (col("id") % 5).as("k"))
      t.write(df)
      t.write(df.filter(col("k") === 0),
        org.apache.spark.sql.SaveMode.Append)
      assert(t.read().count() == 120)
      assert(t.history().count() >= 2)
    } finally spark.conf.unset(LogStore.ConfKey)
  }
}

/** No-arg-constructible store for the resolver's custom-class path. */
class CustomTestLogStore extends LogStore {
  override def createExclusive(
      fs: org.apache.hadoop.fs.FileSystem, path: Path): Unit =
    AtomicCreateLogStore.createExclusive(fs, path)
}
