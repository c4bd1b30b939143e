package graft

import org.apache.spark.sql.functions._
import graft.functions.{ZOrder, ZOrderKernel}

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleave kernel: known bit patterns") {
    // a=0b11, b=0b00 → bits of a at odd positions: 0b1010
    assert(ZOrderKernel.interleave2(3, 0) == 0xA)
    assert(ZOrderKernel.interleave2(0, 3) == 0x5)
    assert(ZOrderKernel.interleave2(0xFFFF, 0xFFFF) == 0xFFFFFFFFL)
    assert(ZOrderKernel.interleave3(1, 0, 0) == 4)
    assert(ZOrderKernel.interleave3(0, 1, 0) == 2)
    assert(ZOrderKernel.interleave4(0, 0, 0, 1) == 1)
  }

  test("interleave kernel is monotone per dimension") {
    val r = new scala.util.Random(1)
    (1 to 200).foreach { _ =>
      val a = r.nextInt(65535); val b = r.nextInt(65536)
      assert(ZOrderKernel.interleave2(a, b) < ZOrderKernel.interleave2(a + 1, b))
      assert(ZOrderKernel.interleave2(b, a) < ZOrderKernel.interleave2(b, a + 1))
    }
  }

  test("z-order preserves quadrant locality") {
    // points sorted by morton key: each top-level quadrant is contiguous
    val pts = for (x <- 0 until 64; y <- 0 until 64) yield (x, y)
    val sorted = pts.sortBy { case (x, y) =>
      ZOrderKernel.interleave2(x * 1024, y * 1024) // scale into 16-bit space
    }
    def quadrant(p: (Int, Int)): Int = (if (p._1 >= 32) 2 else 0) + (if (p._2 >= 32) 1 else 0)
    val qs = sorted.map(quadrant)
    // contiguity: number of quadrant changes along the curve is exactly 3
    val changes = qs.sliding(2).count(p => p(0) != p(1))
    assert(changes == 3, s"expected 3 quadrant transitions, got $changes")
  }

  test("zorderKey column matches kernel on normalized data") {
    val df = Seq((0L, 0L), (100L, 50L), (50L, 100L)).toDF("x", "y")
    val keys = df.withColumn("z", ZOrder.zorderKey(df, Seq("x", "y")))
      .orderBy("x").select("z").as[Long].collect()
    assert(keys(0) == ZOrderKernel.interleave2(0, 0))
    assert(keys(1) == ZOrderKernel.interleave2(32767, 65535)) // x=50/100, y=100/100
    assert(keys(2) == ZOrderKernel.interleave2(65535, 32767))
  }

  test("optimize with two cluster columns produces z-clustered files") {
    import java.nio.file.Files
    val path = graft.GraftTmp.dir("gt_zorder").toString
    val t = graft.table.GraftTable(spark, path, Nil)
    val data = (0 until 4096).map(i => (i % 64, (i * 7) % 64, i.toLong))
      .toDF("x", "y", "payload")
    t.write(data.repartition(4))
    t.optimize(Seq("x", "y"))
    assert(t.read().count() == 4096)
    assert(t.health().numFiles == 1)
    // within the single compacted file, rows follow the morton curve
    val xy = t.read().select("x", "y").as[(Int, Int)].collect()
    val keys = xy.map { case (x, y) =>
      ZOrderKernel.interleave2(x * 65535 / 63, y * 65535 / 63)
    }
    assert(keys.sameElements(keys.sorted), "rows not in morton order")
  }

  test("incremental OPTIMIZE: same-key re-runs skip, appends re-cluster only the delta") {
    import spark.implicits._
    val path = graft.GraftTmp.dir("zorder_incr").toString
    val t = graft.table.GraftTable(spark, path)
    t.write((1 to 20000).map(i => (i.toLong, (i * 7919) % 1000)).toDF("id", "k")
      .repartition(4))
    // small target so optimized output clears the size floor
    t.optimize(Seq("k"), targetFileSizeBytes = 64 * 1024)
    val afterFirst = t.manifestFiles().toSet
    val v1 = t.currentVersion

    // same keys, nothing new: pure no-op commit, manifest untouched
    t.optimize(Seq("k"), targetFileSizeBytes = 64 * 1024)
    assert(t.manifestFiles().toSet == afterFirst,
      "same-key re-OPTIMIZE must not rewrite already-clustered files")
    assert(t.currentVersion == v1 + 1)

    // an append leaves the optimized files alone and clusters the delta
    t.write((2001 to 2300).map(i => (i.toLong, (i * 7919) % 1000)).toDF("id", "k"),
      org.apache.spark.sql.SaveMode.Append)
    val appended = t.manifestFiles().toSet -- afterFirst
    t.optimize(Seq("k"), targetFileSizeBytes = 64 * 1024)
    val now = t.manifestFiles().toSet
    assert((afterFirst & now) == afterFirst,
      "previously optimized files survive a delta OPTIMIZE")
    assert((now & appended).isEmpty, "the appended small files were re-clustered")
    assert(t.read().count() == 20300)

    // DIFFERENT keys invalidate the provenance: full rewrite
    t.optimize(Seq("id"), targetFileSizeBytes = 64 * 1024)
    assert((t.manifestFiles().toSet & afterFirst).isEmpty,
      "changing cluster keys must rewrite everything")
    assert(t.read().count() == 20300)

    // OPTIMIZE ... FULL bypasses the skip: same keys, forced rewrite
    val beforeFull = t.manifestFiles().toSet
    t.optimize(Seq("id"), targetFileSizeBytes = 64 * 1024, full = true)
    assert((t.manifestFiles().toSet & beforeFull).isEmpty,
      "FULL must re-cluster even provenance-matched files")
    assert(t.read().count() == 20300)
  }

  test("partitioned OPTIMIZE converges: per-partition lone tails never re-churn") {
    import spark.implicits._
    // every partition's clustered output is far BELOW the size floor
    // (the default 1 GiB target): the old GLOBAL lone-file churn guard
    // saw #partitions todo files and rewrote each identical tail on
    // every run — the per-partition guard must skip them all
    val path = graft.GraftTmp.dir("zorder_part").toString
    val t = graft.table.GraftTable(spark, path, Seq("p"))
    t.write((1 to 9000).map(i => (i.toLong, i % 3, (i * 7919) % 1000))
      .toDF("id", "p", "k").repartition(4))
    t.optimize(Seq("k"))
    val afterFirst = t.manifestFiles().toSet
    val v1 = t.currentVersion
    // nothing new in ANY partition: metadata-only commit
    t.optimize(Seq("k"))
    assert(t.manifestFiles().toSet == afterFirst,
      "lone undersized per-partition tails must not re-churn")
    assert(t.currentVersion == v1 + 1)
    // an append into ONE partition re-clusters that partition only
    t.write(Seq((9001L, 1, 42)).toDF("id", "p", "k"),
      org.apache.spark.sql.SaveMode.Append)
    t.optimize(Seq("k"))
    val now = t.manifestFiles().toSet
    val untouched = afterFirst.filterNot(_.contains("p=1"))
    assert((now & untouched) == untouched,
      "partitions without new data must carry their files unrewritten")
    assert(afterFirst.filter(_.contains("p=1")).forall(f => !now.contains(f)),
      "the churned partition's tail must combine with its append")
    assert(t.read().count() == 9001)
  }
}
