package graft.table

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained aggregate materialized view over a graft
  * table, refreshed from the CHANGE DATA FEED — the classic
  * view-maintenance result (signed delta propagation for distributive
  * aggregates) applied to the table layer's CDF:
  *
  *   ΔMV = changes(lastV..curV) grouped with each row SIGNED
  *         (+1 insert/update_postimage, −1 delete/update_preimage),
  *   MV'  = MV MERGE ΔMV  (update counts/sums; delete groups hitting 0;
  *          insert unseen groups).
  *
  * Why it matters at 100 TB: a full aggregate over the source costs a
  * complete scan per refresh; this costs a scan of the CHANGED ROWS
  * only (the CDF reads commit sidecars / file diffs, never untouched
  * files) plus a MERGE that rewrites only the MV files containing
  * touched groups. A daily-append pattern refreshes in time
  * proportional to the day's data, independent of table history.
  *
  * Supported aggregates: COUNT(*) and SUM(col) — the self-maintainable
  * set under both inserts AND deletes (MIN/MAX are not: a deleted
  * extremum needs a rescan; AVG derives as sum/cnt). The view schema is
  * `groupCols…, mv_cnt, sum_<col>…`. View state (source path, group
  * keys, sum columns, last-applied source version) lives in the MV's
  * own TBLPROPERTIES; the refresh merge additionally carries a
  * (txnAppId, appliedThroughVersion) marker in the MV's idempotent-txn
  * map, so a crash between the merge commit and the property commit is
  * healed (never double-applied) — see [[TxnApp]].
  *
  * Group keys must be non-null (enforced at create): MERGE key equality
  * is null-rejecting, and a null group would re-insert per refresh.
  */
object MaterializedView {

  val SrcProp = "graft.mv.sourcePath"
  val GroupProp = "graft.mv.groupCols"
  val SumProp = "graft.mv.sumCols"
  val VersionProp = "graft.mv.lastSourceVersion"

  /** txnAppId of the refresh merges: the merge commit carries
    * (TxnApp, appliedThroughSourceVersion) in the MV's idempotent-txn
    * map, so a crash between the merge commit and the property commit
    * can never double-apply a window — refresh takes
    * max(property, lastTxnVersion) as its real starting point. */
  val TxnApp = "graft.mv.refresh"

  private def aggExprs(sumCols: Seq[String]): Seq[Column] =
    count(lit(1)).as("mv_cnt") +:
      sumCols.map(c => sum(col(c)).as(s"sum_$c"))

  /** Full initial materialization at the source's current version. */
  def create(spark: SparkSession, mvPath: String, src: GraftTable,
      groupCols: Seq[String], sumCols: Seq[String]): GraftTable = {
    require(groupCols.nonEmpty, "materialized view needs group columns")
    val v = src.currentVersion
    require(v >= 0, s"source ${src.path} has no committed version")
    val base = src.read()
    val nullKeys = base.filter(groupCols.map(col(_).isNull).reduce(_ || _)).limit(1).count()
    require(nullKeys == 0,
      s"null group key in source: MV group columns must be non-null " +
      s"(${groupCols.mkString(", ")})")
    val mv = GraftTable(spark, mvPath, Seq.empty)
    require(mv.currentVersion < 0, s"$mvPath is already a graft table")
    mv.write(base.groupBy(groupCols.map(col): _*)
      .agg(aggExprs(sumCols).head, aggExprs(sumCols).tail: _*),
      SaveMode.Overwrite)
    mv.setProperties(Map(
      SrcProp -> src.path, GroupProp -> groupCols.mkString(","),
      SumProp -> sumCols.mkString(","), VersionProp -> v.toString,
      // the MV's own consumers do signed-delta math, never need
      // update pre/post images: skip the refresh merges' CDC sidecars
      GraftTable.ChangeDataFeedProp -> "false"))
    mv
  }

  /** Apply the source's CDF since the last refresh. Returns
    * (fromVersion, toVersion) of the applied window — equal when the
    * view was already current (no commit made). */
  def refresh(spark: SparkSession, mvPath: String): (Long, Long) = {
    val mv = GraftTable(spark, mvPath, Seq.empty)
    val props = mv.properties
    val srcPath = props.getOrElse(SrcProp,
      sys.error(s"$mvPath is not a materialized view (no $SrcProp)"))
    val groupCols = props(GroupProp).split(',').toSeq.filter(_.nonEmpty)
    val sumCols = props.get(SumProp).toSeq
      .flatMap(_.split(',').toSeq).filter(_.nonEmpty)
    // real starting point: the property, OR the txn map when a crash
    // landed the merge but not the property commit
    val from = math.max(props(VersionProp).toLong, mv.lastTxnVersion(TxnApp))
    val src = {
      val probe = GraftTable(spark, srcPath, Seq.empty)
      GraftTable(spark, srcPath, probe.layoutPartitionColumns())
    }
    val to = src.currentVersion
    if (to <= from) {
      // heal a torn refresh: property may still trail the txn map
      if (props(VersionProp).toLong < from)
        mv.setProperties(Map(VersionProp -> from.toString))
      return (from, from)
    }

    val sign = when(
      col("_change_type").isin("insert", "update_postimage"), 1L)
      .when(col("_change_type").isin("delete", "update_preimage"), -1L)
    val deltaAggs = sum(col("__sign")).as("d_cnt") +:
      sumCols.map(c => sum(col("__sign") * col(c)).as(s"d_sum_$c"))
    // the delta MATERIALIZES for the duration of the refresh: it is
    // consumed three times (null-key guard, the merge's affected-file
    // discovery, the merge apply) and each uncached pass would re-read
    // the whole change-feed window; refresh is eager, so the cache is
    // released before returning
    val delta = src.changes(from, to)
      .withColumn("__sign", sign)
      .groupBy(groupCols.map(col): _*)
      .agg(deltaAggs.head, deltaAggs.tail: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    require(delta.filter(groupCols.map(col(_).isNull).reduce(_ || _))
      .limit(1).count() == 0,
      "null group key entered the source: MV group columns must stay " +
      s"non-null (${groupCols.mkString(", ")})")

    val newCnt = col("target.mv_cnt") + col("source.d_cnt")
    // sum deltas preserve NULL semantics: an all-null group's sum stays
    // NULL (matching a full recompute), never a manufactured 0
    def plus(a: Column, b: Column): Column =
      when(a.isNull, b).when(b.isNull, a).otherwise(a + b)
    val updates: Map[String, Column] =
      Map("mv_cnt" -> newCnt) ++ sumCols.map(c =>
        s"sum_$c" ->
          plus(col(s"target.sum_$c"), col(s"source.d_sum_$c"))).toMap
    val inserts: Map[String, Column] =
      groupCols.map(c => c -> col(s"source.$c")).toMap ++
        Map("mv_cnt" -> col("source.d_cnt")) ++
        sumCols.map(c => s"sum_$c" -> col(s"source.d_sum_$c")).toMap
    mv.mergeInto(delta, groupCols)
      .whenMatchedDelete(newCnt === 0) // group vanished from the source
      .whenMatchedUpdate(updates)
      // d_cnt = 0 with a sum delta can't insert a ghost group; d_cnt > 0
      // guards the (never-seen, net-zero) no-op window
      .whenNotMatchedInsert(col("source.d_cnt") > 0, inserts)
      .withMetrics(Map("txnAppId" -> TxnApp, "txnVersion" -> to.toString))
      .execute()
    mv.setProperties(Map(VersionProp -> to.toString))
    (from, to)
    } finally { delta.unpersist(); () }
  }
}
