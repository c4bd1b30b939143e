package graft.table

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's maintenance flow (maintenance.py main, SURVEY.md §3.2):
  * before-health snapshot → OPTIMIZE (compact + cluster) → VACUUM →
  * after-health snapshot → comparison report with the row-count
  * preservation invariant (maintenance.py:204-207) → history audit.
  */
object Maintenance {

  final case class Report(
      rowsBefore: Long, rowsAfter: Long,
      filesBefore: Long, filesAfter: Long,
      orphansDeleted: Int, rowCountPreserved: Boolean,
      operations: Seq[String])

  /** Run the full maintenance cycle on a table. `demoRetention` mirrors
    * the reference's local branch: VACUUM RETAIN 0 HOURS with the
    * retention check disabled (maintenance.py:170-171). */
  def run(table: GraftTable, clusterBy: Seq[String],
      demoRetention: Boolean = true): Report = {
    val before = table.health()
    table.optimize(clusterBy)
    val (_, deleted) =
      if (demoRetention) table.vacuum(0.0, retentionCheckEnabled = false)
      else table.vacuum()
    val after = table.health()
    val ops = table.history().select("operation")
      .collect().map(_.getString(0)).toSeq
    Report(
      rowsBefore = before.rowCount, rowsAfter = after.rowCount,
      filesBefore = before.numFiles, filesAfter = after.numFiles,
      orphansDeleted = deleted,
      rowCountPreserved = before.rowCount == after.rowCount,
      operations = ops)
  }

  /** Report as a (metric, value) DataFrame for the query surface. */
  def reportDF(spark: SparkSession, r: Report): DataFrame = {
    import spark.implicits._
    Seq(
      ("rows_before", r.rowsBefore.toString),
      ("rows_after", r.rowsAfter.toString),
      ("files_before", r.filesBefore.toString),
      ("files_after", r.filesAfter.toString),
      ("orphans_deleted", r.orphansDeleted.toString),
      ("row_count_preserved", r.rowCountPreserved.toString),
      ("operations", r.operations.sorted.distinct.mkString(","))
    ).toDF("metric", "value").orderBy("metric")
  }
}
