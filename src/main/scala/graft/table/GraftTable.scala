package graft.table

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Partitioned-parquet table with a versioned manifest log — the engine's
  * replacement for the reference's Delta Lake layer (SURVEY.md §7.3; the
  * environment ships no delta jar).
  *
  * Layout:
  * {{{
  *   <path>/<part>=.../part-*.parquet      data files (never mutated)
  *   <path>/_graft_log/v<N>.files          file list of version N (text)
  *   <path>/_graft_log/v<N>.json           commit record of version N
  * }}}
  *
  * Every operation writes NEW data files and commits a NEW manifest that
  * references exactly the live set; old files become orphans that
  * `vacuum` reclaims after a retention window. Readers resolve the
  * current manifest and scan only its files — this is what makes
  * OPTIMIZE (M1), VACUUM (M2), history (M3) and DESCRIBE DETAIL (D5)
  * expressible over plain parquet. The `.json` rename is the commit
  * point (single-writer; concurrent-writer ACID and time-travel reads
  * are explicitly out of scope, as in SURVEY.md §7.3 — the reference is
  * a single-writer overwrite pipeline, stock_harvester.py:117-152).
  *
  * Scale notes: data files are hive-partitioned so partition pruning is
  * free; the manifest is one small text file per version (at 100 TB you
  * would shard it and checkpoint like Delta's log — the single-file
  * manifest is the only component here that assumes "directory listing
  * fits on the driver", and it isolates that assumption in one place).
  */
final class GraftTable private (
    val spark: SparkSession,
    val path: String,
    val partitionColumns: Seq[String]) {

  private val root = new Path(path)
  private val logDir = new Path(root, "_graft_log")
  private def fs: FileSystem = root.getFileSystem(spark.sessionState.newHadoopConf())

  // ---- manifest plumbing ----------------------------------------------

  private def versionOf(p: Path): Option[Long] = {
    val n = p.getName
    if (n.startsWith("v") && n.endsWith(".json"))
      scala.util.Try(n.stripPrefix("v").stripSuffix(".json").toLong).toOption
    else None
  }

  def currentVersion: Long =
    if (!fs.exists(logDir)) -1L
    else fs.listStatus(logDir).flatMap(s => versionOf(s.getPath)).foldLeft(-1L)(Math.max)

  /** Live data files (relative paths) of a version's manifest. */
  def manifestFiles(version: Long = currentVersion): Seq[String] = {
    if (version < 0) return Nil
    val f = new Path(logDir, f"v$version%020d.files")
    val in = fs.open(f)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().filter(_.nonEmpty).toList
    finally in.close()
  }

  private def jsonEscape(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  private def commit(operation: String, files: Seq[String],
      metrics: Map[String, String]): Long = {
    val v = currentVersion + 1
    fs.mkdirs(logDir)
    val filesPath = new Path(logDir, f"v$v%020d.files")
    val jsonPath = new Path(logDir, f"v$v%020d.json")
    def writeAtomic(target: Path, content: String): Unit = {
      val tmp = new Path(target.getParent, s".${target.getName}.tmp")
      val out = fs.create(tmp, true)
      try out.write(content.getBytes(StandardCharsets.UTF_8)) finally out.close()
      if (!fs.rename(tmp, target))
        throw new IllegalStateException(s"commit conflict renaming to $target")
    }
    writeAtomic(filesPath, files.mkString("\n"))
    val metricsJson = metrics.toSeq.sortBy(_._1)
      .map { case (k, vv) => s""""${jsonEscape(k)}":"${jsonEscape(vv)}"""" }
      .mkString("{", ",", "}")
    // .json rename is the commit point; a .files without .json is garbage
    writeAtomic(jsonPath,
      s"""{"version":$v,"timestamp":"${java.time.Instant.now()}","operation":"${jsonEscape(operation)}","operationMetrics":$metricsJson}""")
    v
  }

  /** All data files currently on disk (relative paths), manifest or not. */
  private def listDataFiles(): Seq[(String, Long, Long)] = {
    if (!fs.exists(root)) return Nil
    val it = fs.listFiles(root, true)
    val out = Seq.newBuilder[(String, Long, Long)]
    val rootUri = root.toUri.getPath
    while (it.hasNext) {
      val s = it.next()
      val p = s.getPath.toUri.getPath
      if (p.endsWith(".parquet") && !p.contains("_graft_log"))
        out += ((p.stripPrefix(rootUri).stripPrefix("/"), s.getLen, s.getModificationTime))
    }
    out.result()
  }

  // ---- S4/S5: write ----------------------------------------------------

  /** Write `df`, hive-partitioned. Physical files are always appended;
    * `Overwrite` is logical (the new manifest simply stops referencing
    * old files — they await vacuum).
    *
    * Schema enforcement (the Delta behavior the reference relies on,
    * README.md:25): once a version exists, appends must match its
    * column names and types exactly; pass `mergeSchema = true` to allow
    * new nullable columns (existing columns still cannot change type).
    */
  def write(df: DataFrame, mode: SaveMode = SaveMode.Overwrite,
      mergeSchema: Boolean = false): Long = {
    if (currentVersion >= 0 && mode == SaveMode.Append) {
      val existing = read().schema
      val incoming = df.schema
      val eTypes = existing.fields.map(f => f.name -> f.dataType).toMap
      val iTypes = incoming.fields.map(f => f.name -> f.dataType).toMap
      val changed = eTypes.keySet.intersect(iTypes.keySet)
        .filter(c => eTypes(c) != iTypes(c))
      if (changed.nonEmpty)
        throw new IllegalArgumentException(
          s"schema enforcement: column type changes rejected: ${changed.mkString(", ")}")
      val extra = iTypes.keySet -- eTypes.keySet
      val missing = eTypes.keySet -- iTypes.keySet
      if (!mergeSchema && (extra.nonEmpty || missing.nonEmpty))
        throw new IllegalArgumentException(
          "schema enforcement: column set mismatch " +
          s"(extra: $extra, missing: $missing); pass mergeSchema=true to evolve")
    }
    val before = listDataFiles().map(_._1).toSet
    val writer = df.write.mode(SaveMode.Append)
    (if (partitionColumns.nonEmpty) writer.partitionBy(partitionColumns: _*) else writer)
      .parquet(path)
    val added = listDataFiles().map(_._1).filterNot(before)
    val files = mode match {
      case SaveMode.Append => manifestFiles() ++ added
      case _ => added
    }
    commit(if (mode == SaveMode.Append) "APPEND" else "WRITE", files,
      Map("numFiles" -> added.size.toString, "numOutputRows" -> "-1"))
  }

  // ---- S6/S7: read -----------------------------------------------------

  /** Scan the current manifest's files. basePath keeps the hive partition
    * columns in the schema. */
  def read(): DataFrame = readVersion(currentVersion)

  /** Time travel: scan the file set of an older committed version. Files
    * of past versions remain on disk until VACUUM reclaims them, so any
    * un-vacuumed version stays readable (vacuumed versions fail at scan
    * time with missing files — same contract as Delta). */
  def readVersion(version: Long): DataFrame = {
    val files = manifestFiles(version)
    if (files.isEmpty)
      throw new IllegalStateException(
        s"graft table at $path has no committed version $version")
    spark.read
      .option("basePath", path)
      .option("mergeSchema", "true") // union schemas across evolved files
      .parquet(files.map(f => s"$path/$f"): _*)
  }

  // ---- M1: OPTIMIZE (compact + cluster) --------------------------------

  /** Compact each hive partition to one file, clustered by `clusterBy`
    * within the file — the reference's `OPTIMIZE … ZORDER BY (timestamp_ms)`
    * (maintenance.py:140-154). For a single cluster column, a plain sort
    * is exactly a 1-D Z-order (SURVEY.md §7.4); parquet row-group min/max
    * stats on the sorted column then give the same time-range file
    * skipping Delta's Z-order targets. Multi-column clustering composes
    * with [[graft.functions.ZOrder]]'s interleaved key.
    *
    * One shuffle: hash-repartition on the partition columns puts each
    * hive partition wholly into one task → exactly one output file each.
    */
  def optimize(clusterBy: Seq[String]): Long = {
    val df = read()
    val removed = manifestFiles()
    val before = listDataFiles().map(_._1).toSet
    // single cluster column: plain sort ≡ 1-D Z-order; multi-column:
    // Morton key from graft.functions.ZOrder (one extra min/max job)
    val clusterKey: Seq[org.apache.spark.sql.Column] =
      if (clusterBy.size <= 1) clusterBy.map(col)
      else Seq(graft.functions.ZOrder.zorderKey(df, clusterBy))
    val sortCols = partitionColumns.map(col) ++ clusterKey
    val compacted =
      if (partitionColumns.nonEmpty)
        df.repartition(partitionColumns.map(col): _*).sortWithinPartitions(sortCols: _*)
      else df.coalesce(1).sortWithinPartitions(sortCols: _*)
    val writer = compacted.write.mode(SaveMode.Append)
    (if (partitionColumns.nonEmpty) writer.partitionBy(partitionColumns: _*) else writer)
      .parquet(path)
    val added = listDataFiles().map(_._1).filterNot(before)
    commit("OPTIMIZE", added, Map(
      "numFilesAdded" -> added.size.toString,
      "numFilesRemoved" -> removed.size.toString,
      "zOrderBy" -> clusterBy.mkString(",")))
  }

  // ---- M2: VACUUM ------------------------------------------------------

  /** Delete orphaned data files older than the retention window —
    * maintenance.py:159-173, including the production-retention guard
    * (168 h default; shorter windows need `retentionCheckEnabled=false`,
    * mirroring spark.databricks.delta.retentionDurationCheck). Never
    * touches files referenced by the current manifest. */
  def vacuum(retainHours: Double = 168.0,
      retentionCheckEnabled: Boolean = true,
      nowMs: Long = System.currentTimeMillis()): (Long, Int) = {
    if (retainHours < 168.0 && retentionCheckEnabled)
      throw new IllegalArgumentException(
        s"retention of $retainHours h is below the 168 h safety floor; " +
        "pass retentionCheckEnabled=false to override (demo mode)")
    val live = manifestFiles().toSet
    val cutoff = nowMs - (retainHours * 3600 * 1000).toLong
    val deletable = listDataFiles()
      .filter { case (f, _, mtime) => !live.contains(f) && mtime <= cutoff }
    deletable.foreach { case (f, _, _) => fs.delete(new Path(root, f), false) }
    val v = commit("VACUUM", manifestFiles(), Map(
      "numFilesDeleted" -> deletable.size.toString,
      "retainHours" -> retainHours.toString))
    (v, deletable.size)
  }

  // ---- M3: history -----------------------------------------------------

  /** Audit log as a DataFrame, newest first (maintenance.py:87-91). */
  def history(): DataFrame =
    spark.read.json(s"$path/_graft_log/*.json")
      .orderBy(desc("version"))

  // ---- D5: DESCRIBE DETAIL equivalent ----------------------------------

  final case class Detail(
      format: String, location: String, numFiles: Long,
      sizeInBytes: Long, partitionColumns: Seq[String], version: Long)

  def detail(): Detail = {
    val live = manifestFiles().toSet
    val sizes = listDataFiles().filter { case (f, _, _) => live.contains(f) }
    Detail("graft+parquet", path, sizes.size.toLong, sizes.map(_._2).sum,
      partitionColumns, currentVersion)
  }

  // ---- M4: health check ------------------------------------------------

  /** File/row snapshot used by the before/after maintenance report
    * (StockTableHealthCheck, maintenance.py:28-106). */
  final case class Health(
      numFiles: Long, totalBytes: Long, avgFileBytes: Long, rowCount: Long)

  def health(): Health = {
    val d = detail()
    Health(d.numFiles, d.sizeInBytes,
      if (d.numFiles == 0) 0 else d.sizeInBytes / d.numFiles, read().count())
  }
}

object GraftTable {
  def apply(spark: SparkSession, path: String,
      partitionColumns: Seq[String] = Nil): GraftTable =
    new GraftTable(spark, path, partitionColumns)
}
