package org.apache.spark.sql.graft

import java.util.Locale

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.{ParserInterface, ParseException}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types._

import graft.table.GraftTable

/** SQL surface for the table-maintenance commands stock Spark has no
  * grammar for — the Delta pattern (DeltaSqlParser): a delegating
  * ParserInterface that recognizes
  *
  *   OPTIMIZE <tbl> [FULL] [WHERE <pred>] [ZORDER BY (c, …)] [MAX WAVES n]
  *   VACUUM <tbl> [LITE] [RETAIN <n> HOURS] [DRY RUN]
  *   RESTORE [TABLE] <tbl> [TO] VERSION AS OF <n>
  *   DESCRIBE HISTORY <tbl>
  *   REORG TABLE <tbl> APPLY (PURGE)
  *   ANALYZE TABLE <tbl> COMPUTE STATISTICS FOR ALL COLUMNS | COLUMNS c, …
  *
  * and hands everything else to the session parser unchanged. `<tbl>`
  * is `graft.`+backticked path (the graft catalog form), a bare
  * backticked path, or a session-catalog table name whose metadata
  * carries a location. Injected via [[GraftExtensions]].
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  import GraftSqlParser._

  override def parsePlan(sqlText: String): LogicalPlan =
    parseMaintenance(sqlText).getOrElse(delegate.parsePlan(sqlText))

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

object GraftSqlParser {

  // table reference: optional `graft` catalog prefix + backticked path,
  // a bare backticked path, or a dotted identifier
  private val Tbl = """((?:\w+\s*\.\s*)?`[^`]+`|[\w.]+)"""

  private val OptimizeRe =
    s"""(?is)^\\s*OPTIMIZE\\s+$Tbl(\\s+FULL)?(?:\\s+WHERE\\s+(.+?))?(?:\\s+ZORDER\\s+BY\\s*\\(([^)]+)\\))?(?:\\s+MAX\\s+WAVES\\s+(\\d+))?\\s*;?\\s*$$""".r
  private val VacuumRe =
    s"""(?is)^\\s*VACUUM\\s+$Tbl(\\s+LITE)?(?:\\s+RETAIN\\s+([0-9.]+)\\s+HOURS?)?(\\s+DRY\\s+RUN)?\\s*;?\\s*$$""".r
  private val RestoreRe =
    s"""(?is)^\\s*RESTORE\\s+(?:TABLE\\s+)?$Tbl\\s+(?:TO\\s+)?VERSION\\s+AS\\s+OF\\s+(\\d+)\\s*;?\\s*$$""".r
  private val RestoreTsRe =
    s"""(?is)^\\s*RESTORE\\s+(?:TABLE\\s+)?$Tbl\\s+(?:TO\\s+)?TIMESTAMP\\s+AS\\s+OF\\s+'([^']+)'\\s*;?\\s*$$""".r
  private val HistoryRe =
    s"""(?is)^\\s*DESC(?:RIBE)?\\s+HISTORY\\s+$Tbl\\s*;?\\s*$$""".r
  private val DetailRe =
    s"""(?is)^\\s*DESC(?:RIBE)?\\s+DETAIL\\s+$Tbl\\s*;?\\s*$$""".r
  private val CopyIntoRe =
    s"""(?is)^\\s*COPY\\s+INTO\\s+$Tbl\\s+FROM\\s+'([^']+)'\\s+FILEFORMAT\\s*=\\s*(\\w+)(?:\\s+FORMAT_OPTIONS\\s*\\(([^)]*)\\))?(?:\\s+COPY_OPTIONS\\s*\\(([^)]*)\\))?\\s*;?\\s*$$""".r
  private val ShowPartsRe =
    s"""(?is)^\\s*SHOW\\s+PARTITIONS\\s+$Tbl\\s*;?\\s*$$""".r
  private val ReorgRe =
    s"""(?is)^\\s*REORG\\s+TABLE\\s+$Tbl\\s+APPLY\\s*\\(\\s*PURGE\\s*\\)\\s*;?\\s*$$""".r
  private val IdentityRe =
    s"""(?is)^\\s*ALTER\\s+TABLE\\s+$Tbl\\s+ADD\\s+COLUMN\\s+(\\w+)\\s+BIGINT\\s+GENERATED\\s+ALWAYS\\s+AS\\s+IDENTITY(?:\\s*\\(\\s*START\\s+WITH\\s+(-?\\d+)\\s+INCREMENT\\s+BY\\s+(-?\\d+)\\s*\\))?\\s*;?\\s*$$""".r
  private val AddConstraintRe =
    s"""(?is)^\\s*ALTER\\s+TABLE\\s+$Tbl\\s+ADD\\s+CONSTRAINT\\s+(\\w+)\\s+CHECK\\s*\\((.+)\\)\\s*;?\\s*$$""".r
  private val DropConstraintRe =
    s"""(?is)^\\s*ALTER\\s+TABLE\\s+$Tbl\\s+DROP\\s+CONSTRAINT\\s+(\\w+)\\s*;?\\s*$$""".r
  private val SetDefaultRe =
    s"""(?is)^\\s*ALTER\\s+TABLE\\s+$Tbl\\s+ALTER\\s+COLUMN\\s+(\\w+)\\s+SET\\s+DEFAULT\\s+(.+?)\\s*;?\\s*$$""".r
  private val DropDefaultRe =
    s"""(?is)^\\s*ALTER\\s+TABLE\\s+$Tbl\\s+ALTER\\s+COLUMN\\s+(\\w+)\\s+DROP\\s+DEFAULT\\s*;?\\s*$$""".r
  private val ClusterByRe =
    s"""(?is)^\\s*ALTER\\s+TABLE\\s+$Tbl\\s+CLUSTER\\s+BY\\s*\\(([^)]+)\\)\\s*;?\\s*$$""".r
  private val ClusterByNoneRe =
    s"""(?is)^\\s*ALTER\\s+TABLE\\s+$Tbl\\s+CLUSTER\\s+BY\\s+NONE\\s*;?\\s*$$""".r
  private val CloneRe =
    s"""(?is)^\\s*CREATE\\s+TABLE\\s+$Tbl\\s+(SHALLOW|DEEP)\\s+CLONE\\s+$Tbl(?:\\s+VERSION\\s+AS\\s+OF\\s+(\\d+))?\\s*;?\\s*$$""".r
  private val GenerateRe =
    s"""(?is)^\\s*GENERATE\\s+(\\w+)\\s+FOR\\s+TABLE\\s+$Tbl\\s*;?\\s*$$""".r
  private val CreateMvRe =
    s"""(?is)^\\s*CREATE\\s+MATERIALIZED\\s+VIEW\\s+$Tbl\\s+AS\\s+SELECT\\s+(.+?)\\s+FROM\\s+$Tbl\\s+GROUP\\s+BY\\s+([\\w\\s,`]+?)\\s*;?\\s*$$""".r
  private val RefreshMvRe =
    s"""(?is)^\\s*REFRESH\\s+MATERIALIZED\\s+VIEW\\s+$Tbl\\s*;?\\s*$$""".r
  private val ConvertRe =
    s"""(?is)^\\s*CONVERT\\s+TO\\s+GRAFT\\s+$Tbl(?:\\s+PARTITIONED\\s+BY\\s*\\(([^)]+)\\))?\\s*;?\\s*$$""".r
  private val AnalyzeRe =
    s"""(?is)^\\s*ANALYZE\\s+TABLE\\s+$Tbl\\s+COMPUTE\\s+STATISTICS\\s+FOR\\s+(?:(ALL\\s+COLUMNS)|COLUMNS\\s+([\\w\\s,]+?))\\s*;?\\s*$$""".r

  private def parseMaintenance(sql: String): Option[LogicalPlan] = sql match {
    case OptimizeRe(tbl, full, where, zorder, maxWaves) =>
      val cols = Option(zorder).toSeq.flatMap(_.split(',').toSeq)
        .map(_.trim.stripPrefix("`").stripSuffix("`")).filter(_.nonEmpty)
      Some(GraftOptimizeCommand(tbl, Option(where).map(_.trim), cols,
        full = full != null, maxWaves = Option(maxWaves).map(_.toInt)))
    case VacuumRe(tbl, lite, hours, dry) =>
      Some(GraftVacuumCommand(tbl,
        Option(hours).map(_.toDouble), dry != null, lite = lite != null))
    case RestoreRe(tbl, v) => Some(GraftRestoreCommand(tbl, v.toLong))
    case RestoreTsRe(tbl, ts) => Some(GraftRestoreTimestampCommand(tbl, ts))
    case HistoryRe(tbl) => Some(GraftHistoryCommand(tbl))
    case DetailRe(tbl) => Some(GraftDetailCommand(tbl))
    // only explicit graft refs (graft.`path` / bare `path`): a plain
    // session-table name keeps stock Spark's own SHOW PARTITIONS
    case ShowPartsRe(tbl) if tbl.contains('`') =>
      Some(GraftShowPartitionsCommand(tbl))
    case CopyIntoRe(tbl, src, fmt, fopts, copts) =>
      Some(GraftCopyIntoCommand(tbl, src, fmt.toLowerCase,
        GraftSqlParser.parseOptionList(fopts),
        GraftSqlParser.parseOptionList(copts)))
    case ReorgRe(tbl) => Some(GraftReorgCommand(tbl))
    case IdentityRe(tbl, name, start, step) =>
      Some(GraftAddIdentityCommand(tbl, name,
        Option(start).map(_.toLong).getOrElse(1L),
        Option(step).map(_.toLong).getOrElse(1L)))
    case AddConstraintRe(tbl, name, expr) =>
      Some(GraftAddConstraintCommand(tbl, name, expr.trim))
    case DropConstraintRe(tbl, name) =>
      Some(GraftDropConstraintCommand(tbl, name))
    case SetDefaultRe(tbl, name, expr) =>
      Some(GraftSetDefaultCommand(tbl, name, expr.trim))
    case DropDefaultRe(tbl, name) =>
      Some(GraftDropDefaultCommand(tbl, name))
    case AnalyzeRe(tbl, all, cols) =>
      Some(GraftAnalyzeCommand(tbl,
        if (all != null) Nil
        else cols.split(",").map(_.trim).filter(_.nonEmpty).toSeq))
    case ClusterByNoneRe(tbl) => Some(GraftClusterByCommand(tbl, Nil))
    case ClusterByRe(tbl, cols) =>
      Some(GraftClusterByCommand(tbl, cols.split(',').toSeq
        .map(_.trim.stripPrefix("`").stripSuffix("`")).filter(_.nonEmpty)))
    case CloneRe(tgt, mode, src, v) =>
      Some(GraftCloneCommand(tgt, src, Option(v).map(_.toLong),
        deep = mode.equalsIgnoreCase("DEEP")))
    case GenerateRe(mode, tbl) =>
      Some(GraftGenerateCommand(tbl, mode.toLowerCase(Locale.ROOT)))
    case CreateMvRe(tgt, selectList, src, groupBy) =>
      val groups = groupBy.split(',').toSeq
        .map(_.trim.stripPrefix("`").stripSuffix("`")).filter(_.nonEmpty)
      // incremental MVs maintain COUNT(*) and SUM(col) ONLY — the
      // self-maintainable aggregates under both inserts and deletes (a
      // deleted row's MIN/MAX contribution cannot be subtracted without
      // rescanning its group). The whole select list is validated up
      // front: silently dropping an AVG/MIN/MAX (or an alias the view
      // schema would not honor — columns are named mv_cnt / sum_<col>)
      // would create a view whose schema differs from the SELECT.
      val SumItem = """(?i)SUM\s*\(\s*`?(\w+)`?\s*\)""".r
      val CountItem = """(?i)COUNT\s*\(\s*\*\s*\)""".r
      val BareCol = """`?(\w+)`?""".r
      val sums = Seq.newBuilder[String]
      splitTopLevel(selectList).foreach {
        case SumItem(c) => sums += c
        case CountItem() => ()
        case BareCol(c) if groups.contains(c) => ()
        case bad => throw new IllegalArgumentException(
          s"CREATE MATERIALIZED VIEW: unsupported select item '$bad' — " +
          "incremental materialized views support only the GROUP BY " +
          "columns, COUNT(*) and SUM(<col>) (unaliased; view columns " +
          "are named mv_cnt / sum_<col>). MIN/MAX/AVG and expression " +
          "aggregates are not self-maintainable under deletes: a " +
          "removed row's contribution cannot be subtracted from the " +
          "view without rescanning its group. Compute AVG downstream " +
          "as sum_<col> / mv_cnt.")
      }
      Some(GraftCreateMvCommand(tgt, src, groups, sums.result()))
    case RefreshMvRe(tbl) => Some(GraftRefreshMvCommand(tbl))
    case ConvertRe(tbl, parts) =>
      // Delta's CONVERT TO DELTA lists `col type` pairs; hive directory
      // values are untyped strings here, so only the names matter
      val cols = Option(parts).toSeq.flatMap(_.split(',').toSeq)
        .map(_.trim.stripPrefix("`"))
        .map(c => c.takeWhile(ch => ch != ' ' && ch != '`'))
        .filter(_.nonEmpty)
      Some(GraftConvertCommand(tbl, cols))
    case _ => None
  }

  /** Split a select list on top-level commas (commas inside parens —
    * e.g. a rejected `ROUND(x, 2)` — stay with their item). */
  private[graft] def splitTopLevel(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    s.foreach {
      case '(' => depth += 1; cur += '('
      case ')' => depth -= 1; cur += ')'
      case ',' if depth == 0 => out += cur.result().trim; cur.clear()
      case c => cur += c
    }
    val last = cur.result().trim
    if (last.nonEmpty) out += last
    out.result()
  }

  /** Parse a `'k' = 'v', 'k2' = 'v2'` option list (null/empty → empty). */
  private[graft] def parseOptionList(raw: String): Map[String, String] =
    Option(raw).map(_.trim).filter(_.nonEmpty).fold(Map.empty[String, String]) {
      body =>
        """'((?:[^'])*)'\s*=\s*'((?:[^'])*)'""".r
          .findAllMatchIn(body).map(m => m.group(1) -> m.group(2)).toMap
    }

  /** Resolve a parsed table reference to a GraftTable handle. Backticked
    * forms are paths (with or without the `graft.` catalog prefix);
    * bare names go through the session catalog's table metadata. */
  private[graft] def resolve(session: SparkSession, tbl: String): GraftTable = {
    val trimmed = tbl.trim
    val path =
      if (trimmed.endsWith("`")) {
        val tick = trimmed.indexOf('`')
        val prefix = trimmed.take(tick).trim
        require(prefix.isEmpty ||
          prefix.stripSuffix(".").trim.toLowerCase(Locale.ROOT) == "graft",
          s"unknown catalog '$prefix' in table reference $tbl")
        trimmed.substring(tick + 1, trimmed.length - 1)
      } else {
        val parts = trimmed.split('.')
        val ti = if (parts.length == 1) TableIdentifier(parts(0))
          else TableIdentifier(parts.last, Some(parts(parts.length - 2)))
        new java.net.URI(session.sessionState.catalog
          .getTableMetadata(ti).location.toString).getPath
      }
    val t = GraftDml.tableAt(session, path)
    // the dotted-identifier form matches ANY session-catalog name, so a
    // maintenance command on a non-graft table (hive/parquet location
    // with no committed log) must fail here — executing it would plant a
    // fresh graft log inside a foreign table's directory
    require(t.currentVersion >= 0,
      s"$tbl is not a graft table: no committed graft log at $path " +
      "(maintenance commands require an existing graft table; use " +
      "CONVERT TO GRAFT to adopt a parquet directory)")
    t
  }

  /** Extract the filesystem path of a backticked table reference whose
    * optional catalog prefix is `graft` or `parquet` — used where the
    * table need not exist in any catalog yet (CLONE's target, CONVERT's
    * source directory). */
  private[graft] def pathOf(tbl: String): String = {
    val trimmed = tbl.trim
    require(trimmed.endsWith("`"),
      s"expected a backticked path, got $tbl")
    val tick = trimmed.indexOf('`')
    val prefix = trimmed.take(tick).trim.stripSuffix(".").trim
      .toLowerCase(Locale.ROOT)
    require(prefix.isEmpty || prefix == "graft" || prefix == "parquet",
      s"unknown catalog '$prefix' in table reference $tbl")
    trimmed.substring(tick + 1, trimmed.length - 1)
  }
}

case class GraftAddIdentityCommand(table: String, name: String,
    start: Long, step: Long) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    GraftSqlParser.resolve(session, table).addIdentityColumn(name, start, step)
    Nil
  }
}

/** `ALTER TABLE t CLUSTER BY (a, b…)` / `CLUSTER BY NONE` (Delta liquid
  * syntax, lite semantics): records the clustering keys as the
  * `graft.clusterBy` property — a later `OPTIMIZE t` with no ZORDER
  * clause clusters by them, so layout policy travels with the table. */
case class GraftClusterByCommand(table: String, cols: Seq[String])
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val t = GraftSqlParser.resolve(session, table)
    if (cols.isEmpty) {
      if (t.properties.contains(GraftTable.ClusterByProp))
        t.unsetProperties(Seq(GraftTable.ClusterByProp))
    } else {
      val missing = cols.filterNot(t.read().columns.contains)
      require(missing.isEmpty,
        s"CLUSTER BY columns not in table schema: ${missing.mkString(", ")}")
      t.setProperties(Map(GraftTable.ClusterByProp -> cols.mkString(",")))
    }
    Nil
  }
}

case class GraftAddConstraintCommand(table: String, name: String,
    expr: String) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    GraftSqlParser.resolve(session, table).addConstraint(name, expr)
    Nil
  }
}

case class GraftDropConstraintCommand(table: String, name: String)
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    GraftSqlParser.resolve(session, table).dropConstraint(name)
    Nil
  }
}

/** `ALTER TABLE t ALTER COLUMN c SET DEFAULT <expr>` (ANSI/Delta). */
case class GraftSetDefaultCommand(table: String, name: String,
    expr: String) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    GraftSqlParser.resolve(session, table).setColumnDefault(name, expr)
    Nil
  }
}

/** `ALTER TABLE t ALTER COLUMN c DROP DEFAULT`. */
case class GraftDropDefaultCommand(table: String, name: String)
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    GraftSqlParser.resolve(session, table).dropColumnDefault(name)
    Nil
  }
}

case class GraftCloneCommand(target: String, source: String,
    version: Option[Long], deep: Boolean = false)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val src = GraftSqlParser.resolve(session, source)
    val tgt = GraftSqlParser.pathOf(target)
    val clone =
      if (deep) src.deepClone(tgt, version.getOrElse(-1L))
      else src.shallowClone(tgt, version.getOrElse(-1L))
    Seq(Row(clone.currentVersion))
  }
}

/** CREATE MATERIALIZED VIEW tgt AS SELECT … FROM src GROUP BY cols —
  * the supported aggregate shape is COUNT(*)/SUM(col) (the
  * self-maintainable set; see [[graft.table.MaterializedView]]); the
  * select list is scanned for SUM(col) occurrences, group keys come
  * from the GROUP BY clause. */
case class GraftCreateMvCommand(target: String, source: String,
    groupCols: Seq[String], sumCols: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val src = GraftSqlParser.resolve(session, source)
    val mv = graft.table.MaterializedView.create(session,
      GraftSqlParser.pathOf(target), src, groupCols, sumCols)
    Seq(Row(mv.currentVersion))
  }
}

/** REFRESH MATERIALIZED VIEW tbl — applies the source's change feed
  * since the last refresh; returns the applied (from, to) window. */
case class GraftRefreshMvCommand(table: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("from_version", LongType, nullable = false)(),
    AttributeReference("to_version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val (from, to) = graft.table.MaterializedView.refresh(session,
      GraftSqlParser.resolve(session, table).path)
    Seq(Row(from, to))
  }
}

case class GraftGenerateCommand(table: String, mode: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("manifests", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    require(mode == "symlink_format_manifest",
      s"GENERATE: unsupported mode '$mode' " +
      "(supported: symlink_format_manifest)")
    Seq(Row(GraftSqlParser.resolve(session, table)
      .generateSymlinkManifest().toLong))
  }
}

case class GraftConvertCommand(table: String,
    partitionColumns: Seq[String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val t = GraftTable.convert(session, GraftSqlParser.pathOf(table),
      partitionColumns)
    Seq(Row(t.currentVersion))
  }
}

/** `OPTIMIZE t [FULL] [WHERE …] [ZORDER BY (…)] [MAX WAVES n]`.
  * Without MAX WAVES: the single-commit OPTIMIZE. With it: the
  * resumable waved full re-cluster ([[GraftTable.optimizeFullWaved]] —
  * the 100 TB path), one committed version row per wave, at most n
  * waves this invocation; per-wave bytes come from the
  * `graft.optimize.maxWaveBytes` table property (absent → the API
  * default) and the campaign epoch from `graft.optimize.epoch`, so
  * re-running the same statement RESUMES the same campaign and
  * bumping the property starts a new one. */
case class GraftOptimizeCommand(table: String, where: Option[String],
    zorderBy: Seq[String], full: Boolean = false,
    maxWaves: Option[Int] = None) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val t = GraftSqlParser.resolve(session, table)
    val props = t.properties
    val target = props.get(GraftTable.TargetFileSizeProp).map(_.toLong)
      .getOrElse(GraftTable.DefaultTargetFileSizeBytes)
    maxWaves match {
      case None =>
        Seq(Row(t.optimize(zorderBy, targetFileSizeBytes = target,
          where = where, full = full)))
      case Some(n) =>
        require(n >= 1, "MAX WAVES must be at least 1")
        val waveBytes = props.get(GraftTable.MaxWaveBytesProp).map(_.toLong)
          .getOrElse(8L * target)
        val epoch = props.getOrElse(GraftTable.OptimizeEpochProp, "epoch-1")
        t.optimizeFullWaved(zorderBy, targetFileSizeBytes = target,
          maxWaveBytes = waveBytes, epoch = epoch, where = where,
          maxWaves = n).map(Row(_))
    }
  }
}

case class GraftVacuumCommand(table: String, retainHours: Option[Double],
    dryRun: Boolean, lite: Boolean = false) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("files_deleted", IntegerType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    // spark.graft.retentionDurationCheck.enabled=false lifts the 168 h
    // floor for short retention, mirroring the Databricks/Delta conf
    val checkEnabled = session.conf
      .getOption("spark.graft.retentionDurationCheck.enabled")
      .forall(_.toBoolean)
    val (v, n) = GraftSqlParser.resolve(session, table).vacuum(
      retainHours.getOrElse(168.0),
      retentionCheckEnabled = checkEnabled, dryRun = dryRun, lite = lite)
    Seq(Row(v, n))
  }
}

/** `ANALYZE TABLE t COMPUTE STATISTICS FOR [ALL] COLUMNS [c, …]` —
  * records per-file HLL distinct sketches in the stats sidecar
  * ([[graft.table.NdvStats]]); scans then report column NDV to join
  * planning. Empty cols = every analyzable column (Delta's ALL). */
case class GraftAnalyzeCommand(table: String, cols: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] =
    Seq(Row(GraftSqlParser.resolve(session, table).analyzeColumns(cols)))
}

case class GraftRestoreCommand(table: String, version: Long)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] =
    Seq(Row(GraftSqlParser.resolve(session, table).restore(version)))
}

/** RESTORE … TIMESTAMP AS OF '<ts>': the timestamp resolves to the last
  * version committed at or before it (Delta's timestamp time travel
  * rule), then restores that version. */
case class GraftRestoreTimestampCommand(table: String, timestamp: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val t = GraftSqlParser.resolve(session, table)
    val ts = java.sql.Timestamp.valueOf(
      if (timestamp.contains(" ") || timestamp.contains("T"))
        timestamp.replace("T", " ")
      else s"$timestamp 00:00:00")
    Seq(Row(t.restore(t.versionAtTime(ts.getTime))))
  }
}

/** `COPY INTO graft.\`path\` FROM '<dir-or-glob>' FILEFORMAT = PARQUET
  * [FORMAT_OPTIONS('k'='v',…)] [COPY_OPTIONS('force'='true',
  * 'mergeSchema'='true')]` — Delta's idempotent bulk loader: each
  * source file loads exactly once across re-runs. */
case class GraftCopyIntoCommand(table: String, source: String,
    format: String, formatOptions: Map[String, String],
    copyOptions: Map[String, String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("num_files_loaded", IntegerType, nullable = false)(),
    AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val unknown = copyOptions.keySet -- Set("force", "mergeSchema")
    require(unknown.isEmpty, s"unknown COPY_OPTIONS: ${unknown.mkString(", ")}")
    val (n, v) = GraftSqlParser.resolve(session, table).copyInto(
      source, format, formatOptions,
      force = copyOptions.get("force").exists(_.toBoolean),
      mergeSchema = copyOptions.get("mergeSchema").exists(_.toBoolean))
    Seq(Row(n, v))
  }
}

/** `SHOW PARTITIONS graft.\`path\`` — the manifest answers (file
  * groups, recorded row counts, logged byte sizes); no listing, no
  * scan, so the report costs the same on a 100 TB table. */
case class GraftShowPartitionsCommand(table: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("partition", StringType, nullable = false)(),
    AttributeReference("num_files", LongType, nullable = false)(),
    AttributeReference("num_rows", LongType, nullable = false)(),
    AttributeReference("size_bytes", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] =
    GraftSqlParser.resolve(session, table).partitionsReport()
      .map { case (p, nf, nr, b) => Row(p, nf, nr, b) }
}

case class GraftHistoryCommand(table: String) extends LeafRunnableCommand {
  // fixed, order-stable projection of the commit records (the full JSON
  // log may carry operation-specific metric keys; these are the columns
  // every commit has — Delta's DESCRIBE HISTORY core columns)
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = true)(),
    AttributeReference("timestamp", StringType, nullable = true)(),
    AttributeReference("operation", StringType, nullable = true)())
  override def run(session: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.col
    GraftSqlParser.resolve(session, table).history()
      .select(col("version").cast(LongType),
        col("timestamp").cast(StringType), col("operation"))
      .collect().toSeq
  }
}

case class GraftDetailCommand(table: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("format", StringType, nullable = false)(),
    AttributeReference("location", StringType, nullable = false)(),
    AttributeReference("numFiles", LongType, nullable = false)(),
    AttributeReference("sizeInBytes", LongType, nullable = false)(),
    AttributeReference("partitionColumns", ArrayType(StringType),
      nullable = false)(),
    AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val d = GraftSqlParser.resolve(session, table).detail()
    Seq(Row(d.format, d.location, d.numFiles, d.sizeInBytes,
      d.partitionColumns, d.version))
  }
}

case class GraftReorgCommand(table: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] =
    Seq(Row(GraftSqlParser.resolve(session, table).purge()))
}
