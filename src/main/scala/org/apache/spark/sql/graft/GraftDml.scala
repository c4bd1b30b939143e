package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, AttributeSet, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.sources.GraftV2Table
import graft.table.GraftTable

/** SQL `UPDATE` / `MERGE INTO` for graft tables — the Delta pattern: an
  * analyzer rule rewrites the resolved `UpdateTable` / `MergeIntoTable`
  * plans over a graft DSv2 relation into runnable commands that execute
  * through [[GraftTable.update]] / [[GraftTable.mergeInto]], so SQL DML
  * gets the same copy-on-write file pruning, constraint validation,
  * generated-column handling and commit-conflict semantics as the API.
  * (Stock Spark rejects these statements for DSv2 tables without
  * SupportsRowLevelOperations; Delta ships the same kind of rule.)
  *
  * Enabled per session via `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`.
  * Supported MERGE surface = the [[graft.table.MergeBuilder]] clause
  * set: WHEN MATCHED [AND cond] UPDATE SET … / UPDATE SET star /
  * DELETE, WHEN NOT MATCHED [AND cond] INSERT star / explicit column
  * lists (unmentioned columns NULL, unmentioned generated columns
  * recomputed), and WHEN NOT MATCHED BY SOURCE [AND cond] UPDATE SET …
  * / DELETE — with an equi-join merge condition on same-named columns;
  * WITH SCHEMA EVOLUTION is rejected with a clear error. DELETE stays
  * on the SupportsDelete path (S12).
  */
class GraftDmlRule(session: SparkSession) extends Rule[LogicalPlan] {

  private def graftTable(plan: LogicalPlan): Option[GraftV2Table] =
    plan.collectFirst {
      case r: DataSourceV2Relation if r.table.isInstanceOf[GraftV2Table] =>
        r.table.asInstanceOf[GraftV2Table]
    }

  /** NULL literal (possibly analyzer-cast) — the fill the assignment
    * aligner uses for insert-list columns the statement didn't mention. */
  private def isNullLiteral(e: Expression): Boolean = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(null, _) => true
    case org.apache.spark.sql.catalyst.expressions.Cast(c, _, _, _) => isNullLiteral(c)
    case _ => false
  }

  /** Resolved expression → name-based Column (re-resolvable against the
    * API's own frames); attributes route to `target.`/`source.` by
    * which side of the merge owns them. */
  private def unresolve(e: Expression,
      tgt: AttributeSet = AttributeSet.empty,
      src: AttributeSet = AttributeSet.empty): Column =
    ColumnBridge.column(e.transform {
      case a: AttributeReference if src.contains(a) =>
        UnresolvedAttribute(Seq("source", a.name))
      case a: AttributeReference if tgt.contains(a) =>
        UnresolvedAttribute(Seq("target", a.name))
      case a: AttributeReference => UnresolvedAttribute(Seq(a.name))
    })

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case u @ UpdateTable(target, assignments, condition)
        if u.resolved && graftTable(target).isDefined =>
      val t = graftTable(target).get
      require(t.versionAsOf.isEmpty,
        s"cannot UPDATE a time-travel relation (${t.name()})")
      val set = assignments.map {
        case Assignment(key: AttributeReference, value) =>
          key.name -> unresolve(value)
        case Assignment(key, _) => throw new UnsupportedOperationException(
          s"graft UPDATE supports top-level column assignments only, got $key")
      }.toMap
      GraftUpdateCommand(t.path,
        condition.map(unresolve(_)).getOrElse(ColumnBridge.column(
          org.apache.spark.sql.catalyst.expressions.Literal.TrueLiteral)), set)

    case m @ MergeIntoTable(target, source, cond, matched, notMatched,
        notMatchedBySource, withSchemaEvolution)
        if m.resolved && graftTable(target).isDefined =>
      val t = graftTable(target).get
      require(t.versionAsOf.isEmpty,
        s"cannot MERGE into a time-travel relation (${t.name()})")
      require(!withSchemaEvolution,
        "graft MERGE does not support WITH SCHEMA EVOLUTION")
      val tgtSet = AttributeSet(target.output)
      val srcSet = AttributeSet(source.output)
      // merge condition must decompose into same-named equi-join keys —
      // the MergeBuilder contract (arbitrary conditions would need a
      // different join shape and are rejected explicitly)
      def keys(e: Expression): Seq[String] = e match {
        case org.apache.spark.sql.catalyst.expressions.And(l, r) => keys(l) ++ keys(r)
        case EqualTo(a: AttributeReference, b: AttributeReference) =>
          val (ta, sb) =
            if (tgtSet.contains(a) && srcSet.contains(b)) (a, b)
            else if (tgtSet.contains(b) && srcSet.contains(a)) (b, a)
            else throw new UnsupportedOperationException(
              s"graft MERGE condition must compare target to source columns, got $e")
          if (ta.name != sb.name) throw new UnsupportedOperationException(
            "graft MERGE requires same-named equi-join keys, got " +
            s"${ta.name} = ${sb.name}")
          Seq(ta.name)
        case other => throw new UnsupportedOperationException(
          s"graft MERGE condition must be a conjunction of equi-joins, got $other")
      }
      val matchedSpecs = matched.map {
        case UpdateStarAction(c) =>
          GraftMergeCommand.MatchedSpec(c.map(unresolve(_, tgtSet, srcSet)), None, delete = false)
        case UpdateAction(c, assigns, _) =>
          val set = assigns.map {
            case Assignment(key: AttributeReference, value) =>
              key.name -> unresolve(value, tgtSet, srcSet)
            case Assignment(key, _) => throw new UnsupportedOperationException(
              s"graft MERGE supports top-level column assignments only, got $key")
          }.toMap
          GraftMergeCommand.MatchedSpec(c.map(unresolve(_, tgtSet, srcSet)), Some(set), delete = false)
        case DeleteAction(c) =>
          GraftMergeCommand.MatchedSpec(c.map(unresolve(_, tgtSet, srcSet)), None, delete = true)
        case other => throw new UnsupportedOperationException(
          s"graft MERGE does not support matched action $other")
      }
      // the analyzer rewrites INSERT * into an InsertAction assigning
      // every target column from the same-named source column — detect
      // that shape as INSERT ALL; a genuine explicit column list arrives
      // analyzer-aligned to the full target width with NULL literals for
      // unmentioned columns and maps to an explicit assignment set
      def isStarLike(assigns: Seq[Assignment]): Boolean =
        assigns.size == target.output.size && assigns.forall {
          case Assignment(k: AttributeReference, v: AttributeReference) =>
            k.name == v.name
          case Assignment(k: AttributeReference,
              org.apache.spark.sql.catalyst.expressions.Cast(v: AttributeReference, _, _, _)) =>
            k.name == v.name
          case _ => false
        }
      def assignSet(assigns: Seq[Assignment]): Map[String, Column] =
        assigns.map {
          case Assignment(key: AttributeReference, value) =>
            key.name -> unresolve(value, tgtSet, srcSet)
          case Assignment(key, _) => throw new UnsupportedOperationException(
            s"graft MERGE supports top-level column assignments only, got $key")
        }.toMap
      val notMatchedSpecs = notMatched.map {
        case InsertStarAction(c) =>
          GraftMergeCommand.InsertSpec(c.map(unresolve(_, tgtSet, srcSet)), None)
        case InsertAction(c, assigns) if isStarLike(assigns) =>
          GraftMergeCommand.InsertSpec(c.map(unresolve(_, tgtSet, srcSet)), None)
        case InsertAction(c, assigns) =>
          GraftMergeCommand.InsertSpec(c.map(unresolve(_, tgtSet, srcSet)),
            Some(assigns.map {
              case Assignment(key: AttributeReference, value) =>
                // keep the analyzer's null fills out of the explicit set:
                // unmentioned columns are NULL by the builder contract
                // anyway, and stripping them lets unmentioned GENERATED
                // columns recompute instead of failing validation
                key.name -> value
              case Assignment(key, _) => throw new UnsupportedOperationException(
                s"graft MERGE supports top-level column assignments only, got $key")
            }.collect { case (k, v) if !isNullLiteral(v) =>
              k -> unresolve(v, tgtSet, srcSet) }.toMap))
        case other => throw new UnsupportedOperationException(
          s"graft MERGE does not support not-matched action $other")
      }
      // WHEN NOT MATCHED BY SOURCE: conditions/assignments reference the
      // target side only (Spark's analyzer already enforces that)
      val nmbsSpecs = notMatchedBySource.map {
        case DeleteAction(c) =>
          GraftMergeCommand.MatchedSpec(c.map(unresolve(_, tgtSet, srcSet)), None, delete = true)
        case UpdateAction(c, assigns, _) =>
          GraftMergeCommand.MatchedSpec(c.map(unresolve(_, tgtSet, srcSet)),
            Some(assignSet(assigns)), delete = false)
        case other => throw new UnsupportedOperationException(
          s"graft MERGE does not support not-matched-by-source action $other")
      }
      GraftMergeCommand(t.path, source, keys(cond), matchedSpecs,
        notMatchedSpecs, nmbsSpecs)

    case _ => plan
  }
}

private[graft] object GraftDml {
  /** Table handle with the hive layout recovered from the manifest, so
    * rewrites land in the right partition directories. */
  def tableAt(session: SparkSession, path: String): GraftTable = {
    val probe = GraftTable(session, path)
    GraftTable(session, path, probe.layoutPartitionColumns())
  }
}

case class GraftUpdateCommand(path: String, cond: Column,
    set: Map[String, Column]) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    GraftDml.tableAt(session, path).update(cond, set)
    Nil
  }
}

object GraftMergeCommand {
  /** `set=None` ⇒ UPDATE ALL; `delete` ⇒ DELETE. Doubles as the
    * NOT MATCHED BY SOURCE spec (same clause algebra, target-only refs). */
  final case class MatchedSpec(cond: Option[Column],
      set: Option[Map[String, Column]], delete: Boolean)
  /** `set=None` ⇒ INSERT ALL; explicit set ⇒ listed columns only. */
  final case class InsertSpec(cond: Option[Column],
      set: Option[Map[String, Column]])
}

case class GraftMergeCommand(path: String, source: LogicalPlan,
    on: Seq[String], matched: Seq[GraftMergeCommand.MatchedSpec],
    notMatched: Seq[GraftMergeCommand.InsertSpec],
    notMatchedBySource: Seq[GraftMergeCommand.MatchedSpec] = Nil)
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(source)

  override def run(session: SparkSession): Seq[Row] = {
    val classic = session.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val sourceDf = org.apache.spark.sql.classic.Dataset.ofRows(classic, source)
    val b = GraftDml.tableAt(session, path).mergeInto(sourceDf, on)
    matched.foreach {
      case GraftMergeCommand.MatchedSpec(Some(c), None, true) => b.whenMatchedDelete(c)
      case GraftMergeCommand.MatchedSpec(None, None, true) => b.whenMatchedDelete()
      case GraftMergeCommand.MatchedSpec(Some(c), Some(s), _) => b.whenMatchedUpdate(c, s)
      case GraftMergeCommand.MatchedSpec(None, Some(s), _) => b.whenMatchedUpdate(s)
      case GraftMergeCommand.MatchedSpec(Some(c), None, _) => b.whenMatchedUpdateAll(c)
      case GraftMergeCommand.MatchedSpec(None, None, _) => b.whenMatchedUpdateAll()
    }
    notMatched.foreach {
      case GraftMergeCommand.InsertSpec(Some(c), Some(s)) => b.whenNotMatchedInsert(c, s)
      case GraftMergeCommand.InsertSpec(None, Some(s)) => b.whenNotMatchedInsert(s)
      case GraftMergeCommand.InsertSpec(Some(c), None) => b.whenNotMatchedInsertAll(c)
      case GraftMergeCommand.InsertSpec(None, None) => b.whenNotMatchedInsertAll()
    }
    notMatchedBySource.foreach {
      case GraftMergeCommand.MatchedSpec(Some(c), None, true) => b.whenNotMatchedBySourceDelete(c)
      case GraftMergeCommand.MatchedSpec(None, None, true) => b.whenNotMatchedBySourceDelete()
      case GraftMergeCommand.MatchedSpec(Some(c), Some(s), _) => b.whenNotMatchedBySourceUpdate(c, s)
      case GraftMergeCommand.MatchedSpec(None, Some(s), _) => b.whenNotMatchedBySourceUpdate(s)
      case other => throw new UnsupportedOperationException(
        s"unsupported NOT MATCHED BY SOURCE spec $other")
    }
    b.execute()
    Nil
  }
}
