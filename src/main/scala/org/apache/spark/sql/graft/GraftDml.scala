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
  * DELETE and WHEN NOT MATCHED [AND cond] INSERT star, with an
  * equi-join merge
  * condition on same-named columns; WHEN NOT MATCHED BY SOURCE,
  * explicit INSERT column lists and schema evolution are rejected with
  * clear errors. DELETE stays on the SupportsDelete path (S12).
  */
class GraftDmlRule(session: SparkSession) extends Rule[LogicalPlan] {

  private def graftTable(plan: LogicalPlan): Option[GraftV2Table] =
    plan.collectFirst {
      case r: DataSourceV2Relation if r.table.isInstanceOf[GraftV2Table] =>
        r.table.asInstanceOf[GraftV2Table]
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
      require(notMatchedBySource.isEmpty,
        "graft MERGE does not support WHEN NOT MATCHED BY SOURCE clauses")
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
      // every target column from the same-named source column — accept
      // exactly that shape (a genuine explicit column list leaves
      // unmentioned columns as null literals and is rejected)
      def isStarLike(assigns: Seq[Assignment]): Boolean =
        assigns.size == target.output.size && assigns.forall {
          case Assignment(k: AttributeReference, v: AttributeReference) =>
            k.name == v.name
          case Assignment(k: AttributeReference,
              org.apache.spark.sql.catalyst.expressions.Cast(v: AttributeReference, _, _, _)) =>
            k.name == v.name
          case _ => false
        }
      val notMatchedSpecs = notMatched.map {
        case InsertStarAction(c) => c.map(unresolve(_, tgtSet, srcSet))
        case InsertAction(c, assigns) if isStarLike(assigns) =>
          c.map(unresolve(_, tgtSet, srcSet))
        case _: InsertAction => throw new UnsupportedOperationException(
          "graft MERGE supports WHEN NOT MATCHED THEN INSERT * only " +
          "(explicit insert column lists are not supported)")
        case other => throw new UnsupportedOperationException(
          s"graft MERGE does not support not-matched action $other")
      }
      GraftMergeCommand(t.path, source, keys(cond), matchedSpecs, notMatchedSpecs)

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
  /** `set=None` ⇒ UPDATE ALL; `delete` ⇒ DELETE. */
  final case class MatchedSpec(cond: Option[Column],
      set: Option[Map[String, Column]], delete: Boolean)
}

case class GraftMergeCommand(path: String, source: LogicalPlan,
    on: Seq[String], matched: Seq[GraftMergeCommand.MatchedSpec],
    notMatched: Seq[Option[Column]]) extends LeafRunnableCommand {
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
      case Some(c) => b.whenNotMatchedInsertAll(c)
      case None => b.whenNotMatchedInsertAll()
    }
    b.execute()
    Nil
  }
}
