package graft.sql

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable, LogicalPlan, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand

import graft.tables.LakeTable

/** `DELETE FROM` / `UPDATE` for lake tables — with `INSERT` and
  * `MERGE INTO` this completes the DML square over the SQL catalog.
  * Both execute the storage layer's copy-on-write row-level operations:
  * the predicate's manifest-bounds check rewrites only files that can
  * contain matching rows and carries the rest into the new snapshot
  * verbatim (Iceberg copy-on-write semantics). Predicates must be
  * self-contained (no subqueries) — the bounds check needs a per-file
  * decidable expression; anything else gets a clear error. */
final class LakeDmlRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case d: DeleteFromTable if LakeDml.lakeTarget(d.table).isDefined &&
        d.condition.resolved =>
      LakeDml.rejectSubqueries(d.condition, "DELETE")
      LakeDeleteCommand(LakeDml.lakeTarget(d.table).get.location,
        LakeDml.columnByName(d.condition))

    case u: UpdateTable if LakeDml.lakeTarget(u.table).isDefined &&
        u.assignments.forall(_.resolved) && u.condition.forall(_.resolved) =>
      u.condition.foreach(LakeDml.rejectSubqueries(_, "UPDATE"))
      u.assignments.foreach(a => LakeDml.rejectSubqueries(a.value, "UPDATE"))
      val set = u.assignments.map { a =>
        val k = a.key match {
          case ar: AttributeReference => ar.name
          case other => throw new UnsupportedOperationException(
            s"UPDATE of a non-column target is not supported: ${other.sql}")
        }
        k -> LakeDml.columnByName(a.value)
      }.toMap
      val cond = u.condition.getOrElse(
        org.apache.spark.sql.catalyst.expressions.Literal.TrueLiteral)
      LakeUpdateCommand(LakeDml.lakeTarget(u.table).get.location,
        set, LakeDml.columnByName(cond))
  }
}

private[sql] object LakeDml {
  def lakeTarget(p: LogicalPlan): Option[LakeSqlTable] = p match {
    case a: org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias =>
      lakeTarget(a.child)
    case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
      r.table match {
        case t: LakeSqlTable => Some(t)
        case _ => None
      }
    case _ => None
  }

  /** Re-anchor a resolved expression on column NAMES (so it resolves
    * against the fresh table read inside the storage-layer operation — the
    * original exprIds belong to the statement's relation) and wrap it as a
    * Column: commands must carry Columns, not Expressions, because
    * CheckAnalysis walks a command's Expression args and would reject the
    * deliberately-unresolved attributes. */
  def columnByName(e: Expression): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftShims.columnOf(e.transform {
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
    })

  def rejectSubqueries(e: Expression, stmt: String): Unit =
    if (e.exists(_.isInstanceOf[SubqueryExpression]))
      throw new UnsupportedOperationException(
        s"$stmt on a lake table does not support subqueries in predicates " +
          "or assignments; materialize the subquery first")
}

final case class LakeDeleteCommand(
    location: String,
    @transient cond: org.apache.spark.sql.Column) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    LakeTable.load(session, location).delete(cond)
    Nil
  }
  override def simpleString(maxFields: Int): String =
    s"LakeDeleteCommand $location"
}

final case class LakeUpdateCommand(
    location: String,
    @transient set: Map[String, org.apache.spark.sql.Column],
    @transient cond: org.apache.spark.sql.Column) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    LakeTable.load(session, location).update(set, cond)
    Nil
  }
  override def simpleString(maxFields: Int): String =
    s"LakeUpdateCommand $location set=[${set.keys.mkString(", ")}]"
}
