package graft.sql

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualNullSafe, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand

import graft.tables.LakeTable

/** `MERGE INTO` support for lake tables, covering the upsert-all shape —
  * the ONLY merge semantics the storage layer (and the reference's
  * PyIceberg destination, `pyiceberg.py:141-149`: upsert or nothing)
  * defines:
  *
  * {{{
  * MERGE INTO lake.ns.t AS t USING src ON t.k = src.k
  * WHEN MATCHED THEN UPDATE SET *
  * WHEN NOT MATCHED THEN INSERT *
  * }}}
  *
  * The rule recognizes that shape on a [[LakeSqlTable]] target (keys =
  * the equi-condition columns) and rewrites the whole statement to a
  * command invoking `LakeTable.merge` — the copy-on-write, file-pruned,
  * dup-key-guarded transactional upsert. Anything else (conditional
  * actions, partial UPDATE SET, DELETE actions) is rejected with a clear
  * error instead of Spark's generic row-level-operation failure.
  */
final class LakeMergeIntoRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case m: MergeIntoTable if lakeTarget(m.targetTable).isDefined &&
        m.sourceTable.resolved =>
      val t = lakeTarget(m.targetTable).get
      val keys = equiJoinKeys(m.mergeCondition).getOrElse(unsupported(
        "the merge condition must be a conjunction of t.<col> = s.<col> " +
          s"equalities, got: ${m.mergeCondition.sql}"))
      if (m.notMatchedBySourceActions.nonEmpty)
        unsupported("WHEN NOT MATCHED BY SOURCE is not supported")
      if (!isUpdateAll(m.matchedActions, t))
        unsupported("exactly one unconditional WHEN MATCHED THEN UPDATE SET * is required")
      if (!isInsertAll(m.notMatchedActions, t))
        unsupported("exactly one unconditional WHEN NOT MATCHED THEN INSERT * is required")
      LakeMergeCommand(t.location, keys, m.sourceTable)
  }

  private def unsupported(msg: String): Nothing =
    throw new UnsupportedOperationException(
      s"MERGE INTO a lake table supports only the upsert-all shape " +
        s"(UPDATE SET * / INSERT *): $msg")

  private def lakeTarget(p: LogicalPlan): Option[LakeSqlTable] = p match {
    case a: SubqueryAlias => lakeTarget(a.child)
    case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
      r.table match {
        case t: LakeSqlTable => Some(t)
        case _ => None
      }
    case _ => None
  }

  /** Same-named column equalities out of the merge condition. */
  private def equiJoinKeys(cond: Expression): Option[Seq[String]] = cond match {
    case And(l, r) =>
      for { a <- equiJoinKeys(l); b <- equiJoinKeys(r) } yield a ++ b
    case EqualTo(a, b) => pairKey(a, b).map(Seq(_))
    case EqualNullSafe(a, b) => pairKey(a, b).map(Seq(_))
    case _ => None
  }

  private def pairKey(a: Expression, b: Expression): Option[String] =
    for { x <- colName(a); y <- colName(b); if x.equalsIgnoreCase(y) } yield x

  private def colName(e: Expression): Option[String] = e match {
    case a: AttributeReference => Some(a.name)
    case u: UnresolvedAttribute => Some(u.nameParts.last)
    case _ => None
  }

  /** UPDATE SET * — either the unexpanded star action or its expansion to
    * same-named assignments covering every table column. */
  private def isUpdateAll(actions: Seq[MergeAction], t: LakeSqlTable): Boolean =
    actions match {
      case Seq(UpdateStarAction(None)) => true
      case Seq(UpdateAction(None, assigns, _)) => coversAll(assigns, t)
      case _ => false
    }

  private def isInsertAll(actions: Seq[MergeAction], t: LakeSqlTable): Boolean =
    actions match {
      case Seq(InsertStarAction(None)) => true
      case Seq(InsertAction(None, assigns)) => coversAll(assigns, t)
      case _ => false
    }

  private def coversAll(assigns: Seq[Assignment], t: LakeSqlTable): Boolean = {
    val sameName = assigns.forall(a =>
      (colName(a.key), colName(a.value)) match {
        case (Some(k), Some(v)) => k.equalsIgnoreCase(v)
        case _ => false
      })
    val assigned = assigns.flatMap(a => colName(a.key)).map(_.toLowerCase).toSet
    sameName && t.meta.schema.fieldNames.forall(f => assigned.contains(f.toLowerCase))
  }
}

/** The executed statement: run the storage layer's transactional upsert
  * (copy-on-write on touched files, in-plan duplicate-source-key guard)
  * against the materialized source plan. */
final case class LakeMergeCommand(
    location: String,
    keys: Seq[String],
    @transient source: LogicalPlan) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val src = org.apache.spark.sql.GraftShims.ofRows(session, source)
    LakeTable.load(session, location).merge(src, keys)
    Nil
  }
  override def simpleString(maxFields: Int): String =
    s"LakeMergeCommand $location keys=[${keys.mkString(", ")}]"
}
