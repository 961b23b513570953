package graft.tables

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.col

/** Clause model for the general `MERGE INTO` shape
  * ([[LakeTable.mergeClauses]]): ordered conditional WHEN MATCHED
  * UPDATE/DELETE, WHEN NOT MATCHED INSERT, and WHEN NOT MATCHED BY
  * SOURCE UPDATE/DELETE — SQL-standard first-satisfied-clause-wins
  * semantics (Trino/Iceberg's MERGE surface, the consumption-layer
  * engine of the reference per SURVEY §2.12).
  *
  * Clause conditions and assignment values are Spark [[Column]]s over
  * the merge frame, where the target row's columns are [[MergeClauses.t]]
  * and the source row's are [[MergeClauses.s]] (the SQL rule maps
  * `t.<col>` / `s.<col>` references onto exactly these).
  */
object MergeClauses {
  /** Column-name prefixes of the merge frame — the contract integrators
    * (the SQL rule) use to remap resolved `t.<col>` / `s.<col>`
    * references; [[t]] and [[s]] are the conventional accessors. */
  val TargetPrefix = "__mt_"
  val SourcePrefix = "__ms_"

  /** The target row's column `c` in clause conditions/assignments. */
  def t(c: String): Column = col(TargetPrefix + c)

  /** The source row's column `c` in clause conditions/assignments. */
  def s(c: String): Column = col(SourcePrefix + c)

  sealed trait Clause { def condition: Option[Column] }

  /** UPDATE SET — unassigned table columns keep their target value. */
  final case class Update(condition: Option[Column],
                          set: Map[String, Column]) extends Clause

  final case class Delete(condition: Option[Column]) extends Clause

  /** INSERT — unassigned table columns become NULL. */
  final case class Insert(condition: Option[Column],
                          values: Map[String, Column]) extends Clause
}
