package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Coalesce}
import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable, InsertIntoStatement, LogicalPlan, MergeIntoTable, Project, SubqueryAlias, UpdateTable, V2WriteCommand}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.tables.LakeTable

/** Resolution rule: replace a catalog read of a [[LakeSqlTable]] with a
  * `HadoopFsRelation` over the manifest-backed
  * [[graft.tables.LakeFileIndex]], so SQL reads plan through the exact
  * same scan as programmatic `LakeTable.read()` — ONE `FileSourceScanExec`
  * with metadata partition pruning and manifest-bounds file skipping.
  * (The same architecture Delta Lake uses for its Spark reads: a v2
  * catalog resolves the table, an injected rule swaps in a file relation
  * driven by the table format's own metadata.)
  *
  * Write targets are left untouched: `INSERT INTO` must stay a v2
  * relation so it routes through the `V1_BATCH_WRITE` fallback into the
  * transactional commit protocol — converting it here would let Spark's
  * file-source insert write parquet straight into the directory,
  * bypassing the snapshot log.
  *
  * The snapshot pinned at `loadTable` time (schema + files, carried on
  * the [[LakeSqlTable]]) is what gets scanned — one statement, one
  * consistent table version.
  */
final class LakeRelationRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // collect (by identity) relations that are write targets, looking
    // through aliases (MERGE INTO t AS alias wraps the relation)
    val writeTargets = new java.util.IdentityHashMap[LogicalPlan, Unit]()
    def mark(p: LogicalPlan): Unit = p match {
      case a: SubqueryAlias => mark(a.child)
      case other => writeTargets.put(other, ())
    }
    plan.foreach {
      case i: InsertIntoStatement => mark(i.table)
      case w: V2WriteCommand => mark(w.table)
      case m: MergeIntoTable => mark(m.targetTable)
      case d: DeleteFromTable => mark(d.table)
      case u: UpdateTable => mark(u.table)
      case _ =>
    }
    plan.resolveOperators {
      case r: DataSourceV2Relation if r.table.isInstanceOf[LakeSqlTable] &&
          !writeTargets.containsKey(r) =>
        val t = r.table.asInstanceOf[LakeSqlTable]
        val lake = LakeTable.load(spark, t.location)
        val files = t.meta.currentSnapshot.map(_.files).getOrElse(Nil)
        val rel = lake.baseRelation(t.meta, files)
        // relation layout is dataSchema ++ partitionSchema; reuse the v2
        // relation's output attributes by NAME (parents already resolved
        // against their exprIds), minting fresh ones only for derived
        // partition columns and RENAME alias columns the v2 schema does
        // not expose
        val byName = r.output.map(a => a.name -> a).toMap
        val attrs = rel.schema.fields.toIndexedSeq.map { f =>
          byName.getOrElse(f.name,
            AttributeReference(f.name, f.dataType, nullable = true)())
        }
        val lr = LogicalRelation(rel, attrs, None, isStreaming = false, None)
        val aliases = t.meta.columnAliases
        if (aliases.isEmpty) lr
        else {
          // RENAMEd columns resolve per file via coalesce(new, old...) —
          // same projection as LakeTable.readWithPartitions. The Project
          // preserves the v2 output attributes (names AND exprIds), so
          // parents resolve unchanged.
          val attrByName = attrs.map(a => a.name -> a).toMap
          val projList = r.output.map { a =>
            aliases.get(a.name).orElse(
                aliases.find(_._1.equalsIgnoreCase(a.name)).map(_._2)) match {
              case Some(olds) if olds.nonEmpty =>
                val branches = (a.name +: olds).flatMap(attrByName.get)
                Alias(Coalesce(branches), a.name)(
                  exprId = a.exprId, qualifier = a.qualifier)
              case _ => attrByName.getOrElse(a.name, a)
            }
          }
          Project(projList, lr)
        }
    }
  }
}
