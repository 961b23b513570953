package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StructType}

/** dlt-style nested-data normalization (S4/O14): a JSON document with a list
  * field becomes a parent table plus a `{table}__{field}` child table, keyed
  * `_dlt_parent_id` -> parent `_dlt_id`
  * (consumed by the reference's models, e.g.
  * `base_statusdisplay__cycles__phases.sql:11-16`; written by dlt's
  * normalize stage, `docs-devel/elt-pipelines.md`).
  *
  * Row ids are deterministic content hashes (md5 of the canonical JSON of
  * the row) rather than dlt's random ids — stable across re-runs, which
  * makes incremental loads idempotent. Child rows get `_dlt_list_idx` for
  * order, like dlt.
  */
object JsonNormalizer {

  /** Split `df` into (parent, children) where every ArrayType(Struct) column
    * becomes a child table keyed by the parent's `_dlt_id`. */
  def normalize(tableName: String, df: DataFrame): (DataFrame, Map[String, DataFrame]) = {
    val listFields = df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[ArrayType] &&
        f.dataType.asInstanceOf[ArrayType].elementType.isInstanceOf[StructType] => f.name
    }
    val scalarCols = df.schema.fieldNames.filterNot(listFields.contains)

    // deterministic _dlt_id from the scalar content of the row
    val withId = df.withColumn("_dlt_id",
      md5(to_json(struct(scalarCols.map(col).toIndexedSeq: _*))))

    val parent = withId.select(
      (scalarCols.map(col) :+ col("_dlt_id")).toIndexedSeq: _*)

    val children = listFields.map { f =>
      val childName = s"${tableName}__$f"
      val exploded = withId.select(col("_dlt_id").as("_dlt_parent_id"),
          posexplode(col(f)).as(Seq("_dlt_list_idx", "__item")))
      val itemFields = exploded.schema("__item").dataType.asInstanceOf[StructType]
        .fieldNames.toSeq
      val child = exploded.select(
        (itemFields.map(n => col(s"__item.$n").as(n)) ++
          Seq(col("_dlt_parent_id"), col("_dlt_list_idx"))): _*)
        .withColumn("_dlt_id",
          md5(to_json(struct(col("_dlt_parent_id"), col("_dlt_list_idx")))))
      childName -> child
    }.toMap

    (parent, children)
  }
}
