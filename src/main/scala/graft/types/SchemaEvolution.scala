package graft.types

import org.apache.spark.sql.types.{StructField, StructType}

/** Add-only schema evolution with the exact compatibility rules of the
  * reference (`elt-common/src/elt_common/iceberg/schema.py:117-159`):
  * new fields are allowed and merged by name; removals, renames (seen as a
  * removal + an add of a same-position name), type changes, and
  * required-flag changes are incompatible and raise, with ALL
  * incompatibilities listed in the error message.
  */
object SchemaEvolution {

  final class IncompatibleSchemaException(val incompatibilities: Seq[String])
      extends IllegalArgumentException(
        s"Incompatible changes to schema: ${incompatibilities.mkString("[", ", ", "]")}")

  /** Attempt to evolve `current` to cover `incoming`.
    *
    * @return None if nothing changed; Some(newSchema) when `incoming` adds
    *         fields (appended in incoming order, forced nullable — a new
    *         column cannot be required for pre-existing rows).
    * @throws IncompatibleSchemaException listing every incompatible change.
    */
  def evolve(current: StructType, incoming: StructType): Option[StructType] = {
    val incompatibilities = scala.collection.mutable.ListBuffer.empty[String]
    current.fields.foreach { f =>
      incoming.fields.find(_.name == f.name) match {
        case None =>
          incompatibilities += s"Field '${f.name}' removed"
        case Some(nf) if nf.dataType != f.dataType =>
          incompatibilities +=
            s"Field '${f.name}' changed type from '${f.dataType.sql}' to '${nf.dataType.sql}'"
        case Some(nf) if nf.nullable && !f.nullable =>
          // optional data into a required column is the one incompatible
          // direction (PyIceberg parity: required data fits an optional
          // column without evolution)
          incompatibilities += s"Field '${f.name}' 'required' changed to false"
        case _ => ()
      }
    }
    if (incompatibilities.nonEmpty)
      throw new IncompatibleSchemaException(incompatibilities.toList)

    val added = incoming.fields.filterNot(nf => current.fieldNames.contains(nf.name))
    if (added.isEmpty) None
    else Some(StructType(current.fields ++ added.map(f => f.copy(nullable = true))))
  }
}
