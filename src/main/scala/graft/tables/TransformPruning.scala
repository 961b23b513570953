package graft.tables

import scala.util.Try

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** Iceberg-style predicate projection onto partition transforms: an
  * equality / IN predicate on a transform's SOURCE column pins the
  * partition value the matching rows must live in (`id = 5` on a
  * `bucket[16]` table can only match partition `xxhash64(5) pmod 16`),
  * so every other partition's files are pruned without being opened.
  *
  * This matters exactly where min/max bounds skipping is powerless: a
  * hash-bucketed file's id range spans nearly the whole domain, so
  * bounds never exclude it — but the bucket value excludes 15/16 of the
  * table. Mirrors Iceberg's `Projections.strict/inclusive` partition
  * predicate projection over the reference's transform spec
  * (`elt-common/src/elt_common/iceberg/partition.py:11-33`).
  *
  * The projected value is computed by evaluating THE SAME Catalyst
  * expressions the writer's partition columns used
  * ([[PartitionTransform.apply]]), so writer and pruner can never
  * disagree. Anything this can't reason about (non-equality shapes,
  * eval failure, unknown columns) contributes no constraint — pruning
  * is an optimization, never a correctness gate.
  */
object TransformPruning {

  /** Partition value of `transform(value)` for a catalyst INTERNAL
    * `value` (null allowed) of the source column:
    * `None` = cannot evaluate (no pruning on this predicate);
    * `Some(None)` = the null partition; `Some(Some(dir))` = that value.
    * The directory string is the external `toString` of the transform
    * output (Int / Long / String for every non-identity transform),
    * matching the writer's Hive-style paths.
    *
    * A null source value is projected through THE SAME expression, never
    * assumed to land in the null partition: `xxhash64(null)` returns the
    * seed hash, so bucket transforms put null keys in a REGULAR bucket
    * (only the null-propagating transforms produce a null partition). */
  def projectValue(t: PartitionTransform, value: Any, dt: DataType,
                   zoneId: String): Option[Option[String]] = {
    val l = Literal(value, dt)
    val expr: Option[Expression] = t match {
      case PartitionTransform.Bucket(n) =>
        Some(Cast(Pmod(new XxHash64(Seq(l)), Literal(n.toLong)), IntegerType))
      case PartitionTransform.Year =>
        Some(Year(Cast(l, DateType, Some(zoneId))))
      case PartitionTransform.Month =>
        val d = Cast(l, DateType, Some(zoneId))
        Some(Add(Multiply(Year(d), Literal(100)), Month(d)))
      case PartitionTransform.Day =>
        Some(DateFormatClass(Cast(l, TimestampType, Some(zoneId)),
          Literal("yyyy-MM-dd"), Some(zoneId)))
      case PartitionTransform.Hour =>
        Some(DateFormatClass(Cast(l, TimestampType, Some(zoneId)),
          Literal("yyyy-MM-dd-HH"), Some(zoneId)))
      case PartitionTransform.Truncate(w) => dt match {
        case _: StringType => Some(Substring(l, Literal(1), Literal(w)))
        case _: ByteType | _: ShortType | _: IntegerType | _: LongType =>
          Some(Subtract(l, Pmod(l, Cast(Literal(w), dt))))
        case _ => None
      }
      case PartitionTransform.Identity => None // dir-encoded, Spark prunes it
    }
    expr.flatMap(e => Try(Option(e.eval(null)).map(_.toString)).toOption)
  }

  /** Per partition FIELD name: the set of manifest partition values
    * (None = the null partition) rows matching ALL the conjuncts can
    * occupy. Only non-identity transform fields whose source column
    * appears in an equality / null-safe-equality / IN conjunct
    * constrain anything; several conjuncts on one column intersect. */
  def allowedValues(conjuncts: Seq[Expression], meta: TableMetadata,
                    zoneId: String): Map[String, Set[Option[String]]] = {
    val fields = meta.partitionSpec.filterNot(_.parsed == PartitionTransform.Identity)
    if (fields.isEmpty || conjuncts.isEmpty) return Map.empty

    // point-value sets per SOURCE column from the predicate conjuncts:
    // Some(set) = column restricted to these internal values (a null
    // element, from `<=> NULL`, projects through the transform like any
    // other value); absent = unconstrained
    def points(e: Expression): Option[(String, Seq[Any])] = e match {
      case EqualTo(a: AttributeReference, Literal(v, _)) if v != null => Some(a.name -> Seq(v))
      case EqualTo(Literal(v, _), a: AttributeReference) if v != null => Some(a.name -> Seq(v))
      case EqualNullSafe(a: AttributeReference, Literal(v, _)) => Some(a.name -> Seq(v))
      case EqualNullSafe(Literal(v, _), a: AttributeReference) => Some(a.name -> Seq(v))
      case In(a: AttributeReference, list) if list.forall(_.isInstanceOf[Literal]) =>
        Some(a.name -> list.collect { case Literal(v, _) if v != null => v })
      case InSet(a: AttributeReference, hset) =>
        Some(a.name -> hset.toSeq.filter(_ != null))
      case _ => None
    }
    val split = conjuncts.flatMap(splitConjuncts)
    val byCol = split.flatMap(points).groupBy(_._1).view.mapValues(_.map(_._2))
    // IS NULL pins a single partition value too — whichever one the
    // transform maps null to (the null partition for null-propagating
    // transforms, the seed-hash bucket for bucket[n])
    val isNullCols = split.collect {
      case IsNull(a: AttributeReference) => a.name
    }.toSet
    // a StartsWith prefix at least as wide as a truncate[w] pins that
    // partition value exactly
    val prefixByCol = split.collect {
      case StartsWith(a: AttributeReference, Literal(p, StringType))
          if p != null => a.name -> p.toString
    }.groupBy(_._1).view.mapValues(_.map(_._2)).toMap

    fields.flatMap { p =>
      val dt = meta.schema(p.column).dataType
      // each conjunct's value set projects independently; any value that
      // fails to project poisons THAT conjunct (no constraint from it)
      val projected: Seq[Option[Set[Option[String]]]] =
        byCol.getOrElse(p.column, Seq.empty).map { vs =>
          val proj = vs.map(projectValue(p.parsed, _, dt, zoneId))
          if (proj.exists(_.isEmpty)) None else Some(proj.flatten.toSet)
        }
      val nullConstraint: Seq[Set[Option[String]]] =
        if (isNullCols.contains(p.column))
          projectValue(p.parsed, null, dt, zoneId).map(Set(_)).toSeq
        else Seq.empty
      val prefixConstraint: Seq[Set[Option[String]]] = p.parsed match {
        case PartitionTransform.Truncate(w) =>
          prefixByCol.getOrElse(p.column, Seq.empty).filter(_.length >= w)
            .map(pre => Set[Option[String]](Some(pre.substring(0, w))))
        case _ => Seq.empty
      }
      // a poisoned conjunct contributes no constraint (dropping one side
      // of an intersection is conservative)
      val all = projected.flatten ++ nullConstraint ++ prefixConstraint
      all.reduceOption(_ intersect _).map(p.fieldName -> _)
    }.toMap
  }

  /** Keep only files whose manifest partition value can satisfy the
    * constraints (files without the field recorded — legacy manifests —
    * always kept). */
  def prune(files: Seq[DataFile],
            allowed: Map[String, Set[Option[String]]]): Seq[DataFile] =
    if (allowed.isEmpty) files
    else files.filter(f => allowed.forall { case (field, vals) =>
      f.partitionValues.get(field).forall(vals.contains)
    })

  def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }
}
