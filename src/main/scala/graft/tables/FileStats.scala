package graft.tables

import org.apache.spark.sql.types._

/** Encoding and comparison of per-file column bounds kept in snapshot
  * metadata — the role Iceberg manifests' `lower_bounds`/`upper_bounds`
  * play for PyIceberg's `row_filter` file pruning
  * (`elt-common/src/elt_common/iceberg/io.py` scans via
  * `dlt_destinations/pyiceberg/pyiceberg.py:230-233`).
  *
  * Values are stored as strings in a per-type canonical form (integers and
  * decimals verbatim, timestamps as epoch micros, dates as epoch days,
  * booleans as 0/1, short strings raw); comparison decodes both sides with
  * the table schema's type, so bounds written by any engine version compare
  * identically. Unknown/unsupported stats always read as "may match" —
  * pruning is an optimization, never a correctness gate.
  */
object FileStats {

  /** Longest string bound kept verbatim; longer strings get no stats (a
    * truncated max is unsound without the increment-last-char trick). */
  val MaxStringBound = 64

  def supported(dt: DataType): Boolean = dt match {
    case _: ByteType | _: ShortType | _: IntegerType | _: LongType |
         _: FloatType | _: DoubleType | _: DecimalType | _: BooleanType |
         _: DateType | _: TimestampType | _: TimestampNTZType |
         _: StringType => true
    case _ => false
  }

  /** Canonical string encoding of a (non-null) Scala/Java value of type
    * `dt`; None when the value cannot be soundly encoded (NaN/Inf, long
    * strings). */
  def encode(v: Any, dt: DataType): Option[String] = dt match {
    case _: ByteType | _: ShortType | _: IntegerType | _: LongType =>
      Some(v.asInstanceOf[Number].longValue().toString)
    case _: FloatType | _: DoubleType =>
      val d = v.asInstanceOf[Number].doubleValue()
      if (d.isNaN || d.isInfinite) None else Some(d.toString)
    case _: DecimalType => Some(v.toString)
    case _: BooleanType => Some(if (v.asInstanceOf[Boolean]) "1" else "0")
    case _: DateType => v match {
      case d: java.sql.Date => Some(d.toLocalDate.toEpochDay.toString)
      case d: java.time.LocalDate => Some(d.toEpochDay.toString)
      case _ => None
    }
    case _: TimestampType => v match {
      case t: java.sql.Timestamp =>
        // floorDiv, not /: getTime truncates toward zero, so pre-epoch
        // fractional seconds would otherwise encode non-monotonically
        // (-0.5s as +0.5s) and mis-prune files
        Some((math.multiplyExact(Math.floorDiv(t.getTime, 1000L), 1000000L) +
          t.getNanos / 1000L).toString)
      case t: java.time.Instant =>
        Some((math.multiplyExact(t.getEpochSecond, 1000000L) +
          t.getNano / 1000L).toString)
      case _ => None
    }
    case _: TimestampNTZType => v match {
      case t: java.time.LocalDateTime =>
        val i = t.toInstant(java.time.ZoneOffset.UTC)
        Some((math.multiplyExact(i.getEpochSecond, 1000000L) +
          i.getNano / 1000L).toString)
      case _ => None
    }
    case _: StringType =>
      val s = v.asInstanceOf[String]
      if (s.length <= MaxStringBound) Some(s) else None
    case _ => None
  }

  private def compare(a: String, b: String, dt: DataType): Int = dt match {
    case _: StringType => a.compareTo(b)
    case _ => BigDecimal(a).compare(BigDecimal(b))
  }

  /** Could a file with bounds `cs` contain a value in [lo, hi]? (None bound
    * = unbounded on that side; absent file bounds = may match.) */
  def mayOverlap(cs: ColumnStats, dt: DataType,
                 lo: Option[String], hi: Option[String],
                 loInclusive: Boolean = true, hiInclusive: Boolean = true): Boolean = {
    if (cs.min.isEmpty && cs.max.isEmpty)
      // no value bounds: either stats were unencodable (may match) or the
      // file is all-null in this column (cannot match a range predicate)
      return !(cs.nullCount >= 0 && cs.nullCount == cs.valueCount)
    val aboveLo = (lo, cs.max) match {
      case (Some(l), Some(fmax)) =>
        val c = compare(fmax, l, dt); if (loInclusive) c >= 0 else c > 0
      case _ => true
    }
    val belowHi = (hi, cs.min) match {
      case (Some(h), Some(fmin)) =>
        val c = compare(fmin, h, dt); if (hiInclusive) c <= 0 else c < 0
      case _ => true
    }
    aboveLo && belowHi
  }

  /** Could any of the (encoded) point values occur in the file? */
  def mayContainAny(cs: ColumnStats, dt: DataType, values: Seq[String]): Boolean =
    values.exists(v => mayOverlap(cs, dt, Some(v), Some(v)))

  /** Source-side key bounds for a merge: the encoded min/max of the
    * non-null key values plus whether nulls occur (merge keys are null-safe
    * equal). `unknown` bounds (unsupported type, unencodable values) match
    * every file. */
  final case class KeyBounds(dt: DataType, lo: Option[String], hi: Option[String],
                             hasNull: Boolean, unknown: Boolean)

  /** Does a file possibly contain any row whose key columns null-safe-match
    * some source row? Per column: range overlap with the source's [lo, hi],
    * OR both sides have nulls, OR either side's bounds are unknown. A file
    * must pass EVERY key column to be touched (per-column independence is a
    * conservative over-approximation of the conjunctive key match). */
  def touches(file: DataFile, bounds: Map[String, KeyBounds]): Boolean =
    bounds.forall { case (c, kb) =>
      if (kb.unknown) true
      else file.stats.get(c) match {
        case None => true // legacy manifest entry: no bounds, must rewrite
        case Some(cs) =>
          val hasValues = kb.lo.isDefined || kb.hi.isDefined
          (hasValues && mayOverlap(cs, kb.dt, kb.lo, kb.hi)) ||
            (kb.hasNull && cs.nullCount != 0)
      }
    }

  /** Split a snapshot's files into (touched, untouched) by the source key
    * bounds — the copy-on-write planning step. */
  def splitTouched(files: Seq[DataFile],
                   bounds: Map[String, KeyBounds]): (Seq[DataFile], Seq[DataFile]) =
    files.partition(touches(_, bounds))

  /** Augment a file's stats with exact bounds for IDENTITY partition
    * columns derived from its manifest partition values (min = max = the
    * value; a null partition is an all-null column) — those columns live
    * in directory names, not in the file, so they have no collected
    * stats, yet a partition predicate can prune on them exactly. Used for
    * the touched-file splits of merge/delete/update; the augmented entry
    * is for evaluation only and must NOT be written back to a manifest. */
  def withPartitionStats(f: DataFile, meta: TableMetadata,
                         zoneId: String): DataFile = {
    val idCols = meta.partitionSpec.filter(p =>
      p.parsed == PartitionTransform.Identity && !f.stats.contains(p.column))
    if (idCols.isEmpty) return f
    val n = math.max(f.rowCount, 1L)
    val extra = idCols.flatMap { p =>
      f.partitionValues.get(p.column).map {
        case Some(raw) =>
          val dt = meta.schema(p.column).dataType
          val enc = Option(LakeFileIndex.castPartitionValue(raw, dt, zoneId))
            .flatMap(encodeInternal(_, dt))
          p.column -> ColumnStats(enc, enc, 0, n)
        case None => p.column -> ColumnStats(None, None, n, n)
      }
    }
    f.copy(stats = f.stats ++ extra)
  }

  // ---- data-filter file skipping (scan planning) ----------------------

  /** Canonical-string encoding of a CATALYST-INTERNAL value: internal
    * date (epoch-day Int) and timestamp (epoch-micros Long) reps are
    * already the canonical form, so only strings/booleans re-encode. */
  def encodeInternal(v: Any, dt: DataType): Option[String] = dt match {
    case _: ByteType | _: ShortType | _: IntegerType | _: LongType |
         _: DateType | _: TimestampType | _: TimestampNTZType =>
      Some(v.asInstanceOf[Number].longValue().toString)
    case _: FloatType | _: DoubleType =>
      val d = v.asInstanceOf[Number].doubleValue()
      if (d.isNaN || d.isInfinite) None else Some(d.toString)
    case _: DecimalType => Some(v.toString)
    case _: BooleanType => Some(if (v.asInstanceOf[Boolean]) "1" else "0")
    case _: StringType =>
      val s = v.toString
      if (s.length <= MaxStringBound) Some(s) else None
    case _ => None
  }

  /** Could `file` contain a row matching the pushed-down data filter?
    * Conservative three-valued logic over the manifest bounds — any shape
    * or type this can't reason about answers "may match". This is the
    * manifest-level skip PyIceberg's `row_filter` performs against
    * Iceberg `lower_bounds`/`upper_bounds` (`pyiceberg.py:230-233`),
    * applied BEFORE Spark ever lists or opens the file. */
  def mayMatchExpr(e: org.apache.spark.sql.catalyst.expressions.Expression,
                   file: DataFile, schema: StructType): Boolean = {
    import org.apache.spark.sql.catalyst.expressions._
    def colStats(c: String): Option[(ColumnStats, DataType)] = for {
      fld <- schema.fields.find(_.name == c)
      cs <- file.stats.get(c)
      if supported(fld.dataType)
    } yield (cs, fld.dataType)
    // range check against the file bounds; unencodable value or absent
    // stats -> may match
    def range(c: String, v: Any, asLo: Boolean, asHi: Boolean,
              inclusive: Boolean): Boolean =
      colStats(c) match {
        case None => true
        case Some((cs, dt)) => encodeInternal(v, dt) match {
          case None => true
          case enc => mayOverlap(cs, dt,
            if (asLo) enc else None, if (asHi) enc else None,
            loInclusive = inclusive, hiInclusive = inclusive)
        }
      }
    def nullCheck(c: String, wantNull: Boolean): Boolean = colStats(c) match {
      case None => true
      case Some((cs, _)) =>
        if (wantNull) cs.nullCount != 0
        else !(cs.valueCount >= 0 && cs.nullCount == cs.valueCount)
    }
    e match {
      case And(l, r) => mayMatchExpr(l, file, schema) && mayMatchExpr(r, file, schema)
      case Or(l, r) => mayMatchExpr(l, file, schema) || mayMatchExpr(r, file, schema)
      case EqualTo(a: AttributeReference, Literal(v, _)) if v != null =>
        range(a.name, v, asLo = true, asHi = true, inclusive = true)
      case EqualTo(Literal(v, _), a: AttributeReference) if v != null =>
        range(a.name, v, asLo = true, asHi = true, inclusive = true)
      case EqualNullSafe(a: AttributeReference, Literal(v, _)) =>
        if (v == null) nullCheck(a.name, wantNull = true)
        else range(a.name, v, asLo = true, asHi = true, inclusive = true)
      case EqualNullSafe(Literal(v, _), a: AttributeReference) =>
        if (v == null) nullCheck(a.name, wantNull = true)
        else range(a.name, v, asLo = true, asHi = true, inclusive = true)
      case GreaterThan(a: AttributeReference, Literal(v, _)) if v != null =>
        range(a.name, v, asLo = true, asHi = false, inclusive = false)
      case GreaterThan(Literal(v, _), a: AttributeReference) if v != null =>
        range(a.name, v, asLo = false, asHi = true, inclusive = false)
      case GreaterThanOrEqual(a: AttributeReference, Literal(v, _)) if v != null =>
        range(a.name, v, asLo = true, asHi = false, inclusive = true)
      case GreaterThanOrEqual(Literal(v, _), a: AttributeReference) if v != null =>
        range(a.name, v, asLo = false, asHi = true, inclusive = true)
      case LessThan(a: AttributeReference, Literal(v, _)) if v != null =>
        range(a.name, v, asLo = false, asHi = true, inclusive = false)
      case LessThan(Literal(v, _), a: AttributeReference) if v != null =>
        range(a.name, v, asLo = true, asHi = false, inclusive = false)
      case LessThanOrEqual(a: AttributeReference, Literal(v, _)) if v != null =>
        range(a.name, v, asLo = false, asHi = true, inclusive = true)
      case LessThanOrEqual(Literal(v, _), a: AttributeReference) if v != null =>
        range(a.name, v, asLo = true, asHi = false, inclusive = true)
      case In(a: AttributeReference, list) if list.forall(_.isInstanceOf[Literal]) =>
        // IN never matches on null elements; any unencodable -> may match
        colStats(a.name) match {
          case None => true
          case Some((cs, dt)) =>
            val vs = list.collect { case Literal(v, _) if v != null => v }
            val enc = vs.map(encodeInternal(_, dt))
            enc.exists(_.isEmpty) || mayContainAny(cs, dt, enc.flatten)
        }
      case InSet(a: AttributeReference, hset) =>
        colStats(a.name) match {
          case None => true
          case Some((cs, dt)) =>
            val vs = hset.toSeq.filter(_ != null)
            val enc = vs.map(encodeInternal(_, dt))
            enc.exists(_.isEmpty) || mayContainAny(cs, dt, enc.flatten)
        }
      case IsNull(a: AttributeReference) => nullCheck(a.name, wantNull = true)
      case IsNotNull(a: AttributeReference) => nullCheck(a.name, wantNull = false)
      case StartsWith(a: AttributeReference, Literal(p, _)) if p != null =>
        // strings with prefix p lie in [p, nextPrefix(p)); nextPrefix
        // increments the last char (bail to "may match" on overflow)
        colStats(a.name) match {
          case None => true
          case Some((cs, dt)) =>
            val s = p.toString
            if (s.isEmpty || s.charAt(s.length - 1) == Char.MaxValue) true
            else {
              val next = s.substring(0, s.length - 1) +
                (s.charAt(s.length - 1) + 1).toChar
              mayOverlap(cs, dt, Some(s), Some(next), hiInclusive = false)
            }
        }
      case _ => true // Not, Contains/EndsWith, casts, unknown: no pruning
    }
  }
}
