package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Avro Object Container File shard reading/writing — the seventh ML
  * corpus container beside WebDataset tar (M8), ZIP (M9), WARC (M10),
  * Arrow (M13), JSONL (M14) and TFRecord (M15): the Hadoop-ecosystem
  * row format large corpora were historically published in (Common
  * Crawl derivative sets, Hive exports, Kafka archive dumps).
  *
  * The container layout is the public Avro 1.12 spec ("Object Container
  * Files"): magic `Obj\x01`, a metadata map (avro map<bytes> — varint
  * block count, string key + bytes value entries, 0 terminator) carrying
  * `avro.schema` (JSON) and `avro.codec`, a 16-byte sync marker, then
  * data blocks of `long count, long size, bytes[size], sync`. Datum
  * encoding is Avro binary: zigzag-varint ints/longs, little-endian
  * IEEE float/double, length-prefixed bytes/strings, block-encoded
  * arrays, and unions as a varint branch index. `deflate` is RAW
  * deflate (RFC 1951, no zlib wrapper) — `Inflater(nowrap = true)`.
  *
  * Supported schema subset (the published-corpus reality — flat records
  * of primitives and primitive lists): a top-level record whose fields
  * are boolean/int/long/float/double/string/bytes, arrays of those, or
  * the 2-branch nullable union `["null", T]` (either order). Enums,
  * maps, fixed, named-type references, nested records and logicalTypes
  * reject the WHOLE shard — no rows, never a task-killing throw (the
  * m21 stance: an unsupported contract is a shard-level condition).
  *
  * Failure contract (codec-family stance, graded by what broke):
  *   - bad magic / unreadable metadata / unsupported schema or codec —
  *     the container itself is untrusted: whole shard rejected;
  *   - a block whose sync marker mismatches — framing untrusted from
  *     here: the walk STOPS with the rows already decoded;
  *   - a block whose declared size overruns the payload — truncated:
  *     stop, keep prior rows;
  *   - a block over `maxBlockBytes` (bomb guard, enforced on BOTH the
  *     stored and the inflated size) — skipped whole; its declared
  *     `count` still advances `rec_idx`, so the gap stays visible;
  *   - a datum that fails to decode INSIDE a block — the sync framing
  *     around the block is intact, so the walk continues at the next
  *     block; rows decoded before the damage are kept and the block's
  *     remaining slots advance `rec_idx`.
  *
  * Cross-validated in `AvroShardSpec` against the independent
  * `org.apache.avro` reference implementation on Spark's classpath
  * (both directions: our writer → their reader, their writer → our
  * reader), the same both-ways independence check the JPEG/audio codecs
  * run against ImageIO/javax.sound.
  */
object AvroShard {

  // ---- schema model -------------------------------------------------------

  sealed trait AType
  case object ABool extends AType
  case object AInt extends AType
  case object ALong extends AType
  case object AFloat extends AType
  case object ADouble extends AType
  case object AString extends AType
  case object ABytes extends AType
  final case class AArray(item: AType) extends AType

  /** One record field; `nullable` means the 2-branch `["null", T]`
    * union with `nullBranch` giving the union index that is null. */
  final case class AField(name: String, tpe: AType, nullable: Boolean,
                          nullBranch: Int)

  final case class ASchema(fields: Vector[AField])

  /** Shard-level rejection control: caught at the shard boundary, never
    * escapes a task. */
  private final class ShardReject extends RuntimeException(null, null, false, false)
  /** Block-level decode failure: framing intact, skip to next block. */
  private final class BlockCorrupt extends RuntimeException(null, null, false, false)

  // ---- schema JSON (Jackson is on Spark's provided classpath) ------------

  private def primOf(s: String): Option[AType] = s match {
    case "boolean" => Some(ABool)
    case "int" => Some(AInt)
    case "long" => Some(ALong)
    case "float" => Some(AFloat)
    case "double" => Some(ADouble)
    case "string" => Some(AString)
    case "bytes" => Some(ABytes)
    case _ => None
  }

  /** Parse the `avro.schema` JSON into the supported subset; None on
    * anything outside it (including logicalTypes, whose presence changes
    * value semantics and therefore must not be silently dropped). */
  def parseSchemaJson(json: String): Option[ASchema] = {
    import com.fasterxml.jackson.databind.JsonNode
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def prim(n: JsonNode): Option[AType] =
      if (n.isTextual) primOf(n.asText())
      else if (n.isObject && n.has("type") && !n.has("logicalType") &&
               n.get("type").isTextual) primOf(n.get("type").asText())
      else None
    // a field type: primitive, array-of-primitive, or ["null", T]
    def fieldType(n: JsonNode): Option[(AType, Boolean, Int)] = {
      if (n.isArray) {
        if (n.size() != 2) return None
        val a = n.get(0); val b = n.get(1)
        def isNull(x: JsonNode) = x.isTextual && x.asText() == "null"
        if (isNull(a)) nonNull(b).map(t => (t, true, 0))
        else if (isNull(b)) nonNull(a).map(t => (t, true, 1))
        else None
      } else nonNull(n).map(t => (t, false, -1))
    }
    def nonNull(n: JsonNode): Option[AType] = {
      if (n.isTextual) primOf(n.asText())
      else if (n.isObject && n.has("type") && n.get("type").isTextual &&
               !n.has("logicalType")) {
        n.get("type").asText() match {
          case "array" =>
            if (!n.has("items")) None
            else prim(n.get("items")).map(AArray.apply)
          case other => primOf(other)
        }
      } else None
    }
    try {
      val root = mapper.readTree(json)
      if (root == null || !root.isObject) return None
      if (!root.has("type") || root.get("type").asText() != "record") return None
      if (!root.has("fields") || !root.get("fields").isArray) return None
      val fs = Vector.newBuilder[AField]
      val it = root.get("fields").elements()
      while (it.hasNext) {
        val f = it.next()
        if (!f.isObject || !f.has("name") || !f.has("type")) return None
        fieldType(f.get("type")) match {
          case Some((t, nullable, nb)) =>
            fs += AField(f.get("name").asText(), t, nullable, nb)
          case None => return None
        }
      }
      val schema = ASchema(fs.result())
      if (schema.fields.isEmpty) None else Some(schema)
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  private def typeJson(t: AType): String = t match {
    case ABool => "\"boolean\""
    case AInt => "\"int\""
    case ALong => "\"long\""
    case AFloat => "\"float\""
    case ADouble => "\"double\""
    case AString => "\"string\""
    case ABytes => "\"bytes\""
    case AArray(i) => s"""{"type":"array","items":${typeJson(i)}}"""
  }

  /** Render the writer's schema JSON. All fields are written as the
    * nullable union `["null", T]` — Spark rows carry nulls, so the
    * uniform union keeps the writer total. */
  def schemaJson(name: String, fields: Seq[(String, AType)]): String = {
    val fs = fields.map { case (n, t) =>
      s"""{"name":"$n","type":["null",${typeJson(t)}]}"""
    }.mkString(",")
    s"""{"type":"record","name":"$name","fields":[$fs]}"""
  }

  /** Spark field -> Avro type for the writer; caller-bug contract (throws). */
  def sparkToAvro(dt: DataType): AType = dt match {
    case BooleanType => ABool
    case IntegerType => AInt
    case LongType => ALong
    case FloatType => AFloat
    case DoubleType => ADouble
    case StringType => AString
    case BinaryType => ABytes
    case ArrayType(e, _) => e match {
      case LongType => AArray(ALong)
      case IntegerType => AArray(AInt)
      case DoubleType => AArray(ADouble)
      case FloatType => AArray(AFloat)
      case StringType => AArray(AString)
      case other => throw new IllegalArgumentException(
        s"AvroShard writer: unsupported array element $other")
    }
    case other => throw new IllegalArgumentException(
      s"AvroShard writer: unsupported Spark type $other")
  }

  // ---- binary primitives --------------------------------------------------

  /** Bounds-checked cursor over a byte slice; any overrun raises the
    * enclosing rejection (bad framing is never an index exception). */
  private final class In(val buf: Array[Byte], var pos: Int, val end: Int) {
    def remaining: Int = end - pos
    def u8(): Int = {
      if (pos >= end) throw new BlockCorrupt
      val b = buf(pos) & 0xff; pos += 1; b
    }
    /** Avro long: zigzag varint, max 10 bytes. */
    def readLong(): Long = {
      var shift = 0
      var acc = 0L
      var b = u8()
      while ((b & 0x80) != 0) {
        acc |= (b & 0x7fL) << shift
        shift += 7
        if (shift > 63) throw new BlockCorrupt
        b = u8()
      }
      acc |= (b & 0x7fL) << shift
      (acc >>> 1) ^ -(acc & 1L)
    }
    def readBytes(n: Int): Array[Byte] = {
      if (n < 0 || n > remaining) throw new BlockCorrupt
      val out = java.util.Arrays.copyOfRange(buf, pos, pos + n)
      pos += n
      out
    }
    def readFloat(): Float = {
      if (remaining < 4) throw new BlockCorrupt
      var v = 0
      var i = 3
      while (i >= 0) { v = (v << 8) | (buf(pos + i) & 0xff); i -= 1 }
      pos += 4
      java.lang.Float.intBitsToFloat(v)
    }
    def readDouble(): Double = {
      if (remaining < 8) throw new BlockCorrupt
      var v = 0L
      var i = 7
      while (i >= 0) { v = (v << 8) | (buf(pos + i) & 0xffL); i -= 1 }
      pos += 8
      java.lang.Double.longBitsToDouble(v)
    }
  }

  /** Decode one datum of `t`. Array counts are guarded against the
    * remaining byte budget (every supported item costs >= 1 byte), so a
    * CRC-less corrupt count can never allocate past the block. */
  private def readDatum(in: In, t: AType): Any = t match {
    case ABool => in.u8() match {
      case 0 => java.lang.Boolean.FALSE
      case 1 => java.lang.Boolean.TRUE
      case _ => throw new BlockCorrupt
    }
    case AInt =>
      val v = in.readLong()
      if (v < Int.MinValue || v > Int.MaxValue) throw new BlockCorrupt
      Int.box(v.toInt)
    case ALong => Long.box(in.readLong())
    case AFloat => Float.box(in.readFloat())
    case ADouble => Double.box(in.readDouble())
    case AString =>
      val n = in.readLong()
      if (n < 0 || n > in.remaining) throw new BlockCorrupt
      new String(in.readBytes(n.toInt), java.nio.charset.StandardCharsets.UTF_8)
    case ABytes =>
      val n = in.readLong()
      if (n < 0 || n > in.remaining) throw new BlockCorrupt
      in.readBytes(n.toInt)
    case AArray(item) =>
      val out = Seq.newBuilder[Any]
      var n = in.readLong()
      while (n != 0) {
        if (n < 0) { n = -n; in.readLong() } // negative count: a byte size follows
        if (n > in.remaining) throw new BlockCorrupt
        var i = 0L
        while (i < n) { out += readDatum(in, item); i += 1 }
        n = in.readLong()
      }
      out.result()
  }

  private def readField(in: In, f: AField): Any =
    if (!f.nullable) readDatum(in, f.tpe)
    else in.readLong() match {
      case b if b == f.nullBranch => null
      case b if b == 1 - f.nullBranch => readDatum(in, f.tpe)
      case _ => throw new BlockCorrupt
    }

  private def writeVarLong(out: java.io.ByteArrayOutputStream, value: Long): Unit = {
    var n = (value << 1) ^ (value >> 63) // zigzag
    while ((n & ~0x7fL) != 0) {
      out.write(((n & 0x7f) | 0x80).toInt)
      n >>>= 7
    }
    out.write(n.toInt)
  }

  private def writeDatum(out: java.io.ByteArrayOutputStream, t: AType, v: Any): Unit =
    (t, v) match {
      case (ABool, b: java.lang.Boolean) => out.write(if (b) 1 else 0)
      case (AInt, i: java.lang.Integer) => writeVarLong(out, i.longValue())
      case (ALong, l: java.lang.Long) => writeVarLong(out, l.longValue())
      case (AFloat, f: java.lang.Float) =>
        val bits = java.lang.Float.floatToIntBits(f)
        var i = 0
        while (i < 4) { out.write((bits >>> (8 * i)) & 0xff); i += 1 }
      case (ADouble, d: java.lang.Double) =>
        val bits = java.lang.Double.doubleToLongBits(d)
        var i = 0
        while (i < 8) { out.write(((bits >>> (8 * i)) & 0xff).toInt); i += 1 }
      case (AString, s: String) =>
        val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        writeVarLong(out, b.length.toLong); out.write(b, 0, b.length)
      case (ABytes, b: Array[Byte]) =>
        writeVarLong(out, b.length.toLong); out.write(b, 0, b.length)
      case (AArray(item), xs: scala.collection.Seq[_]) =>
        if (xs.nonEmpty) {
          writeVarLong(out, xs.size.toLong)
          xs.foreach(x => writeDatum(out, item, x))
        }
        writeVarLong(out, 0L)
      case other => throw new IllegalArgumentException(
        s"AvroShard writer: value/type mismatch $other")
    }

  /** Write one field under the uniform `["null", T]` writer union. */
  private def writeField(out: java.io.ByteArrayOutputStream, t: AType, v: Any): Unit =
    if (v == null) writeVarLong(out, 0L)
    else { writeVarLong(out, 1L); writeDatum(out, t, v) }

  // ---- container walk -----------------------------------------------------

  private val Magic = Array[Byte]('O', 'b', 'j', 1)

  /** Read the avro map<bytes> metadata (handles negative block counts). */
  private def readMeta(in: In): Map[String, Array[Byte]] = {
    val m = Map.newBuilder[String, Array[Byte]]
    var n = in.readLong()
    while (n != 0) {
      if (n < 0) { n = -n; in.readLong() }
      if (n > in.remaining) throw new ShardReject
      var i = 0L
      while (i < n) {
        val klen = in.readLong()
        if (klen < 0 || klen > in.remaining) throw new ShardReject
        val k = new String(in.readBytes(klen.toInt),
          java.nio.charset.StandardCharsets.UTF_8)
        val vlen = in.readLong()
        if (vlen < 0 || vlen > in.remaining) throw new ShardReject
        m += k -> in.readBytes(vlen.toInt)
        i += 1
      }
      n = in.readLong()
    }
    m.result()
  }

  private def inflateRaw(data: Array[Byte], cap: Int): Array[Byte] = {
    val inf = new java.util.zip.Inflater(true)
    try {
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream(math.min(cap, data.length * 4))
      val buf = new Array[Byte](64 << 10)
      while (!inf.finished()) {
        val k = inf.inflate(buf)
        if (k == 0) {
          if (inf.needsInput() || inf.needsDictionary()) throw new BlockCorrupt
        } else {
          if (out.size() + k > cap) throw new BlockCorrupt // inflate bomb
          out.write(buf, 0, k)
        }
      }
      out.toByteArray
    } catch {
      case _: java.util.zip.DataFormatException => throw new BlockCorrupt
    } finally inf.end()
  }

  private def deflateRaw(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    try {
      d.setInput(data); d.finish()
      val out = new java.io.ByteArrayOutputStream(math.max(64, data.length / 3))
      val buf = new Array[Byte](64 << 10)
      while (!d.finished()) {
        val k = d.deflate(buf)
        out.write(buf, 0, k)
      }
      out.toByteArray
    } finally d.end()
  }

  /** Bind a caller contract to a file schema: per contract field the
    * file-field index plus a widening tag. Rejects the shard if a
    * contract column is missing or type-incompatible. */
  private def bind(schema: ASchema, contract: StructType): Array[(Int, DataType, AType)] =
    contract.fields.map { cf =>
      val i = schema.fields.indexWhere(_.name == cf.name)
      if (i < 0) throw new ShardReject
      val at = schema.fields(i).tpe
      val ok = (cf.dataType, at) match {
        case (LongType, ALong | AInt) => true
        case (IntegerType, AInt) => true
        case (DoubleType, ADouble | AFloat) => true
        case (FloatType, AFloat) => true
        case (StringType, AString) => true
        case (BooleanType, ABool) => true
        case (BinaryType, ABytes) => true
        case (ArrayType(LongType, _), AArray(ALong | AInt)) => true
        case (ArrayType(DoubleType, _), AArray(ADouble | AFloat)) => true
        case (ArrayType(StringType, _), AArray(AString)) => true
        case _ => false
      }
      if (!ok) throw new ShardReject
      (i, cf.dataType, at)
    }.toArray

  private def widen(v: Any, want: DataType): Any =
    if (v == null) null
    else want match {
      case LongType => v match {
        case i: java.lang.Integer => Long.box(i.longValue()); case x => x
      }
      case DoubleType => v match {
        case f: java.lang.Float => Double.box(f.doubleValue()); case x => x
      }
      case ArrayType(LongType, _) => v.asInstanceOf[Seq[Any]].map {
        case i: java.lang.Integer => Long.box(i.longValue()); case x => x
      }
      case ArrayType(DoubleType, _) => v.asInstanceOf[Seq[Any]].map {
        case f: java.lang.Float => Double.box(f.doubleValue()); case x => x
      }
      case _ => v
    }

  /** Decode one OCF shard against `contract` under the failure contract
    * documented on the object. Output rows: (shard_id, rec_idx) ++
    * contract fields. */
  def parseShardAs(shardId: Long, payload: Array[Byte], contract: StructType,
                   maxBlockBytes: Int = 64 << 20,
                   maxRecords: Long = 1L << 20): Seq[Row] = {
    if (payload == null || payload.length < 4) return Seq.empty
    try {
      val in = new In(payload, 0, payload.length)
      var i = 0
      while (i < 4) { if (in.u8() != (Magic(i) & 0xff)) throw new ShardReject; i += 1 }
      val meta = readMeta(in)
      val schemaBytes = meta.getOrElse("avro.schema", throw new ShardReject)
      val codec = meta.get("avro.codec")
        .map(new String(_, java.nio.charset.StandardCharsets.UTF_8))
        .getOrElse("null")
      if (codec != "null" && codec != "deflate") throw new ShardReject
      val schema = parseSchemaJson(new String(schemaBytes,
        java.nio.charset.StandardCharsets.UTF_8)).getOrElse(throw new ShardReject)
      val binding = bind(schema, contract)
      if (in.remaining < 16) throw new ShardReject
      val sync = in.readBytes(16)

      val out = Seq.newBuilder[Row]
      var idx = 0L
      var done = false
      while (!done && in.remaining > 0 && idx < maxRecords) {
        // block header: count, size — a failure here is a truncated tail
        val (count, size) =
          try { val c = in.readLong(); val s = in.readLong(); (c, s) }
          catch { case _: BlockCorrupt => done = true; (0L, 0L) }
        if (!done) {
          if (count < 0 || size < 0 || size > in.remaining - 16) done = true
          else {
            val blockStart = in.pos
            in.pos = blockStart + size.toInt
            val syncOk = java.util.Arrays.equals(in.readBytes(16), sync)
            if (!syncOk) done = true // framing untrusted: stop the walk
            else if (size > maxBlockBytes) idx += count // bomb guard: skip whole
            else {
              val stored = java.util.Arrays.copyOfRange(payload, blockStart,
                blockStart + size.toInt)
              val blockStartIdx = idx
              try {
                val data = if (codec == "deflate") inflateRaw(stored, maxBlockBytes)
                           else stored
                val bin = new In(data, 0, data.length)
                var r = 0L
                while (r < count && idx < maxRecords) {
                  val all = new Array[Any](schema.fields.length)
                  var j = 0
                  while (j < schema.fields.length) {
                    all(j) = readField(bin, schema.fields(j)); j += 1
                  }
                  val values = new Array[Any](2 + binding.length)
                  values(0) = shardId
                  values(1) = idx
                  var k = 0
                  while (k < binding.length) {
                    val (fi, want, _) = binding(k)
                    values(2 + k) = widen(all(fi), want)
                    k += 1
                  }
                  out += Row.fromSeq(
                    scala.collection.immutable.ArraySeq.unsafeWrapArray(values))
                  idx += 1
                  r += 1
                }
                // slots the cap rejected still advance the index
                if (r < count) idx += count - r
              } catch {
                case _: BlockCorrupt =>
                  // datum corrupt inside an intact frame: rows already
                  // emitted stand; the block's remaining declared slots
                  // stay visible as an index gap; walk continues at the
                  // next block (the sync ahead was already verified)
                  idx = math.min(maxRecords, blockStartIdx + count)
              }
            }
          }
        }
      }
      out.result()
    } catch {
      case _: ShardReject => Seq.empty
      case scala.util.control.NonFatal(_) => Seq.empty
    }
  }

  /** Partition-parallel schema-driven explode: output columns are
    * (shard_id, rec_idx) ++ `contract`. */
  def explodeRowsAs(spark: SparkSession, shards: DataFrame,
                    contract: StructType,
                    maxBlockBytes: Int = 64 << 20): DataFrame = {
    val full = StructType(
      StructField("shard_id", LongType, nullable = false) +:
      StructField("rec_idx", LongType, nullable = false) +:
      contract.fields.map(_.copy(nullable = true)).toSeq)
    val rdd = shards
      .where(col("payload").isNotNull)
      .select(col("shard_id").cast("long"), col("payload"))
      .rdd
      .flatMap(r => parseShardAs(r.getLong(0), r.getAs[Array[Byte]](1),
        contract, maxBlockBytes))
    spark.createDataFrame(rdd, full)
  }

  // ---- write side ---------------------------------------------------------

  /** Encode one OCF shard. Deterministic by construction: the sync
    * marker is md5 of the shard seed (exactly 16 bytes), so equal inputs
    * yield byte-identical shards across runs and partitionings. */
  def encodeShard(rows: Iterator[Row], schema: StructType, syncSeed: Long,
                  codec: String = "deflate", blockRows: Int = 64,
                  recordName: String = "graft_rec"): Array[Byte] = {
    require(codec == "null" || codec == "deflate",
      s"AvroShard writer: unsupported codec $codec")
    require(blockRows > 0, "blockRows must be positive")
    val fields = schema.fields.map(f => (f.name, sparkToAvro(f.dataType))).toSeq
    val sJson = schemaJson(recordName, fields)
    val sync = java.security.MessageDigest.getInstance("MD5")
      .digest(s"graft-avro-$syncSeed".getBytes("UTF-8"))

    val out = new java.io.ByteArrayOutputStream(64 << 10)
    out.write(Magic, 0, 4)
    // metadata map: one block of 2 entries, then the 0 terminator
    val head = new java.io.ByteArrayOutputStream(sJson.length + 64)
    writeVarLong(head, 2L)
    def metaEntry(k: String, v: Array[Byte]): Unit = {
      val kb = k.getBytes("UTF-8")
      writeVarLong(head, kb.length.toLong); head.write(kb, 0, kb.length)
      writeVarLong(head, v.length.toLong); head.write(v, 0, v.length)
    }
    metaEntry("avro.schema", sJson.getBytes("UTF-8"))
    metaEntry("avro.codec", codec.getBytes("UTF-8"))
    writeVarLong(head, 0L)
    head.writeTo(out)
    out.write(sync, 0, 16)

    val block = new java.io.ByteArrayOutputStream(64 << 10)
    var inBlock = 0
    def flush(): Unit = if (inBlock > 0) {
      val raw = block.toByteArray
      val data = if (codec == "deflate") deflateRaw(raw) else raw
      val hdr = new java.io.ByteArrayOutputStream(20)
      writeVarLong(hdr, inBlock.toLong)
      writeVarLong(hdr, data.length.toLong)
      hdr.writeTo(out)
      out.write(data, 0, data.length)
      out.write(sync, 0, 16)
      block.reset(); inBlock = 0
    }
    rows.foreach { r =>
      var j = 0
      while (j < fields.length) {
        writeField(block, fields(j)._2, r.get(j)); j += 1
      }
      inBlock += 1
      if (inBlock >= blockRows) flush()
    }
    flush()
    out.toByteArray
  }

  /** DISTRIBUTED Avro OCF shard publishing (the m24/m27/m28/m29 stance
    * for the seventh container): rows hash to shards on `shardCol`, each
    * shard's rows stream through the block encoder in deterministic
    * `orderCols` order — one exchange on the shard key, per-task memory
    * O(one assembled shard) plus one open block. The record schema is
    * every `df` column except `shardCol`, in `df` order; all fields are
    * written as the nullable `["null", T]` union (Spark rows carry
    * nulls). Output: one (shard_id, payload) row per non-empty shard. */
  def writeShards(spark: SparkSession, df: DataFrame, shardCol: String,
                  orderCols: Seq[String], codec: String = "deflate",
                  blockRows: Int = 64): DataFrame = {
    val dataSchema = StructType(df.schema.fields.filter(_.name != shardCol))
    // validate the column contract on the DRIVER, not per task
    dataSchema.fields.foreach(f => sparkToAvro(f.dataType))
    require(codec == "null" || codec == "deflate",
      s"AvroShard writer: unsupported codec $codec")
    val out = StructType(Seq(
      StructField("shard_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val dataCols = dataSchema.fields.map(f => col(f.name))
    val sorted = df
      .repartition(col(shardCol))
      .sortWithinPartitions(col(shardCol) +: orderCols.map(col): _*)
      .select(col(shardCol).cast("long").as("__shard") +: dataCols.toIndexedSeq: _*)
    // consecutive runs of the same shard id -> one container per shard;
    // one-row lookahead (a run's terminating row is the next run's
    // first), so each shard's rows STREAM into the block encoder — the
    // ArrowShard.writeShards iterator discipline
    val rdd = sorted.rdd.mapPartitions { it =>
      new Iterator[Row] {
        private var pending: Row = null
        def hasNext: Boolean = pending != null || it.hasNext
        def next(): Row = {
          val first =
            if (pending != null) { val f = pending; pending = null; f }
            else it.next()
          val shard = first.getLong(0)
          val shardRows = new Iterator[Row] {
            private var nxt: Row = first
            def hasNext: Boolean = {
              if (nxt == null && pending == null && it.hasNext) {
                val r = it.next()
                if (r.getLong(0) == shard) nxt = r else pending = r
              }
              nxt != null
            }
            def next(): Row = {
              val r = nxt
              nxt = null
              Row.fromSeq((1 until r.length).map(r.get))
            }
          }
          val payload = encodeShard(shardRows, dataSchema, shard, codec,
            blockRows)
          Row(shard, payload)
        }
      }
    }
    spark.createDataFrame(rdd, out)
  }
}
