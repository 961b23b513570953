package graft.operators

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.{BigIntVector, BitVector, FieldVector, Float4Vector, Float8Vector, IntVector, SmallIntVector, TinyIntVector, VarBinaryVector, VarCharVector, VectorSchemaRoot}
import org.apache.arrow.vector.complex.ListVector
import org.apache.arrow.vector.dictionary.{Dictionary, DictionaryProvider}
import org.apache.arrow.vector.ipc.{ArrowFileReader, ArrowFileWriter, SeekableReadChannel}
import org.apache.arrow.vector.types.FloatingPointPrecision
import org.apache.arrow.vector.types.pojo.{ArrowType, DictionaryEncoding, Field, FieldType, Schema}
import org.apache.arrow.vector.util.ByteArrayReadableSeekableByteChannel
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, BinaryType, BooleanType, DataType, DoubleType, FloatType, IntegerType, LongType, StringType, StructField, StructType}

import scala.jdk.CollectionConverters._

/** Arrow IPC (Feather v2) shard reading — the fourth ML corpus container
  * alongside WebDataset tar (M8), ZIP (M9) and WARC (M10): Hugging Face
  * datasets persist exactly this format (directories of Arrow record-batch
  * files), so a training-data pipeline that ingests published datasets
  * reads Arrow shards. The codec itself is the Arrow runtime SPARK
  * ALREADY SHIPS (`arrow-vector` 18.x on the classpath — no new
  * dependency); what this operator adds is the Spark-side shape: a
  * partition-parallel explode of shard BYTES into rows with strict
  * allocator discipline (one RootAllocator per payload, every batch root
  * and reader closed, so a million-shard scan cannot leak direct
  * buffers), schema validation by name/type, and the codec-family
  * failure stance — malformed shard → no rows, never a task-killing
  * throw. */
object ArrowShard {

  /** One materialized row of the (rec_id BIGINT, label UTF8, value
    * FLOAT8) shard schema the gate exercises. */
  final case class ArrowRow(shard_id: Long, row_idx: Long, rec_id: Long,
                            label: String, value: Double)

  /** parseShard calls whose per-payload allocator still reported
    * outstanding allocations at close. Arrow Java off-heap memory is freed
    * only by `release()` — a buffer a corrupt shard abandoned (because
    * `reader.close()` itself threw) is NOT reclaimed when the allocator
    * object is garbage-collected, so it leaks for the process lifetime.
    * This counter makes a corrupt-shard-heavy scan's native-memory growth
    * observable instead of silent. */
  val allocatorLeakReports = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Shared reader lifecycle: per-payload allocator, guarded separate
    * closes, leak accounting, no-rows-never-throw. `f` returns None to
    * signal a contract violation (→ empty). */
  private def withShard[T](payload: Array[Byte])
                          (f: (ArrowFileReader, VectorSchemaRoot) => Option[T]): Option[T] = {
    if (payload == null || payload.length == 0) return None
    val allocator = new RootAllocator(64L << 20)
    var reader: ArrowFileReader = null
    var root: VectorSchemaRoot = null
    try {
      reader = new ArrowFileReader(
        new SeekableReadChannel(
          new ByteArrayReadableSeekableByteChannel(payload)), allocator)
      root = reader.getVectorSchemaRoot
      f(reader, root)
    } catch {
      case scala.util.control.NonFatal(_) => None
    } finally {
      // Separate guarded close steps: a throw from one must not skip the
      // next. root.close() releases the loaded batch vectors even when
      // reader.close() would throw on the corrupt stream state; only what
      // BOTH closes released can the allocator account as freed.
      if (root != null) {
        try root.close()
        catch { case scala.util.control.NonFatal(_) => () }
      }
      if (reader != null) {
        try reader.close()
        catch { case scala.util.control.NonFatal(_) => () }
      }
      try allocator.close()
      catch {
        case _: IllegalStateException =>
          // Outstanding allocations at close = abandoned direct buffers
          // this process will never get back. Count it (observable), but
          // do not throw — a bad shard must not kill the task. The count
          // is per-executor-JVM, so ALSO log at every power-of-two total:
          // a corrupt-heavy scan's native-memory growth then shows in the
          // executor logs without the consumer knowing to poll the field.
          val n = allocatorLeakReports.incrementAndGet()
          if ((n & (n - 1)) == 0L)
            org.slf4j.LoggerFactory.getLogger(getClass).warn(
              s"ArrowShard: $n corrupt-shard allocator leak(s) in this " +
              "executor JVM (abandoned direct buffers are not reclaimable)")
          ()
      }
    }
  }

  /** Parse one shard. Schema contract: columns `rec_id` (Int64),
    * `label` (Utf8), `value` (Float64) — extra columns tolerated,
    * missing/mistyped ones reject the shard. */
  def parseShard(shardId: Long, payload: Array[Byte]): Seq[ArrowRow] =
    withShard(payload) { (reader, root) =>
      val out = Seq.newBuilder[ArrowRow]
      var idx = 0L
      var ok = true
      while (ok && reader.loadNextBatch()) {
        (root.getVector("rec_id"), root.getVector("label"),
          root.getVector("value")) match {
          case (id: BigIntVector, lab: VarCharVector, v: Float8Vector) =>
            var i = 0
            val n = root.getRowCount
            while (i < n) {
              if (!id.isNull(i) && !lab.isNull(i) && !v.isNull(i)) {
                out += ArrowRow(shardId, idx, id.get(i),
                  new String(lab.get(i), "UTF-8"), v.get(i))
              }
              idx += 1
              i += 1
            }
          case _ => ok = false // schema contract violated
        }
      }
      if (ok) Some(out.result()) else None
    }.getOrElse(Seq.empty)

  /** Explode (shard_id, payload) rows into one row per record,
    * partition-parallel. */
  def explodeRows(spark: SparkSession, shards: DataFrame): Dataset[ArrowRow] = {
    import spark.implicits._
    shards
      .where(col("payload").isNotNull)
      .select(col("shard_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) => parseShard(id, bytes) })
  }

  // ---- schema-driven materialization ----------------------------------

  /** Thrown (privately) on a shard whose columns don't satisfy the
    * caller's schema contract; caught by the lifecycle wrapper → the
    * whole shard yields no rows. */
  private final class ContractViolation extends RuntimeException

  /** Row i of vector `v` as the Spark-facing value for target type `t`.
    * Accepted (widening) pairs — the primitive+list subset HF-datasets
    * shards actually use:
    *   LongType    <- Int 8/16/32/64 (signed)
    *   IntegerType <- Int 8/16/32
    *   DoubleType  <- FloatingPoint SINGLE/DOUBLE
    *   FloatType   <- FloatingPoint SINGLE
    *   StringType  <- Utf8 / LargeUtf8, incl. dictionary-encoded Utf8
    *   BooleanType <- Bool
    *   BinaryType  <- Binary
    *   ArrayType(e)<- List / LargeList of any accepted element
    * Anything else violates the contract. */
  private def cellValue(v: FieldVector, i: Int, t: DataType,
                        dicts: java.util.Map[java.lang.Long, Dictionary]): Any = {
    if (v.isNull(i)) return null
    val enc = v.getField.getDictionary
    if (enc != null) {
      // dictionary-encoded: the loaded vector holds indices; values live
      // in the file's dictionary batch.
      val idx = v match {
        case x: TinyIntVector => x.get(i).toInt
        case x: SmallIntVector => x.get(i).toInt
        case x: IntVector => x.get(i)
        case x: BigIntVector => x.get(i).toInt
        case _ => throw new ContractViolation
      }
      val d = dicts.get(enc.getId)
      if (d == null) throw new ContractViolation
      (t, d.getVector) match {
        case (StringType, dv: VarCharVector) =>
          if (dv.isNull(idx)) null else new String(dv.get(idx), "UTF-8")
        case _ => throw new ContractViolation
      }
    } else (t, v) match {
      case (LongType, x: BigIntVector) => x.get(i)
      case (LongType, x: IntVector) => x.get(i).toLong
      case (LongType, x: SmallIntVector) => x.get(i).toLong
      case (LongType, x: TinyIntVector) => x.get(i).toLong
      case (IntegerType, x: IntVector) => x.get(i)
      case (IntegerType, x: SmallIntVector) => x.get(i).toInt
      case (IntegerType, x: TinyIntVector) => x.get(i).toInt
      case (DoubleType, x: Float8Vector) => x.get(i)
      case (DoubleType, x: Float4Vector) => x.get(i).toDouble
      case (FloatType, x: Float4Vector) => x.get(i)
      case (StringType, x: VarCharVector) => new String(x.get(i), "UTF-8")
      case (StringType, x: org.apache.arrow.vector.LargeVarCharVector) =>
        new String(x.get(i), "UTF-8")
      case (BooleanType, x: BitVector) => x.get(i) == 1
      case (BinaryType, x: VarBinaryVector) => x.get(i)
      case (ArrayType(et, _), x: ListVector) =>
        val from = x.getElementStartIndex(i)
        val until = x.getElementEndIndex(i)
        val inner = x.getDataVector
        (from until until).map(k => cellValue(inner, k, et, dicts))
      case (ArrayType(et, _), x: org.apache.arrow.vector.complex.LargeListVector) =>
        val from = x.getElementStartIndex(i).toInt
        val until = x.getElementEndIndex(i).toInt
        val inner = x.getDataVector
        (from until until).map(k => cellValue(inner, k, et, dicts))
      case _ => throw new ContractViolation
    }
  }

  /** Schema-driven shard materialization — the HF-datasets reality:
    * published shards ship ARBITRARY schemas (nested lists, dictionary-
    * encoded strings, large_utf8), not one fixed layout. `schema` states
    * the caller's column contract by NAME and Spark type (see
    * [[cellValue]] for the accepted Arrow encodings per type); extra
    * shard columns are ignored, a missing or incompatible column rejects
    * the WHOLE shard — no rows, never a task-killing throw. Output rows
    * are (shard_id, row_idx) ++ schema fields; rows with a null in any
    * requested column keep the null (unlike the fixed-contract
    * [[parseShard]], which drops them — a typed row can't carry nulls). */
  def parseShardAs(shardId: Long, payload: Array[Byte],
                   schema: StructType): Seq[Row] =
    withShard(payload) { (reader, root) =>
      try {
        val out = Seq.newBuilder[Row]
        var idx = 0L
        while (reader.loadNextBatch()) {
          val dicts = reader.getDictionaryVectors
          val cols = schema.fields.map { f =>
            val v = root.getVector(f.name)
            if (v == null) throw new ContractViolation
            v
          }
          val n = root.getRowCount
          var i = 0
          while (i < n) {
            val values = new Array[Any](2 + cols.length)
            values(0) = shardId
            values(1) = idx
            var j = 0
            while (j < cols.length) {
              values(2 + j) = cellValue(cols(j), i, schema.fields(j).dataType, dicts)
              j += 1
            }
            out += Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(values))
            idx += 1
            i += 1
          }
        }
        Some(out.result())
      } catch { case _: ContractViolation => None }
    }.getOrElse(Seq.empty)

  /** Partition-parallel schema-driven explode: output columns are
    * (shard_id, row_idx) ++ `schema`. */
  def explodeRowsAs(spark: SparkSession, shards: DataFrame,
                    schema: StructType): DataFrame = {
    val full = StructType(
      StructField("shard_id", LongType, nullable = false) +:
      StructField("row_idx", LongType, nullable = false) +:
      schema.fields.map(_.copy(nullable = true)).toSeq)
    val rdd = shards
      .where(col("payload").isNotNull)
      .select(col("shard_id").cast("long"), col("payload"))
      .rdd
      .flatMap(r => parseShardAs(r.getLong(0), r.getAs[Array[Byte]](1), schema))
    spark.createDataFrame(rdd, full)
  }

  // ---- distributed shard writing --------------------------------------

  /** Spark StructType -> Arrow schema for the writer, the exact inverse
    * of the [[cellValue]] read subset's canonical encodings: long->Int64,
    * int->Int32, double->Float8, float->Float4, string->Utf8,
    * boolean->Bool, binary->Binary, array&lt;long&gt;->List(Int64),
    * array&lt;double&gt;->List(Float8). Anything else is rejected up front
    * (writer contract violations are CALLER bugs, so unlike the read path
    * they throw). */
  private def arrowField(name: String, t: DataType): Field = t match {
    case LongType => new Field(name, FieldType.nullable(new ArrowType.Int(64, true)), null)
    case IntegerType => new Field(name, FieldType.nullable(new ArrowType.Int(32, true)), null)
    case DoubleType => new Field(name,
      FieldType.nullable(new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)), null)
    case FloatType => new Field(name,
      FieldType.nullable(new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)), null)
    case StringType => new Field(name, FieldType.nullable(ArrowType.Utf8.INSTANCE), null)
    case BooleanType => new Field(name, FieldType.nullable(ArrowType.Bool.INSTANCE), null)
    case BinaryType => new Field(name, FieldType.nullable(ArrowType.Binary.INSTANCE), null)
    case ArrayType(LongType, _) =>
      new Field(name, FieldType.nullable(ArrowType.List.INSTANCE),
        java.util.List.of(arrowField("item", LongType)))
    case ArrayType(DoubleType, _) =>
      new Field(name, FieldType.nullable(ArrowType.List.INSTANCE),
        java.util.List.of(arrowField("item", DoubleType)))
    case other => throw new IllegalArgumentException(
      s"ArrowShard.writeShards: unsupported column type $other for '$name'")
  }

  /** Set row `i` of vector `v` from Spark value `x` (null -> validity 0). */
  private def setCell(v: FieldVector, i: Int, x: Any): Unit = (v, x) match {
    case (_, null) => v.setNull(i)
    case (c: BigIntVector, n: Long) => c.setSafe(i, n)
    case (c: IntVector, n: Int) => c.setSafe(i, n)
    case (c: Float8Vector, d: Double) => c.setSafe(i, d)
    case (c: Float4Vector, f: Float) => c.setSafe(i, f)
    case (c: VarCharVector, s: String) => c.setSafe(i, s.getBytes("UTF-8"))
    case (c: BitVector, b: Boolean) => c.setSafe(i, if (b) 1 else 0)
    case (c: VarBinaryVector, b: Array[Byte]) => c.setSafe(i, b)
    case (c: ListVector, s: scala.collection.Seq[_]) =>
      val w = c.getWriter
      w.setPosition(i)
      w.startList()
      s.foreach {
        case null => c.getDataVector match {
          case _: BigIntVector => w.bigInt().writeNull()
          case _ => w.float8().writeNull()
        }
        case n: Long => w.bigInt().writeBigInt(n)
        case d: Double => w.float8().writeFloat8(d)
        case other => throw new IllegalArgumentException(
          s"ArrowShard.writeShards: unsupported list element $other")
      }
      w.endList()
    case (c, other) => throw new IllegalArgumentException(
      s"ArrowShard.writeShards: cannot write ${other.getClass} into ${c.getClass}")
  }

  /** Encode an iterator of rows (already projected to `schema`'s columns,
    * in the order they should land) into ONE Arrow IPC file, streaming in
    * record batches of `batchRows` — peak native memory is O(batchRows),
    * never O(shard), regardless of shard size; only the output payload
    * bytes accumulate. */
  def encodeRows(rows: Iterator[Row], schema: StructType,
                 batchRows: Int): Array[Byte] = {
    require(batchRows >= 1, s"batchRows must be >= 1, got $batchRows")
    val arrowSchema = new Schema(
      schema.fields.map(f => arrowField(f.name, f.dataType)).toList.asJava)
    // native memory bounds one record batch, not the shard
    val allocator = new RootAllocator(256L << 20)
    try {
      val root = VectorSchemaRoot.create(arrowSchema, allocator)
      try {
        val bos = new java.io.ByteArrayOutputStream()
        val writer = new ArrowFileWriter(root, null,
          java.nio.channels.Channels.newChannel(bos))
        writer.start()
        var i = 0
        root.allocateNew()
        while (rows.hasNext) {
          val r = rows.next()
          var j = 0
          while (j < schema.fields.length) {
            setCell(root.getVector(j), i, r.get(j))
            j += 1
          }
          i += 1
          if (i == batchRows) {
            root.setRowCount(i)
            writer.writeBatch()
            root.allocateNew()
            i = 0
          }
        }
        if (i > 0) {
          root.setRowCount(i)
          writer.writeBatch()
        }
        writer.end()
        writer.close()
        bos.toByteArray
      } finally root.close()
    } finally allocator.close()
  }

  /** Distributed Arrow IPC shard WRITING — the publish side of the m20/m21
    * readers (HF-datasets-style export: a directory of record-batch files
    * is exactly a result set of (shard_id, payload) rows written out).
    * Input rows carry `shardCol` plus the data columns; each shard's rows
    * land in ONE Arrow file, ordered by `orderCols` (a deterministic
    * within-shard order is what makes a published shard reproducible and
    * the round-trip gate hashable). One exchange on the shard key; each
    * task streams its shards' rows straight into record batches of
    * `batchRows` (O(batchRows) native memory; the payload byte array is
    * the only per-shard buffer — at production scale shard sizing is the
    * caller's sharding-key choice, same contract as the read side).
    * `shardCol` must be non-null integral values (the exchange hashes the
    * RAW column and the output keys its long cast, so two raw values that
    * cast to one long would split a shard across files).
    * Output: (shard_id, n_rows, payload). */
  def writeShards(spark: SparkSession, df: DataFrame, shardCol: String,
                  orderCols: Seq[String], batchRows: Int = 1024): DataFrame = {
    val dataSchema = StructType(df.schema.fields.filter(_.name != shardCol))
    // validate the column contract on the DRIVER, not per task
    dataSchema.fields.foreach(f => arrowField(f.name, f.dataType))
    val out = StructType(Seq(
      StructField("shard_id", LongType, nullable = false),
      StructField("n_rows", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val dataCols = dataSchema.fields.map(f => col(f.name))
    val sorted = df
      .repartition(col(shardCol))
      .sortWithinPartitions(col(shardCol) +: orderCols.map(col): _*)
      .select(col(shardCol).cast("long").as("__shard") +: dataCols: _*)
    val rdd = sorted.rdd.mapPartitions { it =>
      // consecutive runs of the same shard id -> one file per shard;
      // explicit one-row lookahead (a run's terminating row is the next
      // run's first), so each shard's rows stream straight into the
      // encoder without buffering the run
      new Iterator[Row] {
        private var pending: Row = null
        def hasNext: Boolean = pending != null || it.hasNext
        def next(): Row = {
          val first =
            if (pending != null) { val f = pending; pending = null; f }
            else it.next()
          val shard = first.getLong(0)
          var n = 0L
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
              n += 1
              Row.fromSeq((1 until r.length).map(r.get))
            }
          }
          val payload = encodeRows(shardRows, dataSchema, batchRows)
          Row(shard, n, payload)
        }
      }
    }
    spark.createDataFrame(rdd, out)
  }

  /** Size-BALANCED shard rebalance — the re-shard every data-parallel
    * training job wants before an epoch (skewed shard sizes stall the
    * slowest reader): records from arbitrarily-skewed input shards are
    * re-assigned to `nShards` output shards whose row counts differ by at
    * most one, deterministically. The global record rank that drives the
    * assignment (`shard = (rank-1)*n div total`) is computed by
    * [[PrefixSum.twoLevel]] over the record-id high bits — NEVER a
    * single-partition global window — so the only corpus-sized shuffles
    * are the leaf groupBy and the final exchange on the new shard key.
    * `rec_id` values must be unique (they are the rank order; ties would
    * make the assignment plan-dependent). Output: (shard_id, n_rows,
    * payload) — real Arrow IPC files via [[writeShards]]. */
  def rebalanceShards(spark: SparkSession, shards: DataFrame, nShards: Int,
                      batchRows: Int = 1024): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val rows = explodeRows(spark, shards).toDF().drop("shard_id", "row_idx")
    val total = rows.count()
    if (total == 0L)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row],
        StructType(Seq(
          StructField("shard_id", LongType, nullable = false),
          StructField("n_rows", LongType, nullable = false),
          StructField("payload", BinaryType, nullable = false))))
    val ranked = PrefixSum.twoLevel(
      rows.withColumn("__one", lit(1L)),
      Seq.empty, "rec_id", "__one", "__rank",
      inclusive = true, groupShift = 12)
    val assigned = ranked
      .withColumn("shard", expr(s"((__rank - 1) * $nShards) div ${total}"))
      .drop("__one", "__rank")
    writeShards(spark, assigned, "shard", Seq("rec_id"), batchRows)
  }

  // ---- fixture encoders -----------------------------------------------

  /** Write a one-batch Arrow IPC file with the typed-fixture layout the
    * schema-breadth gate exercises: rid int32, name utf8 (dictionary-
    * encoded when `dictEncodeName` — index int32, dictionary id 7),
    * score float4, flags bool, tags list&lt;int64&gt;. */
  def encodeTypedShard(rows: Seq[(Int, String, Float, Boolean, Seq[Long])],
                       dictEncodeName: Boolean): Array[Byte] = {
    val allocator = new RootAllocator(64L << 20)
    val toClose = scala.collection.mutable.ArrayBuffer.empty[AutoCloseable]
    try {
      val n = rows.length
      val rid = new IntVector("rid", allocator)
      rid.allocateNew(n)
      val nameRaw = new VarCharVector("name", allocator)
      nameRaw.allocateNew()
      val score = new Float4Vector("score", allocator)
      score.allocateNew(n)
      val flags = new BitVector("flags", allocator)
      flags.allocateNew(n)
      val tags = ListVector.empty("tags", allocator)
      val tw = tags.getWriter
      tw.allocate()
      rows.zipWithIndex.foreach { case ((r, nm, sc, fl, tg), i) =>
        rid.setSafe(i, r)
        nameRaw.setSafe(i, nm.getBytes("UTF-8"))
        score.setSafe(i, sc)
        flags.setSafe(i, if (fl) 1 else 0)
        tw.setPosition(i)
        tw.startList()
        tg.foreach(v => tw.bigInt().writeBigInt(v))
        tw.endList()
      }
      rid.setValueCount(n)
      nameRaw.setValueCount(n)
      score.setValueCount(n)
      flags.setValueCount(n)
      tags.setValueCount(n)
      val provider = new DictionaryProvider.MapDictionaryProvider()
      val nameVec: FieldVector =
        if (dictEncodeName) {
          val distinct = rows.map(_._2).distinct.sorted
          val dictVec = new VarCharVector("name_dict", allocator)
          dictVec.allocateNew()
          distinct.zipWithIndex.foreach { case (v, i) =>
            dictVec.setSafe(i, v.getBytes("UTF-8")) }
          dictVec.setValueCount(distinct.length)
          toClose += dictVec
          val dict = new Dictionary(dictVec,
            new DictionaryEncoding(7L, false, new ArrowType.Int(32, true)))
          provider.put(dict)
          toClose += nameRaw
          org.apache.arrow.vector.dictionary.DictionaryEncoder
            .encode(nameRaw, dict).asInstanceOf[FieldVector]
        } else nameRaw
      val root = new VectorSchemaRoot(
        List[FieldVector](rid, nameVec, score, flags, tags).asJava)
      toClose += root
      root.setRowCount(n)
      val bos = new java.io.ByteArrayOutputStream()
      val writer = new ArrowFileWriter(root, provider,
        java.nio.channels.Channels.newChannel(bos))
      writer.start()
      writer.writeBatch()
      writer.end()
      writer.close()
      bos.toByteArray
    } finally {
      toClose.foreach(c =>
        try c.close() catch { case scala.util.control.NonFatal(_) => () })
      allocator.close()
    }
  }

  /** Write a real Arrow IPC file of (rec_id, label, value) rows, split
    * into record batches of `batchRows`. */
  def encodeShard(rows: Seq[(Long, String, Double)],
                  batchRows: Int = 4): Array[Byte] = {
    val schema = new Schema(List(
      new Field("rec_id", FieldType.notNullable(new ArrowType.Int(64, true)), null),
      new Field("label", FieldType.notNullable(ArrowType.Utf8.INSTANCE), null),
      new Field("value", FieldType.notNullable(
        new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)), null)
    ).asJava)
    val allocator = new RootAllocator(64L << 20)
    try {
      val root = VectorSchemaRoot.create(schema, allocator)
      try {
        val bos = new java.io.ByteArrayOutputStream()
        val writer = new ArrowFileWriter(root, null,
          java.nio.channels.Channels.newChannel(bos))
        writer.start()
        rows.grouped(math.max(1, batchRows)).foreach { batch =>
          root.allocateNew()
          val id = root.getVector("rec_id").asInstanceOf[BigIntVector]
          val lab = root.getVector("label").asInstanceOf[VarCharVector]
          val v = root.getVector("value").asInstanceOf[Float8Vector]
          batch.zipWithIndex.foreach { case ((r, l, x), i) =>
            id.setSafe(i, r)
            lab.setSafe(i, l.getBytes("UTF-8"))
            v.setSafe(i, x)
          }
          root.setRowCount(batch.length)
          writer.writeBatch()
        }
        writer.end()
        writer.close()
        bos.toByteArray
      } finally root.close()
    } finally allocator.close()
  }
}
