package graft.operators

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.{BigIntVector, Float8Vector, VarCharVector, VectorSchemaRoot}
import org.apache.arrow.vector.ipc.{ArrowFileReader, ArrowFileWriter, SeekableReadChannel}
import org.apache.arrow.vector.types.FloatingPointPrecision
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema}
import org.apache.arrow.vector.util.ByteArrayReadableSeekableByteChannel
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

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

  /** Parse one shard. Schema contract: columns `rec_id` (Int64),
    * `label` (Utf8), `value` (Float64) — extra columns tolerated,
    * missing/mistyped ones reject the shard. */
  def parseShard(shardId: Long, payload: Array[Byte]): Seq[ArrowRow] = {
    if (payload == null || payload.length == 0) return Seq.empty
    val out = Seq.newBuilder[ArrowRow]
    val allocator = new RootAllocator(64L << 20)
    var reader: ArrowFileReader = null
    var root: VectorSchemaRoot = null
    try {
      reader = new ArrowFileReader(
        new SeekableReadChannel(
          new ByteArrayReadableSeekableByteChannel(payload)), allocator)
      root = reader.getVectorSchemaRoot
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
      if (ok) out.result() else Seq.empty
    } catch {
      case scala.util.control.NonFatal(_) => Seq.empty
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
          // do not throw — a bad shard must not kill the task.
          allocatorLeakReports.incrementAndGet()
          ()
      }
    }
  }

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

  // ---- fixture encoder ------------------------------------------------

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
