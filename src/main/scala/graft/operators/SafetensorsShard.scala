package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** safetensors shard reading/writing — the eighth ML corpus container
  * (the Hugging Face tensor-publishing format: model weights, and
  * increasingly PRECOMPUTED EMBEDDING datasets, ship as `*.safetensors`
  * shards).
  *
  * The layout is the published safetensors spec (a deliberate
  * anti-pickle design — nothing executable, one JSON header, one flat
  * buffer):
  *
  *   u64 LE header_len
  *   header_len bytes of JSON: { "name": {"dtype":"F32","shape":[..],
  *     "data_offsets":[start,end]}, ..., "__metadata__": {str:str} }
  *   byte buffer (offsets are buffer-relative)
  *
  * Supported dtypes here: F32, F64, I64, I32, I16, I8, U8, BOOL — the
  * embedding/label reality (F16/BF16 publish too but decode lossily;
  * rejecting them loudly beats quiet precision loss; extend when a
  * consumer needs them). All little-endian per spec.
  *
  * Failure contract (the codec-family stance): the container is ONE
  * header + ONE buffer, so damage anywhere is whole-shard — short
  * payload, header_len overrunning the payload or the `maxHeaderBytes`
  * bomb guard, unparsable JSON, an unsupported dtype, negative/reversed/
  * out-of-buffer offsets, or an offsets span that disagrees with
  * shape x dtype-size: all reject the shard (no rows, never a throw).
  *
  * Scale shape: partition-parallel explode of (shard_id, payload) rows;
  * each tensor's stats reduce in the same pass (no tensor materializes
  * beyond its own decode); zero shuffle.
  */
object SafetensorsShard {

  final case class TensorMeta(name: String, dtype: String,
                              shape: Seq[Long], start: Long, end: Long)

  private val DtypeBytes: Map[String, Int] = Map(
    "F64" -> 8, "F32" -> 4, "I64" -> 8, "I32" -> 4, "I16" -> 2,
    "I8" -> 1, "U8" -> 1, "BOOL" -> 1)

  private def readLeLong(b: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | (b(off + i) & 0xffL); i -= 1 }
    v
  }

  /** Parse header; None on any damage (contract above). Returns metas in
    * buffer offset order plus the buffer's start position. */
  def header(payload: Array[Byte],
             maxHeaderBytes: Int = 16 << 20): Option[(Seq[TensorMeta], Long)] = {
    if (payload == null || payload.length < 8) return None
    val hlen = readLeLong(payload, 0)
    if (hlen <= 0 || hlen > maxHeaderBytes ||
        8L + hlen > payload.length) return None
    val bufStart = 8L + hlen
    val bufLen = payload.length - bufStart
    try {
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val root = mapper.readTree(payload, 8, hlen.toInt)
      if (root == null || !root.isObject) return None
      val out = Seq.newBuilder[TensorMeta]
      val names = root.fieldNames()
      while (names.hasNext) {
        val name = names.next()
        if (name != "__metadata__") {
          val t = root.get(name)
          if (!t.isObject || !t.has("dtype") || !t.has("shape") ||
              !t.has("data_offsets")) return None
          val dtype = t.get("dtype").asText()
          val width = DtypeBytes.getOrElse(dtype, return None)
          val shapeNode = t.get("shape")
          if (!shapeNode.isArray) return None
          var n = 1L
          val shape = Seq.newBuilder[Long]
          val it = shapeNode.elements()
          while (it.hasNext) {
            val d = it.next()
            if (!d.isIntegralNumber || d.asLong() < 0) return None
            shape += d.asLong()
            n = math.multiplyExact(n, d.asLong())
          }
          val offs = t.get("data_offsets")
          if (!offs.isArray || offs.size() != 2) return None
          val start = offs.get(0).asLong()
          val end = offs.get(1).asLong()
          if (start < 0 || end < start || end > bufLen) return None
          if (end - start != n * width) return None
          out += TensorMeta(name, dtype, shape.result(), start, end)
        }
      }
      Some((out.result().sortBy(_.start), bufStart))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** One decoded-tensor stats row: element count, numeric sum (integer
    * dtypes sum exactly; F32/F64 sum in double), min/max as double. */
  final case class TensorRow(shard_id: Long, name: String, dtype: String,
                             n_dims: Long, n_elems: Long, sum_value: Double,
                             min_value: Double, max_value: Double)

  private def valueAt(p: Array[Byte], base: Int, i: Int, dtype: String): Double =
    dtype match {
      case "F32" =>
        var v = 0
        var j = 3
        while (j >= 0) { v = (v << 8) | (p(base + i * 4 + j) & 0xff); j -= 1 }
        java.lang.Float.intBitsToFloat(v).toDouble
      case "F64" => java.lang.Double.longBitsToDouble(readLeLong(p, base + i * 8))
      case "I64" => readLeLong(p, base + i * 8).toDouble
      case "I32" =>
        var v = 0
        var j = 3
        while (j >= 0) { v = (v << 8) | (p(base + i * 4 + j) & 0xff); j -= 1 }
        v.toDouble
      case "I16" =>
        ((p(base + i * 2) & 0xff) | (p(base + i * 2 + 1) << 8)).toShort.toDouble
      case "I8" => p(base + i).toDouble
      case "U8" => (p(base + i) & 0xff).toDouble
      case "BOOL" => if (p(base + i) != 0) 1.0 else 0.0
    }

  /** Decode one shard into per-tensor stats rows; empty on damage. */
  def parseShard(shardId: Long, payload: Array[Byte],
                 maxHeaderBytes: Int = 16 << 20): Seq[TensorRow] =
    header(payload, maxHeaderBytes) match {
      case None => Seq.empty
      case Some((metas, bufStart)) =>
        metas.map { m =>
          val n = ((m.end - m.start) / DtypeBytes(m.dtype)).toInt
          val base = (bufStart + m.start).toInt
          var sum = 0.0
          var mn = Double.PositiveInfinity
          var mx = Double.NegativeInfinity
          var i = 0
          while (i < n) {
            val v = valueAt(payload, base, i, m.dtype)
            sum += v
            if (v < mn) mn = v
            if (v > mx) mx = v
            i += 1
          }
          TensorRow(shardId, m.name, m.dtype, m.shape.size.toLong, n.toLong,
            sum, if (n == 0) 0.0 else mn, if (n == 0) 0.0 else mx)
        }
    }

  /** Read one F32 tensor's values (the embedding-consumption path). */
  def readF32(payload: Array[Byte], m: TensorMeta, bufStart: Long): Array[Float] = {
    require(m.dtype == "F32", s"readF32 on dtype ${m.dtype}")
    val n = ((m.end - m.start) / 4).toInt
    val base = (bufStart + m.start).toInt
    Array.tabulate(n) { i =>
      var v = 0
      var j = 3
      while (j >= 0) { v = (v << 8) | (payload(base + i * 4 + j) & 0xff); j -= 1 }
      java.lang.Float.intBitsToFloat(v)
    }
  }

  /** Partition-parallel explode of (shard_id, payload) into tensor stats. */
  def explodeTensors(spark: SparkSession, shards: DataFrame,
                     maxHeaderBytes: Int = 16 << 20): DataFrame = {
    import spark.implicits._
    shards
      .where(col("payload").isNotNull)
      .select(col("shard_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        parseShard(id, bytes, maxHeaderBytes)
      })
      .toDF()
  }

  // ---- write side ---------------------------------------------------------

  /** One tensor to publish: name, dtype, shape, raw little-endian bytes
    * (length must equal product(shape) x dtype width — caller bug
    * otherwise). */
  final case class Tensor(name: String, dtype: String, shape: Seq[Long],
                          data: Array[Byte])

  def encodeF32(values: Array[Float]): Array[Byte] = {
    val out = new Array[Byte](values.length * 4)
    var i = 0
    while (i < values.length) {
      val bits = java.lang.Float.floatToIntBits(values(i))
      var j = 0
      while (j < 4) { out(i * 4 + j) = ((bits >>> (8 * j)) & 0xff).toByte; j += 1 }
      i += 1
    }
    out
  }

  def encodeI64(values: Array[Long]): Array[Byte] = {
    val out = new Array[Byte](values.length * 8)
    var i = 0
    while (i < values.length) {
      var v = values(i)
      var j = 0
      while (j < 8) { out(i * 8 + j) = (v & 0xff).toByte; v >>>= 8; j += 1 }
      i += 1
    }
    out
  }

  /** Encode one shard. Deterministic: tensors lay out in the given
    * order, the JSON header lists them in that order with no whitespace,
    * so equal inputs produce byte-identical shards. */
  def encodeShard(tensors: Seq[Tensor],
                  metadata: Seq[(String, String)] = Seq.empty): Array[Byte] = {
    var off = 0L
    val entries = tensors.map { t =>
      val width = DtypeBytes.getOrElse(t.dtype,
        throw new IllegalArgumentException(s"unsupported dtype ${t.dtype}"))
      val n = t.shape.foldLeft(1L)(math.multiplyExact)
      require(t.data.length.toLong == n * width,
        s"tensor ${t.name}: ${t.data.length} bytes != $n x $width")
      val start = off
      off += t.data.length
      val shapeJson = t.shape.mkString("[", ",", "]")
      s""""${t.name}":{"dtype":"${t.dtype}","shape":$shapeJson,""" +
        s""""data_offsets":[$start,$off]}"""
    }
    val metaJson =
      if (metadata.isEmpty) Seq.empty
      else Seq(s""""__metadata__":{${metadata.map { case (k, v) =>
        s""""$k":"$v"""" }.mkString(",")}}""")
    val headerJson = (metaJson ++ entries).mkString("{", ",", "}")
    val hb = headerJson.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new java.io.ByteArrayOutputStream(8 + hb.length + off.toInt)
    var v = hb.length.toLong
    var j = 0
    while (j < 8) { out.write((v & 0xff).toInt); v >>>= 8; j += 1 }
    out.write(hb, 0, hb.length)
    tensors.foreach(t => out.write(t.data, 0, t.data.length))
    out.toByteArray
  }
}
