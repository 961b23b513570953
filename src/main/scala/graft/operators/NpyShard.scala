package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** NumPy `.npy` / `.npz` reading and writing — the ninth ML corpus
  * container (the scientific-Python interchange reality: embedding
  * dumps, token-id arrays and label vectors move between pipelines as
  * `.npy`, bundles of them as `.npz`).
  *
  * `.npy` is NumPy's published format (numpy/lib/format.py): magic
  * `\x93NUMPY`, version (1.0: u16 LE header length / 2.0: u32), then a
  * Python-dict-literal header `{'descr': '<f4', 'fortran_order': False,
  * 'shape': (2, 3), }` space-padded so the data starts 64-byte aligned,
  * then the raw little-endian buffer. The header dict is a CONSTRAINED
  * literal — three known keys — so it parses with a deterministic
  * field walk, not a Python evaluator.
  *
  * Supported descrs: `<f4 <f8 <i8 <i4 <i2 |i1 |u1 |b1` (and the `=`
  * byte-order alias). `fortran_order: True` REJECTS loudly — silently
  * mis-striding a column-major array corrupts every row downstream.
  * Big-endian (`>`) rejects. `.npz` is a ZIP of `.npy` members and
  * composes with [[ZipShard]]'s store/deflate walk.
  *
  * Failure contract: whole-FILE — bad magic/version, header overrun or
  * bomb, unknown descr, fortran order, shape/buffer disagreement all
  * yield None (inside an `.npz`, the damaged MEMBER drops; surviving
  * members still row — member boundaries are the zip's, trusted from
  * its own walk). Never a throw.
  */
object NpyShard {

  final case class NpyArray(descr: String, shape: Seq[Long],
                            data: Array[Byte], dataOff: Int)

  private val DescrBytes: Map[String, Int] = Map(
    "f4" -> 4, "f8" -> 8, "i8" -> 8, "i4" -> 4, "i2" -> 2,
    "i1" -> 1, "u1" -> 1, "b1" -> 1)

  /** Parse one `.npy` payload; None on any damage. */
  def parseNpy(p: Array[Byte], maxHeaderBytes: Int = 1 << 20): Option[NpyArray] = {
    if (p == null || p.length < 10) return None
    if ((p(0) & 0xff) != 0x93 || p(1) != 'N' || p(2) != 'U' || p(3) != 'M' ||
        p(4) != 'P' || p(5) != 'Y') return None
    val major = p(6) & 0xff
    val (hlen, hoff) =
      if (major == 1) (((p(8) & 0xff) | ((p(9) & 0xff) << 8)).toLong, 10)
      else if (major == 2) {
        if (p.length < 12) return None
        (((p(8) & 0xffL)) | ((p(9) & 0xffL) << 8) | ((p(10) & 0xffL) << 16) |
          ((p(11) & 0xffL) << 24), 12)
      } else return None
    if (hlen <= 0 || hlen > maxHeaderBytes || hoff + hlen > p.length) return None
    val header = new String(p, hoff, hlen.toInt,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    // constrained-literal field walk
    def strField(key: String): Option[String] = {
      val at = header.indexOf(s"'$key'")
      if (at < 0) return None
      val colon = header.indexOf(':', at)
      if (colon < 0) return None
      var i = colon + 1
      while (i < header.length && header.charAt(i).isWhitespace) i += 1
      if (i >= header.length) return None
      if (header.charAt(i) == '\'') {
        val end = header.indexOf('\'', i + 1)
        if (end < 0) None else Some(header.substring(i + 1, end))
      } else if (header.charAt(i) == '(') {
        val end = header.indexOf(')', i)
        if (end < 0) None else Some(header.substring(i + 1, end))
      } else {
        var j = i
        while (j < header.length && header.charAt(j) != ',' &&
               header.charAt(j) != '}') j += 1
        Some(header.substring(i, j).trim)
      }
    }
    val descrRaw = strField("descr").getOrElse(return None)
    if (descrRaw.length < 2) return None
    val (order, kind) = (descrRaw.charAt(0), descrRaw.substring(1))
    if (order == '>') return None // big-endian: reject, never mis-decode
    val descr =
      if (order == '<' || order == '|' || order == '=') kind
      else return None
    if (!DescrBytes.contains(descr)) return None
    val fortran = strField("fortran_order").getOrElse(return None)
    if (fortran != "False") return None // True mis-strides; reject loudly
    val shapeStr = strField("shape").getOrElse(return None)
    val dims = shapeStr.split(",").map(_.trim).filter(_.nonEmpty)
    val shape =
      try dims.toSeq.map(_.toLong)
      catch { case _: NumberFormatException => return None }
    if (shape.exists(_ < 0)) return None
    val n =
      try shape.foldLeft(1L)(math.multiplyExact)
      catch { case _: ArithmeticException => return None }
    val dataOff = hoff + hlen.toInt
    if (p.length - dataOff != n * DescrBytes(descr)) return None
    Some(NpyArray(descr, shape, p, dataOff))
  }

  /** Per-array stats (the m32 shape): n_dims, n_elems, exact-order
    * double sum, min, max. */
  def stats(a: NpyArray): (Long, Long, Double, Double, Double) = {
    val width = DescrBytes(a.descr)
    val n = ((a.data.length - a.dataOff) / width).toInt
    def leLong(off: Int, w: Int): Long = {
      var v = 0L
      var i = w - 1
      while (i >= 0) { v = (v << 8) | (a.data(off + i) & 0xffL); i -= 1 }
      v
    }
    var sum = 0.0
    var mn = Double.PositiveInfinity
    var mx = Double.NegativeInfinity
    var i = 0
    while (i < n) {
      val off = a.dataOff + i * width
      val v = a.descr match {
        case "f4" => java.lang.Float.intBitsToFloat(leLong(off, 4).toInt).toDouble
        case "f8" => java.lang.Double.longBitsToDouble(leLong(off, 8))
        case "i8" => leLong(off, 8).toDouble
        case "i4" => leLong(off, 4).toInt.toDouble
        case "i2" => leLong(off, 2).toShort.toDouble
        case "i1" => a.data(off).toDouble
        case "u1" => (a.data(off) & 0xff).toDouble
        case "b1" => if (a.data(off) != 0) 1.0 else 0.0
      }
      sum += v
      if (v < mn) mn = v
      if (v > mx) mx = v
      i += 1
    }
    (a.shape.size.toLong, n.toLong, sum,
      if (n == 0) 0.0 else mn, if (n == 0) 0.0 else mx)
  }

  /** Read an f4 array's values (the embedding-consumption path). */
  def readF4(a: NpyArray): Array[Float] = {
    require(a.descr == "f4", s"readF4 on descr ${a.descr}")
    val n = (a.data.length - a.dataOff) / 4
    Array.tabulate(n) { i =>
      var v = 0
      var j = 3
      while (j >= 0) { v = (v << 8) | (a.data(a.dataOff + i * 4 + j) & 0xff); j -= 1 }
      java.lang.Float.intBitsToFloat(v)
    }
  }

  /** Explode `.npz` shards (ZIP of `.npy` members, [[ZipShard]]'s walk)
    * into per-array stats rows: (shard_id, name, descr, n_dims, n_elems,
    * sum_value, min_value, max_value). A damaged member drops; a
    * damaged zip drops the shard (ZipShard's contract). */
  def explodeNpz(spark: SparkSession, shards: DataFrame): DataFrame = {
    import spark.implicits._
    shards
      .where(col("payload").isNotNull)
      .select(col("shard_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        ZipShard.entries(bytes).toSeq.flatten.flatMap { e =>
          for {
            member <- ZipShard.memberBytes(bytes, e)
            arr <- parseNpy(member)
          } yield {
            val (nd, ne, sum, mn, mx) = stats(arr)
            val name = e.name.stripSuffix(".npy")
            (id, name, arr.descr, nd, ne, sum, mn, mx)
          }
        }
      })
      .toDF("shard_id", "name", "descr", "n_dims", "n_elems", "sum_value",
        "min_value", "max_value")
  }

  // ---- write side ---------------------------------------------------------

  /** Encode one `.npy` (version 1.0, 64-byte-aligned data start, the
    * byte layout `numpy.save` produces). Deterministic. */
  def encodeNpy(descr: String, shape: Seq[Long], data: Array[Byte]): Array[Byte] = {
    val width = DescrBytes.getOrElse(descr,
      throw new IllegalArgumentException(s"unsupported descr $descr"))
    val n = shape.foldLeft(1L)(math.multiplyExact)
    require(data.length.toLong == n * width,
      s"npy: ${data.length} bytes != $n x $width")
    val order = if (width == 1) "|" else "<"
    val shapeStr = shape.size match {
      case 1 => s"(${shape.head},)"
      case _ => shape.mkString("(", ", ", ")")
    }
    val base = s"{'descr': '$order$descr', 'fortran_order': False, " +
      s"'shape': $shapeStr, }"
    val unpadded = 10 + base.length + 1 // +1 for the trailing \n
    val total = ((unpadded + 63) / 64) * 64
    val header = base + " " * (total - unpadded) + "\n"
    // v1 carries the header length in a u16; a shape long enough to
    // overflow it needs the v2 format this writer doesn't emit
    require(header.length <= 0xffff,
      s"npy v1 header overflows u16 (${header.length} bytes): shape too long")
    val out = new java.io.ByteArrayOutputStream(total + data.length)
    out.write(0x93); out.write('N'); out.write('U'); out.write('M')
    out.write('P'); out.write('Y'); out.write(1); out.write(0)
    val hlen = header.length
    out.write(hlen & 0xff); out.write((hlen >> 8) & 0xff)
    val hb = header.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    out.write(hb, 0, hb.length)
    out.write(data, 0, data.length)
    out.toByteArray
  }

  /** Encode an `.npz`: a STORED zip of named `.npy` members (numpy's
    * uncompressed `savez` layout), via [[ZipShard]]'s writer. */
  def encodeNpz(arrays: Seq[(String, String, Seq[Long], Array[Byte])]): Array[Byte] =
    ZipShard.encodeZip(arrays.map { case (name, descr, shape, data) =>
      (s"$name.npy", encodeNpy(descr, shape, data), false)
    })
}
