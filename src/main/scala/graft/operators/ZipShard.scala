package graft.operators

/** ZIP archive walk (PKWARE APPNOTE structure) — the other container
  * datasets ship in. Central-directory-driven: locate the end-of-
  * central-directory record (backward scan over the trailing comment
  * window), walk the central directory for the authoritative member
  * facts (name, method, sizes, CRC-32, local-header offset), then slice
  * each member's data past its local file header. STORED (method 0)
  * members slice directly; DEFLATE (method 8) members inflate through
  * `java.util.zip.Inflater(nowrap)`. Every extracted member's CRC-32 is
  * verified — a corrupt byte cannot surface as silent wrong content.
  *
  * Same contract as [[TarShard]]: malformed archives → None/no rows,
  * never a throw; total decompressed size is allocation-guarded.
  */
object ZipShard {

  final val MaxTotalBytes: Long = 1L << 26 // 64 MiB decompressed budget
  final val MaxEntries = 65535

  /** One central-directory member (offset = local header position). */
  final case class ZipEntry(name: String, method: Int, compSize: Long,
                            size: Long, crc32: Long, offset: Long)

  def entries(p: Array[Byte]): Option[Vector[ZipEntry]] = {
    if (p == null || p.length < 22) return None
    try entriesImpl(p) catch {
      case _: ArrayIndexOutOfBoundsException => None
    }
  }

  private def entriesImpl(p: Array[Byte]): Option[Vector[ZipEntry]] = {
    def u16(i: Int) = (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)
    def u32(i: Int) = (p(i) & 0xff).toLong | ((p(i + 1) & 0xff).toLong << 8) |
      ((p(i + 2) & 0xff).toLong << 16) | ((p(i + 3) & 0xff).toLong << 24)

    // EOCD: scan backward through the maximum 64 KiB comment window
    var eocd = -1
    var i = p.length - 22
    val stop = math.max(0, p.length - 22 - 65535)
    while (eocd < 0 && i >= stop) {
      if (p(i) == 'P' && p(i + 1) == 'K' && p(i + 2) == 5 && p(i + 3) == 6 &&
          i + 22 + u16(i + 20) == p.length) eocd = i
      i -= 1
    }
    if (eocd < 0) return None
    val count = u16(eocd + 10)
    val cdSize = u32(eocd + 12)
    val cdOff = u32(eocd + 16)
    if (count > MaxEntries) return None
    if (cdOff + cdSize != eocd) return None // contiguous classic layout

    val out = Vector.newBuilder[ZipEntry]
    var at = cdOff.toInt
    var seen = 0
    var totalSize = 0L
    while (seen < count) {
      if (at + 46 > eocd) return None
      if (!(p(at) == 'P' && p(at + 1) == 'K' && p(at + 2) == 1 &&
            p(at + 3) == 2)) return None
      val method = u16(at + 10)
      val crc = u32(at + 16)
      val compSize = u32(at + 20)
      val size = u32(at + 24)
      val nameLen = u16(at + 28)
      val extraLen = u16(at + 30)
      val commentLen = u16(at + 32)
      val lho = u32(at + 42)
      if (at + 46 + nameLen > eocd) return None
      val name = new String(p, at + 46, nameLen, "UTF-8")
      totalSize += size
      if (totalSize > MaxTotalBytes) return None
      if (method != 0 && method != 8) return None // stored | deflate only
      if (method == 0 && compSize != size) return None
      out += ZipEntry(name, method, compSize, size, crc, lho)
      at += 46 + nameLen + extraLen + commentLen
      seen += 1
    }
    Some(out.result())
  }

  /** Extract one member's bytes (CRC-verified). */
  def memberBytes(p: Array[Byte], e: ZipEntry): Option[Array[Byte]] = {
    try {
      def u16(i: Int) = (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)
      val lho = e.offset.toInt
      if (lho < 0 || lho + 30 > p.length) return None
      if (!(p(lho) == 'P' && p(lho + 1) == 'K' && p(lho + 2) == 3 &&
            p(lho + 3) == 4)) return None
      val nameLen = u16(lho + 26)
      val extraLen = u16(lho + 28)
      val dataAt = lho + 30 + nameLen + extraLen
      if (e.compSize > Int.MaxValue || e.size > MaxTotalBytes) return None
      if (dataAt + e.compSize > p.length) return None
      val raw =
        if (e.method == 0)
          java.util.Arrays.copyOfRange(p, dataAt, (dataAt + e.size).toInt)
        else {
          val inf = new java.util.zip.Inflater(true)
          inf.setInput(p, dataAt, e.compSize.toInt)
          val buf = new Array[Byte](e.size.toInt)
          var got = 0
          while (got < buf.length && !inf.finished()) {
            val n = inf.inflate(buf, got, buf.length - got)
            if (n == 0 && inf.needsInput()) return None // truncated stream
            got += n
          }
          inf.end()
          if (got != buf.length) return None
          buf
        }
      val c = new java.util.zip.CRC32
      c.update(raw)
      if (c.getValue != e.crc32) None else Some(raw)
    } catch {
      case _: ArrayIndexOutOfBoundsException |
           _: java.util.zip.DataFormatException => None
    }
  }

  /** One exploded member row (same relational shape family as
    * [[TarShard.ShardMember]]; `method` distinguishes stored/deflated). */
  final case class ZipMember(shard_id: Long, sample_key: String, ext: String,
                             member_name: String, method: Int,
                             size_bytes: Long, byte_sum: Long)

  /** Partition-parallel explode of (shard_id, payload) zip rows into one
    * CRC-verified row per member. Corrupt members are skipped; corrupt
    * directories drop the shard — never a throw. */
  def explodeMembers(spark: org.apache.spark.sql.SparkSession,
                     shards: org.apache.spark.sql.DataFrame): org.apache.spark.sql.Dataset[ZipMember] = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    shards
      .where(col("payload").isNotNull)
      .select(col("shard_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        entries(bytes).toSeq.flatten.iterator.flatMap { e =>
          memberBytes(bytes, e).map { raw =>
            var sum = 0L
            var i = 0
            while (i < raw.length) { sum += raw(i) & 0xff; i += 1 }
            val (key, ext) = TarShard.splitKey(e.name)
            ZipMember(id, key, ext, e.name, e.method, e.size, sum)
          }
        }
      })
  }

  // ---- fixture encoder ------------------------------------------------

  /** Write a real classic ZIP: local headers + central directory + EOCD,
    * real CRC-32s, per-member STORED or raw-DEFLATE. */
  def encodeZip(members: Seq[(String, Array[Byte], Boolean)]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    val central = new scala.collection.mutable.ArrayBuffer[(String, Int, Long, Long, Long, Long)]
    for ((name, data, deflate) <- members) {
      val crc = { val c = new java.util.zip.CRC32; c.update(data); c.getValue }
      val comp =
        if (!deflate) data
        else {
          val d = new java.util.zip.Deflater(
            java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
          d.setInput(data); d.finish()
          val bos = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
          d.end()
          bos.toByteArray
        }
      val lho = out.size().toLong
      out.write('P'); out.write('K'); out.write(3); out.write(4)
      w16(20); w16(0); w16(if (deflate) 8 else 0)
      w16(0); w16(0) // time/date
      w32(crc); w32(comp.length.toLong); w32(data.length.toLong)
      w16(name.length); w16(0)
      out.write(name.getBytes("UTF-8"), 0, name.length)
      out.write(comp, 0, comp.length)
      central += ((name, if (deflate) 8 else 0, comp.length.toLong,
        data.length.toLong, crc, lho))
    }
    val cdOff = out.size().toLong
    for ((name, method, compSize, size, crc, lho) <- central) {
      out.write('P'); out.write('K'); out.write(1); out.write(2)
      w16(20); w16(20); w16(0); w16(method)
      w16(0); w16(0)
      w32(crc); w32(compSize); w32(size)
      w16(name.length); w16(0); w16(0)
      w16(0); w16(0); w32(0)
      w32(lho)
      out.write(name.getBytes("UTF-8"), 0, name.length)
    }
    val cdSize = out.size().toLong - cdOff
    out.write('P'); out.write('K'); out.write(5); out.write(6)
    w16(0); w16(0); w16(central.length); w16(central.length)
    w32(cdSize); w32(cdOff); w16(0)
    out.toByteArray
  }
}
