package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** WebDataset-style tar shard reading — the container format
  * large-scale multimodal training pipelines actually ship: samples are
  * adjacent members of a (possibly gzipped) POSIX ustar archive, keyed
  * by basename-before-first-dot ("000017.jpg" + "000017.txt" +
  * "000017.json" form one sample). This walker makes those shards
  * analyzable in-engine: REAL ustar header parse (octal size fields,
  * space-signed checksum verification, long-name prefix field, data
  * rounded to 512-byte blocks, two-zero-block terminator), transparent
  * gzip unwrap via `java.util.zip` (multi-member aware), and a
  * partition-parallel explode to one row per member with its sample key.
  *
  * Like every codec here: malformed shards → no rows, never a throw; a
  * checksum-corrupt header rejects the whole shard (tar has no per-file
  * framing to resync on safely). Decompressed size is allocation-guarded
  * — a 100-byte gzip bomb cannot claim gigabytes.
  */
object TarShard {

  /** Guard on decompressed shard bytes. */
  final val MaxShardBytes: Int = 1 << 26 // 64 MiB

  /** One archive member's facts; `offset` points at the data (after the
    * header block) within the DECOMPRESSED shard bytes. */
  final case class TarEntry(name: String, size: Long, offset: Long,
                            typeflag: Char)

  /** Transparently gunzip a shard if it carries the gzip magic;
    * otherwise return it unchanged. None when the stream is corrupt or
    * exceeds [[MaxShardBytes]]. */
  def unwrap(p: Array[Byte]): Option[Array[Byte]] = {
    if (p == null) return None
    if (p.length < 2 || (p(0) & 0xff) != 0x1f || (p(1) & 0xff) != 0x8b)
      return Some(p)
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(p))
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) {
        if (out.size() + n > MaxShardBytes) return None
        out.write(buf, 0, n)
        n = in.read(buf)
      }
      Some(out.toByteArray)
    } catch { case _: java.io.IOException => None }
  }

  /** Parse the ustar member table. None on structural damage (bad octal,
    * checksum mismatch, truncated data); directories and other non-file
    * typeflags are listed too (callers filter on typeflag '0'). */
  def entries(shard: Array[Byte]): Option[Vector[TarEntry]] =
    unwrap(shard).flatMap(entriesOf)

  /** Member-table parse over ALREADY-unwrapped bytes. */
  private def entriesOf(p: Array[Byte]): Option[Vector[TarEntry]] = {
    if (p.length % 512 != 0) return None
    val out = Vector.newBuilder[TarEntry]
    var at = 0
    def octal(off: Int, len: Int): Option[Long] = {
      var v = 0L
      var i = off
      val end = off + len
      var seen = false
      // skip leading spaces/NULs; field ends at space or NUL
      while (i < end && (p(i) == ' ' || p(i) == 0)) i += 1
      while (i < end && p(i) != ' ' && p(i) != 0) {
        val c = p(i)
        if (c < '0' || c > '7') return None
        v = v * 8 + (c - '0')
        if (v < 0) return None
        seen = true
        i += 1
      }
      if (seen) Some(v) else None
    }
    while (at + 512 <= p.length) {
      // terminator: an all-zero block (spec says two; accept at first)
      var zero = true
      var i = 0
      while (zero && i < 512) { if (p(at + i) != 0) zero = false; i += 1 }
      if (zero) return Some(out.result())
      // header checksum: bytes summed with the chksum field as spaces
      val stored = octal(at + 148, 8).getOrElse(return None)
      var sum = 0L
      i = 0
      while (i < 512) {
        sum += (if (i >= 148 && i < 156) ' '.toInt else p(at + i) & 0xff)
        i += 1
      }
      if (sum != stored) return None
      def str(off: Int, len: Int): String = {
        var e = off
        while (e < off + len && p(e) != 0) e += 1
        new String(p, off, e - off, "US-ASCII")
      }
      val prefix = str(at + 345, 155)
      val base = str(at, 100)
      val name = if (prefix.isEmpty) base else prefix + "/" + base
      val size = octal(at + 124, 12).getOrElse(return None)
      val typeflag = { val t = p(at + 156); if (t == 0) '0' else t.toChar }
      val dataAt = at + 512
      val dataBlocks = ((size + 511) / 512).toInt
      if (dataAt + dataBlocks * 512L > p.length) return None
      out += TarEntry(name, size, dataAt.toLong, typeflag)
      at = dataAt + dataBlocks * 512
    }
    Some(out.result()) // no terminator blocks: tolerated at exact EOF
  }

  /** WebDataset sample key: basename before the FIRST dot; extension is
    * everything after it ("d/000017.seg.json" → ("d/000017", "seg.json")). */
  private[operators] def splitKey(name: String): (String, String) = {
    val slash = name.lastIndexOf('/')
    val dot = name.indexOf('.', slash + 1)
    if (dot < 0) (name, "") else (name.substring(0, dot), name.substring(dot + 1))
  }

  /** One exploded member row: WebDataset key + extension + member facts +
    * a payload checksum (sum of bytes — cheap, oracle-friendly; callers
    * wanting the bytes use [[memberBytes]] in their own map). */
  final case class ShardMember(shard_id: Long, sample_key: String,
                               ext: String, member_name: String,
                               size_bytes: Long, byte_sum: Long)

  /** Explode (shard_id, payload) rows into one row per regular-file
    * member, partition-parallel — the scan step of a WebDataset-style
    * ingest. Grouping members into samples is then a plain groupBy on
    * (shard_id, sample_key): no shuffle is needed to ASSEMBLE a sample
    * when downstream work is per-sample, because a shard's members
    * arrive in one partition (collect_list within the same task). */
  def explodeMembers(spark: SparkSession, shards: DataFrame): Dataset[ShardMember] = {
    import spark.implicits._
    shards
      .where(col("payload").isNotNull)
      .select(col("shard_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        (for {
          bs <- unwrap(bytes).toSeq
          es <- entriesOf(bs).toSeq
          e <- es if e.typeflag == '0'
        } yield {
          var sum = 0L
          var i = e.offset.toInt
          val end = (e.offset + e.size).toInt
          while (i < end) { sum += bs(i) & 0xff; i += 1 }
          val (key, ext) = splitKey(e.name)
          ShardMember(id, key, ext, e.name, e.size, sum)
        }).iterator
      })
  }

  /** WebDataset SAMPLE assembly — the consumer contract of the format:
    * members sharing a basename key ARE one training sample (000017.jpg +
    * 000017.txt + 000017.json), so the usable row is per (shard, key)
    * with the per-extension member facts pivoted to columns and a
    * completeness flag for the extensions the recipe requires. One
    * groupBy on (shard_id, sample_key); a shard's members arrive in one
    * partition, so assembly is map-side-combined. Missing-extension
    * sizes/sums read 0 with the `<ext>_n` count 0 — `complete` = every
    * required extension present exactly once. */
  def samples(spark: SparkSession, shards: DataFrame,
              exts: Seq[String]): DataFrame = {
    require(exts.nonEmpty, "samples() needs at least one required extension")
    val m = explodeMembers(spark, shards).toDF()
    val aggs = exts.flatMap { e =>
      Seq(
        coalesce(sum(when(col("ext") === e, col("size_bytes"))), lit(0L))
          .as(s"${e}_size"),
        coalesce(sum(when(col("ext") === e, col("byte_sum"))), lit(0L))
          .as(s"${e}_sum"),
        count(when(col("ext") === e, lit(1))).as(s"${e}_n"))
    }
    m.groupBy("shard_id", "sample_key")
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("complete",
        exts.map(e => col(s"${e}_n") === 1L).reduce(_ && _).cast("long"))
  }

  /** Slice one member's bytes out of a (possibly gzipped) shard. */
  def memberBytes(shard: Array[Byte], e: TarEntry): Option[Array[Byte]] =
    unwrap(shard).flatMap { p =>
      if (e.offset < 0 || e.size < 0 || e.offset + e.size > p.length) None
      else Some(java.util.Arrays.copyOfRange(
        p, e.offset.toInt, (e.offset + e.size).toInt))
    }

  // ---- fixture encoder ------------------------------------------------

  /** Append one ustar member (header with correct checksum + data +
    * 512-byte padding) to an open archive stream. Member names must fit
    * the 100-byte base field (WebDataset keys do by convention; no PAX
    * extension here). */
  def writeMember(out: java.io.OutputStream, name: String,
                  data: Array[Byte]): Unit = {
    require(name.length <= 100, "member names must fit the ustar base field")
    val h = new Array[Byte](512)
    val nb = name.getBytes("US-ASCII")
    System.arraycopy(nb, 0, h, 0, nb.length)
    def oct(v: Long, off: Int, len: Int): Unit = {
      val s = java.lang.Long.toOctalString(v)
      val padded = ("0" * (len - 1 - s.length)) + s
      val b = padded.getBytes("US-ASCII")
      System.arraycopy(b, 0, h, off, b.length) // NUL terminator stays
    }
    oct(420 /*0644*/, 100, 8) // mode 0644
    oct(0, 108, 8); oct(0, 116, 8) // uid/gid
    oct(data.length.toLong, 124, 12)
    oct(0, 136, 12) // mtime
    h(156) = '0' // regular file
    val magic = Array[Byte]('u', 's', 't', 'a', 'r', 0, '0', '0')
    System.arraycopy(magic, 0, h, 257, 8)
    // checksum with the field as spaces, then store
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    var sum = 0L
    for (i <- 0 until 512) sum += h(i) & 0xff
    val cs = java.lang.Long.toOctalString(sum)
    val csPad = ("0" * (6 - cs.length)) + cs
    System.arraycopy(csPad.getBytes("US-ASCII"), 0, h, 148, 6)
    h(154) = 0; h(155) = ' '
    out.write(h, 0, 512)
    out.write(data, 0, data.length)
    val pad = (512 - data.length % 512) % 512
    out.write(new Array[Byte](pad), 0, pad)
  }

  /** Close an archive stream: the two-zero-block terminator. */
  def writeTerminator(out: java.io.OutputStream): Unit =
    out.write(new Array[Byte](1024), 0, 1024)

  /** Write a real ustar archive (correct checksums, 512-byte padding,
    * two-zero-block terminator). */
  def encodeTar(members: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    for ((name, data) <- members) writeMember(out, name, data)
    writeTerminator(out)
    out.toByteArray
  }

  /** DISTRIBUTED WebDataset/tar shard publishing — the write side of the
    * M1 tar reader, completing the publish story for every container
    * family that has one (Arrow m24, TFRecord m27, tar m28): rows
    * carrying (member name, member bytes) hash to shards, each shard's
    * members stream one at a time through the ustar member writer in
    * deterministic `orderCols` order into ONE (optionally whole-file
    * gzipped) archive payload. One exchange on the shard key with a
    * partition-LOCAL sort; per-task memory is the assembled payloads of
    * the shards routed to that task — size output shards ~ shuffle
    * partitions (one per task, the production setting) and it stays
    * O(one shard). */
  def writeShards(spark: SparkSession, df: DataFrame, shardCol: String,
                  nameCol: String, bytesCol: String, orderCols: Seq[String],
                  gzip: Boolean = false): DataFrame = {
    import spark.implicits._
    val cols = col(shardCol).cast("long").as("__shard") +:
      col(nameCol).as("__name") +: col(bytesCol).as("__bytes") +:
      orderCols.map(col)
    df.select(cols: _*)
      .repartition(col("__shard"))
      .sortWithinPartitions(col("__shard") +: orderCols.map(col): _*)
      .select(col("__shard"), col("__name"), col("__bytes"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        val done = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Byte])]
        var cur = Long.MinValue
        var bos: java.io.ByteArrayOutputStream = null
        var out: java.io.OutputStream = null
        def close(): Unit = if (out != null) {
          writeTerminator(out)
          out match {
            case g: java.util.zip.GZIPOutputStream => g.finish(); g.close()
            case _ => ()
          }
          done += ((cur, bos.toByteArray))
          out = null; bos = null
        }
        it.foreach { case (sid, name, bytes) =>
          if (out == null || sid != cur) {
            close()
            cur = sid
            bos = new java.io.ByteArrayOutputStream()
            out = if (gzip) new java.util.zip.GZIPOutputStream(bos) else bos
          }
          writeMember(out, name, bytes)
        }
        close()
        done.iterator
      }
      .toDF("shard_id", "payload")
  }

  /** Gzip a shard (one member stream, as tar.gz shards ship). */
  def gzip(p: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(p); g.close()
    bos.toByteArray
  }
}
