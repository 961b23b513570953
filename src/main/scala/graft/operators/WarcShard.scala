package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (ISO 28500) shard reading — the container format OF web-scale
  * pretraining data: Common Crawl ships WARC/1.0 `*.warc.gz` files where
  * every record is its own gzip member and records are framed by a
  * header block plus `Content-Length`. A crawl-curation pipeline's first
  * step is exactly this walk: records out of shard bytes, HTTP payloads
  * out of response records, distributed per partition.
  *
  * What is REAL here (the machinery under test):
  *  - a manual gzip MEMBER walk (`java.util.zip.Inflater` nowrap): header
  *    flags (FEXTRA/FNAME/FCOMMENT/FHCRC) parsed, every member's CRC-32
  *    and ISIZE trailer verified before its bytes may contribute — the
  *    multi-member structure `GZIPInputStream` would silently flatten;
  *  - WARC record framing: version line, CRLF header block,
  *    `Content-Length`-bounded block, mandatory CRLF CRLF separator;
  *  - HTTP response parsing for `WARC-Type: response` records: status
  *    line + CRLFCRLF header/body split, so the emitted body is the
  *    actual document payload a text pipeline feeds downstream.
  *
  * Failure stance (the codec-family contract): malformed shard → no
  * rows, never a task-killing throw. A CRC-corrupt member, a bad version
  * line, a short block or a missing separator rejects the WHOLE shard —
  * WARC has no trailing structure to resync on safely (a damaged
  * Content-Length desynchronizes every later record). Decompression is
  * allocation-guarded; a tiny gzip bomb cannot claim gigabytes. A
  * response record whose HTTP prelude is malformed keeps its record row
  * (the WARC layer framed it correctly) with a null status and the whole
  * block as body.
  */
object WarcShard {

  /** Guard on decompressed shard bytes. */
  final val MaxShardBytes: Int = 1 << 26 // 64 MiB

  /** One parsed record: `http_status`/HTTP split only for response
    * records whose payload parses; otherwise the block IS the body. */
  final case class WarcRecord(shard_id: Long, rec_idx: Long,
                              warc_type: String,
                              target_uri: Option[String],
                              content_length: Long,
                              http_status: Option[Long],
                              body_len: Long, body_sum: Long)

  // ---- gzip member walk ----------------------------------------------

  /** Split concatenated gzip members, inflating each with its own
    * CRC-32/ISIZE verification. Input without the gzip magic passes
    * through as a single pseudo-member (plain `.warc`). None on any
    * corruption or when the total inflated size exceeds the guard. */
  def gunzipMembers(p: Array[Byte]): Option[Vector[Array[Byte]]] = {
    if (p == null || p.length == 0) return None
    if (p.length < 2 || (p(0) & 0xff) != 0x1f || (p(1) & 0xff) != 0x8b)
      return Some(Vector(p))
    val out = Vector.newBuilder[Array[Byte]]
    var at = 0
    var total = 0L
    while (at < p.length) {
      // -- member header
      if (at + 10 > p.length) return None
      if ((p(at) & 0xff) != 0x1f || (p(at + 1) & 0xff) != 0x8b) return None
      if ((p(at + 2) & 0xff) != 8) return None // DEFLATE only
      val flg = p(at + 3) & 0xff
      var h = at + 10
      if ((flg & 4) != 0) { // FEXTRA
        if (h + 2 > p.length) return None
        val xlen = (p(h) & 0xff) | ((p(h + 1) & 0xff) << 8)
        h += 2 + xlen
      }
      def skipZString(from: Int): Int = {
        var i = from
        while (i < p.length && p(i) != 0) i += 1
        if (i >= p.length) -1 else i + 1
      }
      if ((flg & 8) != 0) { h = skipZString(h); if (h < 0) return None }
      if ((flg & 16) != 0) { h = skipZString(h); if (h < 0) return None }
      if ((flg & 2) != 0) h += 2 // FHCRC over the header: length skip
      if (h > p.length) return None
      // -- deflate body
      val inf = new java.util.zip.Inflater(true)
      try {
        inf.setInput(p, h, p.length - h)
        val bos = new java.io.ByteArrayOutputStream()
        val crc = new java.util.zip.CRC32()
        val buf = new Array[Byte](8192)
        while (!inf.finished()) {
          val n =
            try inf.inflate(buf)
            catch { case _: java.util.zip.DataFormatException => return None }
          if (n == 0 && !inf.finished()) return None // truncated stream
          if (total + n > MaxShardBytes) return None
          total += n
          bos.write(buf, 0, n)
          crc.update(buf, 0, n)
        }
        val member = bos.toByteArray
        val trailerAt = h + inf.getBytesRead.toInt
        if (trailerAt + 8 > p.length) return None
        def le32(i: Int): Long =
          (p(i) & 0xffL) | ((p(i + 1) & 0xffL) << 8) |
            ((p(i + 2) & 0xffL) << 16) | ((p(i + 3) & 0xffL) << 24)
        if (le32(trailerAt) != crc.getValue) return None
        if (le32(trailerAt + 4) != (member.length & 0xffffffffL)) return None
        out += member
        at = trailerAt + 8
      } finally inf.end()
    }
    Some(out.result())
  }

  // ---- WARC record walk ----------------------------------------------

  private final case class RawRecord(warcType: String,
                                     targetUri: Option[String],
                                     contentLength: Long,
                                     blockAt: Int)

  /** Parse every record of an (uncompressed) WARC byte stream
    * sequentially. None on ANY framing damage. */
  private def records(p: Array[Byte]): Option[Vector[(RawRecord, Array[Byte])]] = {
    val out = Vector.newBuilder[(RawRecord, Array[Byte])]
    var at = 0
    def lineEnd(from: Int): Int = { // index of CR of the next CRLF
      var i = from
      while (i + 1 < p.length && !(p(i) == '\r' && p(i + 1) == '\n')) i += 1
      if (i + 1 >= p.length) -1 else i
    }
    while (at < p.length) {
      val ve = lineEnd(at)
      if (ve < 0) return None
      val version = new String(p, at, ve - at, "ISO-8859-1")
      if (version != "WARC/1.0" && version != "WARC/1.1") return None
      var i = ve + 2
      var warcType: String = null
      var uri: Option[String] = None
      var clen = -1L
      var headersDone = false
      while (!headersDone) {
        val he = lineEnd(i)
        if (he < 0) return None
        if (he == i) { headersDone = true; i += 2 } // empty line
        else {
          val line = new String(p, i, he - i, "ISO-8859-1")
          val colon = line.indexOf(':')
          if (colon <= 0) return None
          val name = line.substring(0, colon).trim
          val value = line.substring(colon + 1).trim
          name.toLowerCase match {
            case "warc-type" => warcType = value
            case "warc-target-uri" => uri = Some(value)
            case "content-length" =>
              clen = try value.toLong catch { case _: NumberFormatException => return None }
            case _ => ()
          }
          i = he + 2
        }
      }
      if (warcType == null || clen < 0) return None
      if (i + clen > p.length) return None
      val block = java.util.Arrays.copyOfRange(p, i, (i + clen).toInt)
      // mandatory two CRLFs after the block
      val sep = i + clen.toInt
      if (sep + 4 > p.length) return None
      if (!(p(sep) == '\r' && p(sep + 1) == '\n' &&
            p(sep + 2) == '\r' && p(sep + 3) == '\n')) return None
      out += ((RawRecord(warcType, uri, clen, i), block))
      at = sep + 4
    }
    Some(out.result())
  }

  /** Split an HTTP/1.x response payload into (status, body). None when
    * the prelude doesn't parse — caller falls back to block-as-body. */
  private[operators] def httpSplit(block: Array[Byte]): Option[(Long, Array[Byte])] = {
    var i = 0
    while (i + 3 < block.length &&
      !(block(i) == '\r' && block(i + 1) == '\n' &&
        block(i + 2) == '\r' && block(i + 3) == '\n')) i += 1
    if (i + 3 >= block.length) return None
    val head = new String(block, 0, i, "ISO-8859-1")
    val statusLine = head.takeWhile(_ != '\r')
    val parts = statusLine.split(" ", 3)
    if (parts.length < 2 || !parts(0).startsWith("HTTP/")) return None
    val status = try parts(1).toLong catch { case _: NumberFormatException => return None }
    Some((status, java.util.Arrays.copyOfRange(block, i + 4, block.length)))
  }

  /** All records of one shard, or empty on any damage. */
  def parseShard(shardId: Long, payload: Array[Byte]): Seq[WarcRecord] = {
    val parsed = for {
      members <- gunzipMembers(payload)
      all <- {
        // concatenate members, then walk records: correct for the
        // record-per-member convention AND for multi-record members
        val size = members.map(_.length.toLong).sum
        if (size > MaxShardBytes) None
        else {
          val buf = new java.io.ByteArrayOutputStream(size.toInt)
          members.foreach(m => buf.write(m, 0, m.length))
          records(buf.toByteArray)
        }
      }
    } yield all.zipWithIndex.map { case ((r, block), idx) =>
      val http = if (r.warcType == "response") httpSplit(block) else None
      val (status, body) = http match {
        case Some((s, b)) => (Some(s), b)
        case None => (None, block)
      }
      var sum = 0L
      var i = 0
      while (i < body.length) { sum += body(i) & 0xff; i += 1 }
      WarcRecord(shardId, idx.toLong, r.warcType, r.targetUri,
        r.contentLength, status, body.length.toLong, sum)
    }
    parsed.getOrElse(Vector.empty)
  }

  /** Explode (shard_id, payload) rows into one row per WARC record,
    * partition-parallel — the scan step of a crawl-curation ingest. */
  def explodeRecords(spark: SparkSession, shards: DataFrame): Dataset[WarcRecord] = {
    import spark.implicits._
    shards
      .where(col("payload").isNotNull)
      .select(col("shard_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) => parseShard(id, bytes) })
  }

  // ---- fixture encoders ----------------------------------------------

  private def crlfJoin(lines: Seq[String]): Array[Byte] =
    (lines.mkString("\r\n") + "\r\n\r\n").getBytes("ISO-8859-1")

  /** One WARC record (header block + body + separator), uncompressed. */
  def encodeRecord(warcType: String, targetUri: Option[String],
                   block: Array[Byte]): Array[Byte] = {
    val head = crlfJoin(
      Seq("WARC/1.0", s"WARC-Type: $warcType") ++
        targetUri.map(u => s"WARC-Target-URI: $u") ++
        Seq(s"WARC-Record-ID: <urn:uuid:${warcType.hashCode}>",
          s"Content-Length: ${block.length}"))
    val out = new java.io.ByteArrayOutputStream()
    out.write(head, 0, head.length)
    out.write(block, 0, block.length)
    out.write('\r'); out.write('\n'); out.write('\r'); out.write('\n')
    out.toByteArray
  }

  /** An HTTP/1.1 response payload with a fixed-shape prelude (17-byte
    * status line + Content-Type + blank = 45 bytes before the body, the
    * arithmetic the oracle states). */
  def encodeHttpResponse(status: Int, reason: String,
                         body: Array[Byte]): Array[Byte] = {
    val head = (s"HTTP/1.1 $status $reason\r\n" +
      "Content-Type: text/plain\r\n\r\n").getBytes("ISO-8859-1")
    val out = new java.io.ByteArrayOutputStream()
    out.write(head, 0, head.length)
    out.write(body, 0, body.length)
    out.toByteArray
  }

  /** warc.gz convention: every record its own gzip member, concatenated. */
  def encodeWarcGz(records: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    records.foreach { r =>
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(r); g.close()
      val m = bos.toByteArray
      out.write(m, 0, m.length)
    }
    out.toByteArray
  }
}
