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
  * Content-Length desynchronizes every later record). A response record
  * whose HTTP prelude is malformed keeps its record row (the WARC layer
  * framed it correctly) with a null status and the whole block as body.
  *
  * Memory stance (the production-shard story): records STREAM through a
  * rolling buffer — each gzip member inflates in chunks, complete records
  * drain off the buffer's head as they frame, and nothing ever holds the
  * whole inflated shard. Memory is bounded by the largest single RECORD
  * (`maxRecordBytes`, default 64 MiB — parameterized, so a multi-GiB
  * Common Crawl shard of ordinary-sized records parses in O(record)
  * memory), and a gzip bomb meets the same per-record guard: bytes that
  * never frame a record within the guard reject the shard. Parsed row
  * STATS still buffer until the whole shard verifies, so a second guard
  * caps the per-shard record COUNT (`maxRecords`) — a bomb of millions
  * of tiny valid records rejects instead of accumulating rows.
  */
object WarcShard {

  /** Default guard on any SINGLE framed record (header block + body +
    * separator). NOT a whole-shard byte cap — total shard size is
    * unbounded. */
  final val MaxRecordBytes: Int = 1 << 26 // 64 MiB

  /** Default guard on the RECORD COUNT of one shard: the streaming walk
    * bounds byte memory by one record, but the parsed row STATS still
    * buffer until the whole shard verifies (damage anywhere must reject
    * everything) — a gzip bomb made of millions of tiny VALID records
    * would otherwise OOM through the row buffer. Real Common Crawl
    * shards hold tens of thousands of records; 1M is two orders of
    * magnitude of headroom. */
  final val MaxShardRecords: Int = 1 << 20

  /** One parsed record: `http_status`/HTTP split only for response
    * records whose payload parses; otherwise the block IS the body. */
  final case class WarcRecord(shard_id: Long, rec_idx: Long,
                              warc_type: String,
                              target_uri: Option[String],
                              content_length: Long,
                              http_status: Option[Long],
                              body_len: Long, body_sum: Long)

  // ---- streaming gzip member walk ------------------------------------

  /** Walk the concatenated gzip members of `p`, inflating in chunks pushed
    * to `sink` (sink returning false aborts the walk). Every member's
    * CRC-32 and ISIZE trailer is verified before `memberDone` may fire —
    * the multi-member structure `GZIPInputStream` would silently flatten.
    * Input without the gzip magic passes through as one pseudo-member
    * (plain `.warc`). Returns false on any corruption or abort. */
  private def gzipWalk(p: Array[Byte],
                       sink: (Array[Byte], Int, Int) => Boolean,
                       memberDone: () => Boolean): Boolean = {
    if (p.length < 2 || (p(0) & 0xff) != 0x1f || (p(1) & 0xff) != 0x8b) {
      // plain passthrough in bounded chunks, so the sink's size guards
      // interleave with buffer growth instead of facing one giant append
      // (a multi-GiB plain payload in a single append would overflow the
      // growth arithmetic before any guard could fire)
      var at0 = 0
      while (at0 < p.length) {
        val n = math.min(64 << 10, p.length - at0)
        if (!sink(p, at0, n)) return false
        at0 += n
      }
      return memberDone()
    }
    var at = 0
    while (at < p.length) {
      // -- member header
      if (at + 10 > p.length) return false
      if ((p(at) & 0xff) != 0x1f || (p(at + 1) & 0xff) != 0x8b) return false
      if ((p(at + 2) & 0xff) != 8) return false // DEFLATE only
      val flg = p(at + 3) & 0xff
      var h = at + 10
      if ((flg & 4) != 0) { // FEXTRA
        if (h + 2 > p.length) return false
        val xlen = (p(h) & 0xff) | ((p(h + 1) & 0xff) << 8)
        h += 2 + xlen
      }
      def skipZString(from: Int): Int = {
        var i = from
        while (i < p.length && p(i) != 0) i += 1
        if (i >= p.length) -1 else i + 1
      }
      if ((flg & 8) != 0) { h = skipZString(h); if (h < 0) return false }
      if ((flg & 16) != 0) { h = skipZString(h); if (h < 0) return false }
      if ((flg & 2) != 0) h += 2 // FHCRC over the header: length skip
      if (h > p.length) return false
      // -- deflate body, chunk by chunk
      val inf = new java.util.zip.Inflater(true)
      try {
        inf.setInput(p, h, p.length - h)
        val crc = new java.util.zip.CRC32()
        var isize = 0L
        val buf = new Array[Byte](64 << 10)
        while (!inf.finished()) {
          val n =
            try inf.inflate(buf)
            catch { case _: java.util.zip.DataFormatException => return false }
          if (n == 0 && !inf.finished()) return false // truncated stream
          if (n > 0) {
            crc.update(buf, 0, n)
            isize += n
            if (!sink(buf, 0, n)) return false
          }
        }
        val trailerAt = h + inf.getBytesRead.toInt
        if (trailerAt + 8 > p.length) return false
        def le32(i: Int): Long =
          (p(i) & 0xffL) | ((p(i + 1) & 0xffL) << 8) |
            ((p(i + 2) & 0xffL) << 16) | ((p(i + 3) & 0xffL) << 24)
        if (le32(trailerAt) != crc.getValue) return false
        if (le32(trailerAt + 4) != (isize & 0xffffffffL)) return false
        if (!memberDone()) return false
        at = trailerAt + 8
      } finally inf.end()
    }
    true
  }

  // ---- rolling buffer + incremental record framing --------------------

  /** Growable byte window with a consumed head — the O(largest record)
    * working set of the streaming walk. Compaction shifts the unconsumed
    * tail to the front before growing. */
  private final class RollingBuffer {
    private var buf = new Array[Byte](64 << 10)
    private var head = 0
    private var tail = 0
    def size: Int = tail - head
    def append(b: Array[Byte], off: Int, len: Int): Unit = {
      if (tail.toLong + len > buf.length) {
        // Long arithmetic: Int doubling/highestOneBit would overflow past
        // 2^30 and allocate an undersized target. Callers' guards keep
        // `need` far below Int range (maxRecordBytes is capped at 1 GiB
        // and appends arrive in <= 64 KiB chunks).
        val need = size.toLong + len
        val target =
          if (need <= buf.length) buf
          else new Array[Byte](
            math.min(math.max(buf.length.toLong * 2L, need * 2L),
              Int.MaxValue - 8L).toInt)
        System.arraycopy(buf, head, target, 0, size)
        tail -= head
        head = 0
        buf = target
      }
      System.arraycopy(b, off, buf, tail, len)
      tail += len
    }
    def apply(i: Int): Byte = buf(head + i)
    /** Relative index of the CR of the next CRLF at-or-after `from`; -1
      * when no complete CRLF is in the window. */
    def crlfAt(from: Int): Int = {
      var i = head + from
      while (i + 1 < tail && !(buf(i) == '\r' && buf(i + 1) == '\n')) i += 1
      if (i + 1 >= tail) -1 else i - head
    }
    def string(from: Int, len: Int): String =
      new String(buf, head + from, len, "ISO-8859-1")
    def bytes(from: Int, len: Int): Array[Byte] =
      java.util.Arrays.copyOfRange(buf, head + from, head + from + len)
    def drop(n: Int): Unit = {
      head += n
      if (head == tail) { head = 0; tail = 0 }
    }
  }

  private final val NeedMore = -1
  private final val Broken = -2

  /** Try to frame ONE record at the buffer head: returns the bytes
    * consumed (the row lands in `out`), [[NeedMore]] when the window holds
    * only a prefix, or [[Broken]] on framing damage / a record whose
    * framed size exceeds `maxRecordBytes`. */
  private def frameOne(rb: RollingBuffer, shardId: Long, recIdx: Long,
                       maxRecordBytes: Int,
                       emit: (String, Option[String], Long, Option[Long], Array[Byte]) => Unit): Int = {
    val ve = rb.crlfAt(0)
    if (ve < 0) return NeedMore
    val version = rb.string(0, ve)
    if (version != "WARC/1.0" && version != "WARC/1.1") return Broken
    var i = ve + 2
    var warcType: String = null
    var uri: Option[String] = None
    var clen = -1L
    var headersDone = false
    while (!headersDone) {
      val he = rb.crlfAt(i)
      if (he < 0) return NeedMore
      if (he == i) { headersDone = true; i += 2 } // empty line
      else {
        val line = rb.string(i, he - i)
        val colon = line.indexOf(':')
        if (colon <= 0) return Broken
        val name = line.substring(0, colon).trim
        val value = line.substring(colon + 1).trim
        name.toLowerCase(java.util.Locale.ROOT) match {
          case "warc-type" => warcType = value
          case "warc-target-uri" => uri = Some(value)
          case "content-length" =>
            clen = try value.toLong catch { case _: NumberFormatException => return Broken }
          case _ => ()
        }
        i = he + 2
      }
    }
    if (warcType == null || clen < 0) return Broken
    // Guard clen BEFORE any arithmetic: a crafted Content-Length near
    // Long.MaxValue would otherwise overflow `framed` negative, slip both
    // guards, and reach copyOfRange with a negative length — a
    // task-killing throw the no-throw contract forbids.
    if (clen > maxRecordBytes) return Broken
    val framed = i.toLong + clen + 4L // header + block + CRLF CRLF
    if (framed > maxRecordBytes) return Broken
    if (framed > rb.size) return NeedMore
    val sep = i + clen.toInt
    if (!(rb(sep) == '\r' && rb(sep + 1) == '\n' &&
          rb(sep + 2) == '\r' && rb(sep + 3) == '\n')) return Broken
    val block = rb.bytes(i, clen.toInt)
    val http = if (warcType == "response") httpSplit(block) else None
    val (status, body) = http match {
      case Some((s, b)) => (Some(s), b)
      case None => (None, block)
    }
    emit(warcType, uri, clen, status, body)
    framed.toInt
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

  /** All records of one shard, or empty on any damage. Streaming: memory
    * is bounded by the largest single record (`maxRecordBytes`), never the
    * shard — records drain off the rolling buffer as each gzip member
    * inflates, and the member/record structures need not align (the
    * record-per-member Common Crawl convention AND multi-record members
    * both walk correctly). Rows buffer until the WHOLE shard verifies
    * (rows are small stats; damage anywhere must reject everything). */
  /** The shared streaming walk: frames records off the gzip-member
    * stream, handing each (type, uri, clen, status, body) to `emit`.
    * True iff the WHOLE shard verifies (damage anywhere rejects all). */
  private def walkShard(shardId: Long, payload: Array[Byte],
                        maxRecordBytes: Int, maxRecords: Int,
                        emit: (String, Option[String], Long, Option[Long], Array[Byte]) => Unit): Boolean = {
    require(maxRecordBytes > 0 && maxRecordBytes <= (1 << 30),
      s"maxRecordBytes must be in (0, 1 GiB], got $maxRecordBytes")
    if (payload == null || payload.length == 0) return false
    val rb = new RollingBuffer
    var recIdx = 0L
    // Drain complete records off the buffer head; false on framing damage
    // or a shard exceeding the record-count guard.
    def drain(): Boolean = {
      var going = true
      while (going) {
        frameOne(rb, shardId, recIdx, maxRecordBytes, emit) match {
          case NeedMore => going = false
          case Broken => return false
          case consumed =>
            rb.drop(consumed)
            recIdx += 1
            if (recIdx > maxRecords) return false
        }
      }
      true
    }
    // Chunk sink: drain lazily (only past the guard) so the per-record
    // rescan cost amortizes to ~one framing pass per record; a window the
    // guard's size that still frames nothing IS the damage case (this is
    // what bounds a gzip bomb — bytes that never frame a record).
    def push(chunk: Array[Byte], off: Int, len: Int): Boolean = {
      rb.append(chunk, off, len)
      if (rb.size > maxRecordBytes) {
        if (!drain()) return false
        if (rb.size > maxRecordBytes) return false
      }
      true
    }
    gzipWalk(payload, push, () => drain()) &&
      drain() && rb.size == 0 // trailing partial record = truncation
  }

  def parseShard(shardId: Long, payload: Array[Byte],
                 maxRecordBytes: Int = MaxRecordBytes,
                 maxRecords: Int = MaxShardRecords): Seq[WarcRecord] = {
    val out = Vector.newBuilder[WarcRecord]
    var recIdx = 0L
    val ok = walkShard(shardId, payload, maxRecordBytes, maxRecords,
      (warcType, uri, clen, status, body) => {
        var sum = 0L
        var j = 0
        while (j < body.length) { sum += body(j) & 0xff; j += 1 }
        out += WarcRecord(shardId, recIdx, warcType, uri, clen, status,
          body.length.toLong, sum)
        recIdx += 1
      })
    if (ok) out.result() else Vector.empty
  }

  /** One body-carrying record row — the WET-extraction input (unlike the
    * stats rows of [[WarcRecord]], these carry the payload; the same
    * whole-shard-verifies contract applies). */
  final case class WarcBody(shard_id: Long, rec_idx: Long, warc_type: String,
                            target_uri: Option[String],
                            http_status: Option[Long], body: Array[Byte])

  /** All records of one shard WITH their bodies, or empty on damage. */
  def parseShardBodies(shardId: Long, payload: Array[Byte],
                       maxRecordBytes: Int = MaxRecordBytes,
                       maxRecords: Int = MaxShardRecords): Seq[WarcBody] = {
    val out = Vector.newBuilder[WarcBody]
    var recIdx = 0L
    val ok = walkShard(shardId, payload, maxRecordBytes, maxRecords,
      (warcType, uri, _, status, body) => {
        out += WarcBody(shardId, recIdx, warcType, uri, status, body)
        recIdx += 1
      })
    if (ok) out.result() else Vector.empty
  }

  /** Explode (shard_id, payload) rows into body-carrying records — the
    * front end of the WET pipeline (D64). */
  def explodeBodies(spark: SparkSession, shards: DataFrame,
                    maxRecordBytes: Int = MaxRecordBytes): Dataset[WarcBody] = {
    import spark.implicits._
    shards
      .where(col("payload").isNotNull)
      .select(col("shard_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        parseShardBodies(id, bytes, maxRecordBytes) })
  }

  /** Explode (shard_id, payload) rows into one row per WARC record,
    * partition-parallel — the scan step of a crawl-curation ingest.
    * `maxRecordBytes` is the per-record guard [[parseShard]] applies. */
  def explodeRecords(spark: SparkSession, shards: DataFrame,
                     maxRecordBytes: Int = MaxRecordBytes): Dataset[WarcRecord] = {
    import spark.implicits._
    shards
      .where(col("payload").isNotNull)
      .select(col("shard_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        parseShard(id, bytes, maxRecordBytes) })
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
