package graft.operators

/** Ogg container walk (RFC 3533) with Opus (RFC 7845) and Vorbis
  * identification-header parsing — the header-level metadata step for the
  * other half of the speech-corpus world (Common Voice, LibriVox and kin
  * ship Ogg Opus/Vorbis). Like the MP4/MP3 sniffs, this never touches
  * codec packets: it walks REAL page structure (capture pattern, lacing,
  * per-page CRC-32 in Ogg's reflection-free variant), reads the BOS
  * identification packet for codec/channels/rate, and derives duration
  * from the terminal granule position — `(granule - preskip) / 48 kHz`
  * for Opus, `granule / rate` for Vorbis, per their mapping specs.
  *
  * Pages failing CRC or structure → None, never a throw; Opus/Vorbis
  * sample DECODE needs transform machinery deliberately out of scope
  * (the honest-stub boundary documented in [[Multimodal]]).
  */
object OggSniff {

  /** Ogg CRC-32: poly 0x04C11DB7, init 0, no reflection, no final xor. */
  private val CrcTable: Array[Int] = Array.tabulate(256) { b =>
    var c = b << 24
    for (_ <- 0 until 8) c = if ((c & 0x80000000) != 0) (c << 1) ^ 0x04c11db7
                             else c << 1
    c
  }
  private[operators] def oggCrc(p: Array[Byte], from: Int, until: Int,
                                zeroAt: Int = -1): Int = {
    var c = 0
    var i = from
    while (i < until) {
      val b = if (zeroAt >= 0 && i >= zeroAt && i < zeroAt + 4) 0
              else p(i) & 0xff
      c = (c << 8) ^ CrcTable(((c >>> 24) ^ b) & 0xff)
      i += 1
    }
    c
  }

  /** Parsed Ogg audio facts. `sampleRate` is the codec's declared input
    * rate; `durationMs` follows each codec's granule mapping. */
  final case class OggAudio(format: String, channels: Int, sampleRate: Int,
                            durationMs: Long)

  def sniffOgg(p: Array[Byte]): Option[OggAudio] = {
    if (p == null || p.length < 28) return None
    try sniffImpl(p) catch {
      case _: ArrayIndexOutOfBoundsException => None
    }
  }

  private def sniffImpl(p: Array[Byte]): Option[OggAudio] = {
    def le16(i: Int) = (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)
    def le32(i: Int) = (p(i) & 0xff).toLong | ((p(i + 1) & 0xff).toLong << 8) |
      ((p(i + 2) & 0xff).toLong << 16) | ((p(i + 3) & 0xff).toLong << 24)
    def le64(i: Int) = le32(i) | (le32(i + 4) << 32)

    var at = 0
    var format: String = null
    var channels = 0
    var rate = 0
    var preskip = 0
    var serial = -1L
    var lastGranule = -1L
    var sawEos = false

    while (at + 27 <= p.length && !sawEos) {
      if (p(at) != 'O' || p(at + 1) != 'g' || p(at + 2) != 'g' ||
          p(at + 3) != 'S') return None
      if (p(at + 4) != 0) return None // stream structure version
      val htype = p(at + 5) & 0xff
      val granule = le64(at + 6)
      val pageSerial = le32(at + 14)
      val crc = le32(at + 22).toInt
      val nSegs = p(at + 26) & 0xff
      if (at + 27 + nSegs > p.length) return None
      var payload = 0
      var s = 0
      while (s < nSegs) { payload += p(at + 27 + s) & 0xff; s += 1 }
      val pageEnd = at + 27 + nSegs + payload
      if (pageEnd > p.length) return None
      if (oggCrc(p, at, pageEnd, zeroAt = at + 22) != crc) return None

      if ((htype & 0x02) != 0 && format == null) { // BOS: identification
        val body = at + 27 + nSegs
        if (payload >= 19 && p(body) == 'O' && p(body + 1) == 'p' &&
            p(body + 2) == 'u' && p(body + 3) == 's' &&
            p(body + 4) == 'H' && p(body + 5) == 'e' &&
            p(body + 6) == 'a' && p(body + 7) == 'd') {
          format = "opus"
          channels = p(body + 9) & 0xff
          preskip = le16(body + 10)
          rate = le32(body + 12).toInt
          serial = pageSerial
        } else if (payload >= 30 && (p(body) & 0xff) == 0x01 &&
            p(body + 1) == 'v' && p(body + 2) == 'o' &&
            p(body + 3) == 'r' && p(body + 4) == 'b' &&
            p(body + 5) == 'i' && p(body + 6) == 's') {
          format = "vorbis"
          channels = p(body + 11) & 0xff
          rate = le32(body + 12).toInt
          serial = pageSerial
        } else return None // other codecs: not this sniffer's mapping
      }
      if (pageSerial == serial && granule >= 0) lastGranule = granule
      if (pageSerial == serial && (htype & 0x04) != 0) sawEos = true
      at = pageEnd
    }
    if (format == null || channels <= 0 || lastGranule < 0) return None
    val durationMs = format match {
      case "opus" => // granules are 48 kHz regardless of input rate
        val g = lastGranule - preskip
        if (g < 0 || g > Long.MaxValue / 1000L) return None
        g * 1000L / 48000L
      case _ =>
        if (rate <= 0 || lastGranule > Long.MaxValue / 1000L) return None
        lastGranule * 1000L / rate
    }
    Some(OggAudio(format, channels, rate, durationMs))
  }

  // ---- fixture encoder ------------------------------------------------

  /** Write one Ogg page: correct lacing, CRC, flags. */
  private[operators] def page(serial: Long, seq: Int, granule: Long,
                              htype: Int, packet: Array[Byte]): Array[Byte] = {
    val nFull = packet.length / 255
    val rem = packet.length % 255
    val lacing = Array.fill(nFull)(255.toByte) :+ rem.toByte
    val header = new Array[Byte](27 + lacing.length)
    header(0) = 'O'; header(1) = 'g'; header(2) = 'g'; header(3) = 'S'
    header(4) = 0
    header(5) = htype.toByte
    for (i <- 0 until 8) header(6 + i) = ((granule >> (8 * i)) & 0xff).toByte
    for (i <- 0 until 4) header(14 + i) = ((serial >> (8 * i)) & 0xff).toByte
    for (i <- 0 until 4) header(18 + i) = ((seq >> (8 * i)) & 0xff).toByte
    header(26) = lacing.length.toByte
    System.arraycopy(lacing, 0, header, 27, lacing.length)
    val full = header ++ packet
    val crc = oggCrc(full, 0, full.length)
    for (i <- 0 until 4) full(22 + i) = ((crc >> (8 * i)) & 0xff).toByte
    full
  }

  /** A structurally real Ogg Opus stream: BOS OpusHead, OpusTags page,
    * then `dataPages` audio pages of opaque bytes, final page EOS with
    * the given terminal granule. */
  def encodeOggOpus(channels: Int, preskip: Int, inputRate: Int,
                    finalGranule: Long, dataPages: Int = 2,
                    serial: Long = 0x01020304L): Array[Byte] = {
    require(dataPages >= 1)
    val head = java.nio.ByteBuffer.allocate(19)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    head.put("OpusHead".getBytes("US-ASCII")).put(1.toByte)
      .put(channels.toByte).putShort(preskip.toShort).putInt(inputRate)
      .putShort(0.toShort).put(0.toByte)
    val tags = "OpusTags".getBytes("US-ASCII") ++
      Array[Byte](7, 0, 0, 0) ++ "graftor".getBytes ++ Array[Byte](0, 0, 0, 0)
    val out = new java.io.ByteArrayOutputStream()
    val p0 = page(serial, 0, 0, 0x02, head.array())
    out.write(p0, 0, p0.length)
    val p1 = page(serial, 1, 0, 0x00, tags); out.write(p1, 0, p1.length)
    for (d <- 0 until dataPages) {
      val isLast = d == dataPages - 1
      val g = if (isLast) finalGranule else finalGranule * (d + 1) / dataPages
      val body = Array.tabulate(40 + d)(i => (i * 7 + d).toByte)
      val pg = page(serial, 2 + d, g, if (isLast) 0x04 else 0x00, body)
      out.write(pg, 0, pg.length)
    }
    out.toByteArray
  }

  /** A structurally real Ogg Vorbis stream (identification header +
    * data pages). */
  def encodeOggVorbis(channels: Int, rate: Int, finalGranule: Long,
                      dataPages: Int = 2,
                      serial: Long = 0x0a0b0c0dL): Array[Byte] = {
    require(dataPages >= 1)
    val ident = java.nio.ByteBuffer.allocate(30)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    ident.put(1.toByte).put("vorbis".getBytes("US-ASCII"))
      .putInt(0).put(channels.toByte).putInt(rate)
      .putInt(0).putInt(0).putInt(0).put(0xb8.toByte).put(1.toByte)
    val out = new java.io.ByteArrayOutputStream()
    val p0 = page(serial, 0, 0, 0x02, ident.array())
    out.write(p0, 0, p0.length)
    for (d <- 0 until dataPages) {
      val isLast = d == dataPages - 1
      val g = if (isLast) finalGranule else finalGranule * (d + 1) / dataPages
      val body = Array.tabulate(33 + d)(i => (i * 11 + d).toByte)
      val pg = page(serial, 1 + d, g, if (isLast) 0x04 else 0x00, body)
      out.write(pg, 0, pg.length)
    }
    out.toByteArray
  }
}
