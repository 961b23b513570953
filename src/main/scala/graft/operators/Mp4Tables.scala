package graft.operators

/** ISO-BMFF (MP4) sample-table walk: reconstruct the per-sample layout —
  * decode timestamps (stts), sizes (stsz), file offsets (stsc + stco) and
  * sync flags (stss) — without touching any codec data. This is the real
  * plumbing behind video frame-sampling at corpus scale: a pipeline that
  * wants "one keyframe every N seconds" needs exactly (dts, offset, size,
  * is_sync) per sample to issue ranged reads, and nothing else from the
  * container. The reference ingests video files as opaque binary
  * (`dlt_sources/m365/__init__.py:22-62`); this walk upgrades those
  * payloads to a queryable per-sample relation (see
  * [[Multimodal.explodeVideoSamples]] and the m08 gate) while the codec
  * payload itself stays honestly untouched.
  *
  * Layout references: ISO/IEC 14496-12 §8.6.1 (stts), §8.7.3 (stsz),
  * §8.7.4 (stsc), §8.7.5 (stco/co64), §8.6.2 (stss). All public spec.
  *
  * Robustness stance matches the other codecs: every count is validated
  * against its box's actual byte length, offsets are Long, a crafted
  * sample count beyond [[MaxSamples]] is rejected (allocation guard), and
  * anything inconsistent returns None — never a task-killing throw.
  */
object Mp4Tables {

  /** Allocation guard: a crafted stsz/stts count can claim 2^31 samples
    * in a 100-byte file; cap at ~4M samples per payload (a 2 h movie at
    * 60 fps is ~430k). */
  final val MaxSamples = 1 << 22

  /** One media sample's layout facts. `dtsTicks` is in the track's mdhd
    * timescale; `dtsMs` is pre-divided for convenience. `codec` is the
    * track's first stsd sample-entry fourcc ("jpeg" for photo-JPEG/MJPEG,
    * "avc1", …), or "unknown" when the track carries no readable stsd —
    * older fixtures and stripped containers stay walkable. */
  final case class Mp4Sample(trackId: Int, sampleIdx: Int, dtsTicks: Long,
                             dtsMs: Long, sizeBytes: Long, fileOffset: Long,
                             isSync: Boolean, codec: String = "unknown")

  /** Walk every trak's sample table. Returns None if the container is
    * malformed or any table is internally inconsistent (counts disagree,
    * chunk map doesn't cover the samples, offsets overflow). Tracks
    * without a complete stbl (e.g. empty header-only fixtures) are
    * skipped, not fatal; an mp4 with no decodable track yields an empty
    * Vector, still Some. */
  def sampleTable(p: Array[Byte]): Option[Vector[Mp4Sample]] =
    try sampleTableImpl(p) catch {
      // truncated box payloads may read past the buffer despite the size
      // checks (declared size > actual bytes): None, never a throw
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }

  private def sampleTableImpl(p: Array[Byte]): Option[Vector[Mp4Sample]] = {
    if (p == null || p.length < 16) return None
    def u8(i: Long): Int = p(i.toInt) & 0xff
    def be32(i: Long): Long = (u8(i).toLong << 24) | (u8(i + 1) << 16) |
      (u8(i + 2) << 8) | u8(i + 3)
    def be64(i: Long): Long = (be32(i) << 32) | be32(i + 4)
    def tag(i: Long, s: String): Boolean =
      (0 until 4).forall(k => u8(i + k) == s.charAt(k))

    // First box named `name` at one nesting level within [from, to).
    def findBox(from: Long, to: Long, name: String): Option[(Long, Long)] = {
      var i = from
      while (i + 8 <= to) {
        val sz32 = be32(i)
        val (header, size) =
          if (sz32 == 1) { if (i + 16 > to) return None; (16L, be64(i + 8)) }
          else (8L, sz32)
        if (size < header || i + size > to) return None
        if (tag(i + 4, name)) return Some((i + header, i + size))
        i += size
      }
      None
    }

    if (!tag(4, "ftyp")) return None
    val end = p.length.toLong
    val (moovAt, moovEnd) = findBox(0, end, "moov").getOrElse(return None)

    val out = Vector.newBuilder[Mp4Sample]
    var trakFrom = moovAt
    var guard = 0
    while (guard < 64) {
      findBox(trakFrom, moovEnd, "trak") match {
        case None => guard = 64
        case Some((trakAt, trakEnd)) =>
          walkTrak(p, trakAt, trakEnd) match {
            case TrakMalformed => return None
            case TrakSkipped => // header-only track: fine
            case TrakSamples(samples) => out ++= samples
          }
          trakFrom = trakEnd
      }
      guard += 1
    }
    Some(out.result())
  }

  private sealed trait TrakResult
  private case object TrakMalformed extends TrakResult
  private case object TrakSkipped extends TrakResult
  private final case class TrakSamples(samples: Vector[Mp4Sample]) extends TrakResult

  private def walkTrak(p: Array[Byte], trakAt: Long, trakEnd: Long): TrakResult = {
    def u8(i: Long): Int = p(i.toInt) & 0xff
    def be32(i: Long): Long = (u8(i).toLong << 24) | (u8(i + 1) << 16) |
      (u8(i + 2) << 8) | u8(i + 3)
    def be64(i: Long): Long = (be32(i) << 32) | be32(i + 4)
    def tag(i: Long, s: String): Boolean =
      (0 until 4).forall(k => u8(i + k) == s.charAt(k))
    def findBox(from: Long, to: Long, name: String): Option[(Long, Long)] = {
      var i = from
      while (i + 8 <= to) {
        val sz32 = be32(i)
        val (header, size) =
          if (sz32 == 1) { if (i + 16 > to) return None; (16L, be64(i + 8)) }
          else (8L, sz32)
        if (size < header || i + size > to) return None
        if (tag(i + 4, name)) return Some((i + header, i + size))
        i += size
      }
      None
    }

    val (tkhdAt, _) = findBox(trakAt, trakEnd, "tkhd").getOrElse(return TrakSkipped)
    val tv = u8(tkhdAt)
    // v0: ver/flags(4) creation(4) modification(4) track_id(4);
    // v1: 64-bit creation/modification push track_id to offset 20.
    val trackId = be32(tkhdAt + (if (tv == 1) 20L else 12L)).toInt
    val (mdiaAt, mdiaEnd) = findBox(trakAt, trakEnd, "mdia").getOrElse(return TrakSkipped)
    val (mdhdAt, _) = findBox(mdiaAt, mdiaEnd, "mdhd").getOrElse(return TrakSkipped)
    val mv = u8(mdhdAt)
    val timescale = be32(mdhdAt + (if (mv == 1) 20L else 12L))
    if (timescale <= 0) return TrakMalformed
    val (minfAt, minfEnd) = findBox(mdiaAt, mdiaEnd, "minf").getOrElse(return TrakSkipped)
    val (stblAt, stblEnd) = findBox(minfAt, minfEnd, "stbl").getOrElse(return TrakSkipped)

    // A full-box payload (we only accept version 0 tables — the only
    // version defined for stts/stsc/stsz/stss; co64 handled separately).
    def fullBox(name: String): Option[(Long, Long)] =
      findBox(stblAt, stblEnd, name).flatMap { case (at, boxEnd) =>
        if (boxEnd - at < 4 || u8(at) != 0) None else Some((at + 4, boxEnd))
      }

    val sttsOpt = fullBox("stts")
    val stszOpt = fullBox("stsz")
    val stscOpt = fullBox("stsc")
    val stcoOpt = fullBox("stco")
    val co64Opt = fullBox("co64")
    // Header-only/incomplete stbl → skip the track (no samples to report).
    if (sttsOpt.isEmpty && stszOpt.isEmpty) return TrakSkipped
    val (sttsAt, sttsEnd) = sttsOpt.getOrElse(return TrakMalformed)
    val (stszAt, stszEnd) = stszOpt.getOrElse(return TrakMalformed)
    val (stscAt, stscEnd) = stscOpt.getOrElse(return TrakMalformed)
    val (chunkAt, chunkEnd, chunk64) =
      co64Opt.map { case (a, e) => (a, e, true) }
        .orElse(stcoOpt.map { case (a, e) => (a, e, false) })
        .getOrElse(return TrakMalformed)

    // ---- stsz: per-sample sizes ----
    if (stszEnd - stszAt < 8) return TrakMalformed
    val fixedSize = be32(stszAt)
    val sampleCount0 = be32(stszAt + 4)
    if (sampleCount0 < 0 || sampleCount0 > MaxSamples) return TrakMalformed
    val n = sampleCount0.toInt
    if (fixedSize == 0 && stszEnd - stszAt - 8 < 4L * n) return TrakMalformed
    val sizes = new Array[Long](n)
    var k = 0
    while (k < n) {
      sizes(k) = if (fixedSize != 0) fixedSize else be32(stszAt + 8 + 4L * k)
      if (sizes(k) < 0) return TrakMalformed
      k += 1
    }

    // ---- stts: decode deltas, expanded to cumulative dts ----
    if (sttsEnd - sttsAt < 4) return TrakMalformed
    val sttsEntries = be32(sttsAt)
    if (sttsEntries < 0 || sttsEnd - sttsAt - 4 < 8L * sttsEntries)
      return TrakMalformed
    val dts = new Array[Long](n)
    var at = sttsAt + 4
    var sample = 0
    var t = 0L
    var e = 0L
    while (e < sttsEntries) {
      val count = be32(at)
      val delta = be32(at + 4)
      if (count < 0 || delta < 0) return TrakMalformed
      var c = 0L
      while (c < count) {
        if (sample >= n) return TrakMalformed // stts covers more than stsz
        dts(sample) = t
        t += delta
        sample += 1
        c += 1
      }
      at += 8
      e += 1
    }
    if (sample != n) return TrakMalformed // stts covers fewer than stsz

    // ---- stsc + stco/co64: per-sample file offsets ----
    if (stscEnd - stscAt < 4) return TrakMalformed
    val stscEntries = be32(stscAt).toInt
    if (stscEntries < 0 || stscEnd - stscAt - 4 < 12L * stscEntries)
      return TrakMalformed
    if (chunkEnd - chunkAt < 4) return TrakMalformed
    val chunkCount = be32(chunkAt).toInt
    val entryW = if (chunk64) 8L else 4L
    if (chunkCount < 0 || chunkEnd - chunkAt - 4 < entryW * chunkCount)
      return TrakMalformed
    def chunkOffset(c: Int): Long =
      if (chunk64) be64(chunkAt + 4 + 8L * c) else be32(chunkAt + 4 + 4L * c)

    val offsets = new Array[Long](n)
    var s = 0
    var entry = 0
    var chunk = 1 // 1-indexed per spec
    while (s < n) {
      if (entry >= stscEntries) return TrakMalformed
      val eAt = stscAt + 4 + 12L * entry
      val firstChunk = be32(eAt).toInt
      val perChunk = be32(eAt + 4).toInt
      // entry i covers chunks [firstChunk_i, firstChunk_{i+1}); entered
      // with `chunk` == this entry's first chunk in a well-formed table
      if (firstChunk != chunk) return TrakMalformed
      if (perChunk <= 0) return TrakMalformed
      val nextFirst =
        if (entry + 1 < stscEntries) be32(stscAt + 4 + 12L * (entry + 1)).toInt
        else Int.MaxValue
      if (nextFirst <= firstChunk) return TrakMalformed
      // chunks [chunk, nextFirst) carry perChunk samples each
      while (chunk < nextFirst && s < n) {
        if (chunk > chunkCount) return TrakMalformed
        var off = chunkOffset(chunk - 1)
        var inChunk = 0
        while (inChunk < perChunk && s < n) {
          offsets(s) = off
          off += sizes(s)
          if (off < 0) return TrakMalformed // overflow
          s += 1
          inChunk += 1
        }
        chunk += 1
      }
      entry += 1
    }

    // ---- stss: sync samples (absent box => every sample is sync) ----
    val sync: Array[Boolean] = fullBox("stss") match {
      case None =>
        findBox(stblAt, stblEnd, "stss") match {
          case Some(_) => return TrakMalformed // present but bad version/short
          case None => Array.fill(n)(true)
        }
      case Some((ssAt, ssEnd)) =>
        if (ssEnd - ssAt < 4) return TrakMalformed
        val cnt = be32(ssAt).toInt
        if (cnt < 0 || ssEnd - ssAt - 4 < 4L * cnt) return TrakMalformed
        val arr = Array.fill(n)(false)
        var i = 0
        while (i < cnt) {
          val num = be32(ssAt + 4 + 4L * i) // 1-indexed sample number
          if (num < 1 || num > n) return TrakMalformed
          arr(num.toInt - 1) = true
          i += 1
        }
        arr
    }

    // ---- stsd: first sample-entry fourcc (lenient — absent or short
    // boxes read as "unknown" so stripped containers stay walkable) ----
    val codec: String = fullBox("stsd") match {
      case Some((sdAt, sdEnd)) if sdEnd - sdAt >= 12 && be32(sdAt) >= 1 =>
        // entry_count(4) then the first entry box: size(4) fourcc(4)
        val cs = (0 until 4).map(k => u8(sdAt + 8 + k).toChar).mkString
        if (cs.forall(c => c >= 0x20 && c < 0x7f)) cs else "unknown"
      case _ => "unknown"
    }

    val samples = Vector.tabulate(n) { i =>
      Mp4Sample(trackId, i, dts(i), dts(i) * 1000L / timescale, sizes(i),
        offsets(i), sync(i), codec)
    }
    TrakSamples(samples)
  }

  // ------------------------------------------------------------------
  // Fixture encoder (spec/gate side): a real ISO-BMFF layout with mdat
  // FIRST (ftyp; mdat; moov) so sample offsets start at a fixed 24 —
  // the classic non-faststart layout every muxer can emit.
  // ------------------------------------------------------------------

  /** Per-track fixture description: `sttsRuns` as (count, delta) pairs,
    * `sizes` per sample, `samplesPerChunk` fixed chunking, and 1-indexed
    * `syncSamples` (None = omit stss entirely → all sync). `fourcc`
    * (when set) writes a VisualSampleEntry-shaped stsd with that codec
    * tag; `payloads` (when set) must match `sizes` and places REAL
    * sample bytes in the mdat at each sample's laid-out offset — the
    * shape a ranged-read frame decoder consumes. */
  final case class TrackFixture(trackId: Int, timescale: Int,
                                sttsRuns: Seq[(Int, Int)], sizes: Seq[Int],
                                samplesPerChunk: Int,
                                syncSamples: Option[Seq[Int]],
                                fourcc: Option[String] = None,
                                payloads: Option[Seq[Array[Byte]]] = None)

  /** Convenience: a track whose sizes derive from real sample payloads. */
  def payloadTrack(trackId: Int, timescale: Int, delta: Int,
                   samplesPerChunk: Int, fourcc: String,
                   payloads: Seq[Array[Byte]]): TrackFixture =
    TrackFixture(trackId, timescale, Seq((payloads.length, delta)),
      payloads.map(_.length), samplesPerChunk, None, Some(fourcc),
      Some(payloads))

  /** Encode a playable-shaped container around the given tracks: ftyp(16)
    * + mdat(zeros sized to all samples, chunks laid out contiguously in
    * track order) + moov(trak*). Chunk offsets in stco are absolute file
    * offsets, mdat payload starting at byte 24. */
  def encodeMp4WithSamples(tracks: Seq[TrackFixture]): Array[Byte] = {
    def be32(v: Long): Array[Byte] = Array(
      (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def box(name: String, payload: Array[Byte]): Array[Byte] =
      be32(8 + payload.length) ++ name.getBytes("US-ASCII") ++ payload

    val mdatPayload = tracks.map(_.sizes.map(_.toLong).sum).sum
    require(mdatPayload <= Int.MaxValue - 1024, "fixture too large")
    var fileOff = 24L // ftyp(16) + mdat header(8)
    val mdatBytes = new Array[Byte](mdatPayload.toInt)

    val traks = tracks.map { tr =>
      val n = tr.sizes.length
      require(tr.sttsRuns.map(_._1).sum == n, "stts runs must cover sizes")
      tr.payloads.foreach { ps =>
        require(ps.length == n && ps.zip(tr.sizes).forall {
          case (p, sz) => p.length == sz
        }, "payloads must match sizes")
      }
      val stts = box("stts", be32(0) ++ be32(tr.sttsRuns.length) ++
        tr.sttsRuns.flatMap { case (c, d) => be32(c) ++ be32(d) }.toArray)
      val stsz = box("stsz", be32(0) ++ be32(0) ++ be32(n) ++
        tr.sizes.flatMap(sz => be32(sz)).toArray)
      val nChunks = (n + tr.samplesPerChunk - 1) / tr.samplesPerChunk
      val stsc = box("stsc", be32(0) ++ be32(1) ++
        be32(1) ++ be32(tr.samplesPerChunk) ++ be32(1))
      val chunkOffs = new Array[Long](nChunks)
      var s = 0
      var c = 0
      while (c < nChunks) {
        chunkOffs(c) = fileOff
        var i = 0
        while (i < tr.samplesPerChunk && s < n) {
          tr.payloads.foreach { ps =>
            System.arraycopy(ps(s), 0, mdatBytes, (fileOff - 24L).toInt,
              tr.sizes(s))
          }
          fileOff += tr.sizes(s); s += 1; i += 1
        }
        c += 1
      }
      val stco = box("stco", be32(0) ++ be32(nChunks) ++
        chunkOffs.flatMap(be32))
      val stss = tr.syncSamples.map(ss =>
        box("stss", be32(0) ++ be32(ss.length) ++
          ss.flatMap(v => be32(v)).toArray))
      // stsd: a VisualSampleEntry-shaped first entry (78-byte body after
      // the fourcc header: reserved(6) + data_ref_idx(2) + the fixed
      // visual fields zeroed) — enough structure for any fourcc reader
      val stsd = tr.fourcc.map { fc =>
        require(fc.length == 4, "fourcc must be 4 chars")
        val entry = box(fc, new Array[Byte](78))
        box("stsd", be32(0) ++ be32(1) ++ entry)
      }
      val stbl = box("stbl",
        stsd.getOrElse(Array.emptyByteArray) ++
          stts ++ stsc ++ stsz ++ stco ++ stss.getOrElse(Array.emptyByteArray))
      val mdhd = box("mdhd", be32(0) ++ be32(1) ++ be32(2) ++
        be32(tr.timescale) ++ be32(0) ++ be32(0))
      val minf = box("minf", stbl)
      val mdia = box("mdia", mdhd ++ minf)
      val tkhd = box("tkhd", be32(0) ++ be32(1) ++ be32(2) ++
        be32(tr.trackId) ++ be32(0) ++ be32(0))
      box("trak", tkhd ++ mdia)
    }

    val ftyp = box("ftyp", "isomiso2".getBytes("US-ASCII"))
    val mdat = box("mdat", mdatBytes)
    val moov = box("moov", traks.flatten.toArray)
    ftyp ++ mdat ++ moov
  }
}
