package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import Mp4Tables.{Mp4Sample, TrackFixture}

class Mp4TablesSpec extends AnyFunSuite {

  private def fixture(n: Int = 11, spc: Int = 4): Array[Byte] =
    Mp4Tables.encodeMp4WithSamples(Seq(TrackFixture(
      trackId = 7, timescale = 600,
      sttsRuns = Seq((5, 100), (n - 5, 250)),
      sizes = (0 until n).map(k => 100 + k * 13),
      samplesPerChunk = spc,
      syncSamples = Some(1 to n by 3))))

  test("single track: dts/size/offset/sync reconstructed exactly") {
    val n = 11
    val samples = Mp4Tables.sampleTable(fixture(n)).get
    assert(samples.length == n)
    // independent recomputation
    var dts = 0L
    var off = 24L
    for (k <- 0 until n) {
      val s = samples(k)
      assert(s.trackId == 7 && s.sampleIdx == k)
      assert(s.dtsTicks == dts, s"dts sample $k")
      assert(s.dtsMs == dts * 1000 / 600)
      assert(s.sizeBytes == 100 + k * 13)
      assert(s.fileOffset == off, s"offset sample $k")
      assert(s.isSync == (k % 3 == 0), s"sync sample $k")
      dts += (if (k < 5) 100 else 250)
      off += 100 + k * 13
    }
  }

  test("chunking does not change offsets when layout is contiguous") {
    // same samples, different samples-per-chunk: stsc/stco differ but the
    // reconstructed absolute offsets must be identical
    val a = Mp4Tables.sampleTable(fixture(11, spc = 4)).get.map(_.fileOffset)
    val b = Mp4Tables.sampleTable(fixture(11, spc = 1)).get.map(_.fileOffset)
    val c = Mp4Tables.sampleTable(fixture(11, spc = 11)).get.map(_.fileOffset)
    assert(a == b && b == c)
  }

  test("two tracks: ids, interleaved mdat layout, per-track tables") {
    val t1 = TrackFixture(1, 600, Seq((4, 100)), Seq(10, 20, 30, 40), 2,
      syncSamples = None)
    val t2 = TrackFixture(2, 90000, Seq((2, 3000)), Seq(500, 600), 2,
      syncSamples = Some(Seq(1)))
    val samples = Mp4Tables.sampleTable(
      Mp4Tables.encodeMp4WithSamples(Seq(t1, t2))).get
    val s1 = samples.filter(_.trackId == 1)
    val s2 = samples.filter(_.trackId == 2)
    assert(s1.length == 4 && s2.length == 2)
    assert(s1.map(_.fileOffset) == Vector(24L, 34L, 54L, 84L))
    // track 2's chunks start after track 1's 100 bytes
    assert(s2.map(_.fileOffset) == Vector(124L, 624L))
    assert(s2.map(_.dtsMs) == Vector(0L, 3000L * 1000 / 90000))
    assert(s1.forall(_.isSync)) // no stss => every sample sync
    assert(s2.map(_.isSync) == Vector(true, false))
  }

  test("fixed-size stsz path (sample_size != 0)") {
    val bytes = Mp4Tables.encodeMp4WithSamples(Seq(TrackFixture(
      1, 600, Seq((6, 100)), Seq.fill(6)(300), 3, None)))
    // patch stsz's sample_size field: box start + 8 (verflags) + 4
    val at = indexOfTag(bytes, "stsz")
    bytes(at + 12) = 0; bytes(at + 13) = 0
    bytes(at + 14) = 1; bytes(at + 15) = 44 // 0x012c = 300
    val samples = Mp4Tables.sampleTable(bytes).get
    assert(samples.length == 6)
    assert(samples.forall(_.sizeBytes == 300))
    assert(samples.map(_.fileOffset) == Vector.tabulate(6)(k => 24L + 300L * k))
  }

  test("co64 64-bit chunk offsets decode") {
    // hand-build a minimal one-track container with co64 instead of stco
    def be32(v: Long): Array[Byte] = Array(
      (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def be64(v: Long): Array[Byte] = be32(v >> 32) ++ be32(v & 0xffffffffL)
    def box(name: String, payload: Array[Byte]): Array[Byte] =
      be32(8 + payload.length) ++ name.getBytes("US-ASCII") ++ payload
    val stts = box("stts", be32(0) ++ be32(1) ++ be32(2) ++ be32(100))
    val stsz = box("stsz", be32(0) ++ be32(0) ++ be32(2) ++ be32(7) ++ be32(9))
    val stsc = box("stsc", be32(0) ++ be32(1) ++ be32(1) ++ be32(2) ++ be32(1))
    val co64 = box("co64", be32(0) ++ be32(1) ++ be64(0x1_0000_0000L))
    val stbl = box("stbl", stts ++ stsc ++ stsz ++ co64)
    val mdhd = box("mdhd", be32(0) ++ be32(1) ++ be32(2) ++ be32(600) ++
      be32(0) ++ be32(0))
    val tkhd = box("tkhd", be32(0) ++ be32(1) ++ be32(2) ++ be32(3) ++
      be32(0) ++ be32(0))
    val trak = box("trak", tkhd ++ box("mdia", mdhd ++ box("minf", stbl)))
    val bytes = box("ftyp", "isomiso2".getBytes("US-ASCII")) ++ box("moov", trak)
    val samples = Mp4Tables.sampleTable(bytes).get
    assert(samples.map(_.fileOffset) ==
      Vector(0x1_0000_0000L, 0x1_0000_0000L + 7))
  }

  test("malformed tables reject cleanly: None, never a throw") {
    val good = fixture()
    // stts covering fewer samples than stsz: first run count 5 -> 4
    // (field layout: box+8 verflags, +12 entry_count, +16 run count)
    val stts = indexOfTag(good, "stts")
    val fewer = good.clone(); fewer(stts + 19) = 4
    assert(Mp4Tables.sampleTable(fewer).isEmpty)
    // stsc first_chunk != 1 (+16 first_chunk)
    val stsc = indexOfTag(good, "stsc")
    val badChunk = good.clone(); badChunk(stsc + 19) = 2
    assert(Mp4Tables.sampleTable(badChunk).isEmpty)
    // stss sample number out of range (+16 first sample number)
    val stss = indexOfTag(good, "stss")
    val badSync = good.clone(); badSync(stss + 19) = 99.toByte
    assert(Mp4Tables.sampleTable(badSync).isEmpty)
    // stsz claims a giant sample count (allocation guard)
    val stsz = indexOfTag(good, "stsz")
    val giant = good.clone()
    giant(stsz + 16) = 0x7f.toByte; giant(stsz + 17) = -1; giant(stsz + 18) = -1
    assert(Mp4Tables.sampleTable(giant).isEmpty)
    // every truncation of a valid payload: None or fewer tracks, no throw
    for (len <- 0 until good.length) {
      Mp4Tables.sampleTable(good.take(len)) // must not throw
    }
  }

  test("stsd fourcc surfaces as codec; absent stsd reads unknown") {
    // old-style fixture (no stsd): every sample's codec is "unknown"
    assert(Mp4Tables.sampleTable(fixture()).get.forall(_.codec == "unknown"))
    // payload track with a "jpeg" stsd: fourcc threaded through
    val frames = (0 until 5).map(k => Array.fill(30 + k)((k * 7).toByte))
    val mp4 = Mp4Tables.encodeMp4WithSamples(Seq(Mp4Tables.payloadTrack(
      trackId = 3, timescale = 1000, delta = 40, samplesPerChunk = 2,
      fourcc = "jpeg", payloads = frames)))
    val samples = Mp4Tables.sampleTable(mp4).get
    assert(samples.length == 5)
    assert(samples.forall(_.codec == "jpeg"))
    // and the mdat REALLY carries the payload bytes at each offset
    for (s <- samples) {
      val got = mp4.slice(s.fileOffset.toInt, (s.fileOffset + s.sizeBytes).toInt)
      assert(got.sameElements(frames(s.sampleIdx)),
        s"sample ${s.sampleIdx} bytes")
    }
  }

  test("payload sizes must match declared sizes") {
    intercept[IllegalArgumentException] {
      Mp4Tables.encodeMp4WithSamples(Seq(TrackFixture(
        trackId = 1, timescale = 600, sttsRuns = Seq((2, 10)),
        sizes = Seq(4, 4), samplesPerChunk = 1, syncSamples = None,
        fourcc = Some("jpeg"),
        payloads = Some(Seq(Array[Byte](1, 2, 3, 4), Array[Byte](1))))))
    }
  }

  test("non-mp4 and header-only payloads yield None or empty") {
    assert(Mp4Tables.sampleTable("not an mp4 at all".getBytes).isEmpty)
    assert(Mp4Tables.sampleTable(null).isEmpty)
    // header-only fixture from the m05 gate has no stbl: tracks skipped
    val headerOnly = Multimodal.encodeMp4Header(160, 90, 600, 1200)
    assert(Mp4Tables.sampleTable(headerOnly).contains(Vector.empty[Mp4Sample]))
  }

  private def indexOfTag(p: Array[Byte], tag: String): Int = {
    val t = tag.getBytes("US-ASCII")
    val i = p.indices.indexWhere(i => i + 4 <= p.length &&
      p(i) == t(0) && p(i + 1) == t(1) && p(i + 2) == t(2) && p(i + 3) == t(3))
    assert(i >= 0, s"tag $tag not found")
    i - 4 // return box start (size field)
  }
}
