package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class FlacCodecSpec extends AnyFunSuite {
  import FlacCodec._

  private def rt(sr: Int, bps: Int, nc: Int, samples: Array[Int],
                 blockSize: Int = 192, plan: SubframePlan = PlanAuto,
                 midSide: Boolean = false, wasted: Int = 0,
                 po: Int = 0): Unit = {
    val p = encode(sr, bps, nc, samples, blockSize, plan, midSide,
      wasted, po)
    val pcm = decode(p).getOrElse(fail("decode returned None"))
    assert(pcm.channels == nc && pcm.sampleRate == sr)
    assert(pcm.bitsPerSample == bps)
    assert(pcm.samples.length == samples.length)
    for (i <- samples.indices)
      assert(pcm.samples(i) == samples(i), s"sample $i")
  }

  private def wave(n: Int, f: Int => Int): Array[Int] = Array.tabulate(n)(f)

  test("CRC-8 and CRC-16 match bitwise long-division references") {
    // independent oracle: shift-register implementations, not the tables
    def crc8Ref(bytes: Array[Byte]): Int = {
      var c = 0
      for (b <- bytes; i <- 7 to 0 by -1) {
        val bit = ((c >> 7) & 1) ^ ((b >> i) & 1)
        c = ((c << 1) & 0xff) ^ (if (bit == 1) 0x07 else 0)
      }
      c
    }
    def crc16Ref(bytes: Array[Byte]): Int = {
      var c = 0
      for (b <- bytes; i <- 7 to 0 by -1) {
        val bit = ((c >> 15) & 1) ^ ((b >> i) & 1)
        c = ((c << 1) & 0xffff) ^ (if (bit == 1) 0x8005 else 0)
      }
      c
    }
    val rnd = new scala.util.Random(7)
    for (len <- Seq(0, 1, 5, 64, 300)) {
      val b = Array.fill(len)(rnd.nextInt(256).toByte)
      assert(crc8(b, 0, len) == crc8Ref(b))
      assert(crc16(b, 0, len) == crc16Ref(b))
    }
  }

  test("round trip: constant, fixed orders 0-4, verbatim, 16-bit mono") {
    val n = 192 * 3
    rt(16000, 16, 1, wave(n, _ => 577)) // constant (auto)
    for (order <- 0 to 4)
      rt(16000, 16, 1, wave(n, i => ((i * 37 + order) % 4001) - 2000),
        plan = PlanFixed(order))
    rt(16000, 16, 1, wave(n, i => (i * 7919) % 65536 - 32768),
      plan = PlanVerbatim)
  }

  test("round trip: LPC subframes with explicit quantized coefficients") {
    val n = 192 * 2
    // pred = (3*x[i-1] - x[i-2]) >> 1 over a slowly-varying signal
    rt(16000, 16, 1, wave(n, i => ((i * 13) % 3000) - 1500),
      plan = PlanLpc(Array(3, -1), shift = 1, precision = 4))
    // higher order, larger precision, noisy signal
    rt(44100, 16, 1, wave(n, i => ((i * i * 31 + i * 7) % 4096) - 2048),
      plan = PlanLpc(Array(120, -60, 20, -5), shift = 6, precision = 9))
  }

  test("round trip: every sample size and block geometry") {
    for ((bps, lim) <- Seq((8, 128), (12, 2048), (16, 32768),
                           (20, 1 << 19), (24, 1 << 23))) {
      rt(8000, bps, 1, wave(192, i => ((i * 997) % (2 * lim)) - lim))
    }
    // non-192 block sizes take the 8- and 16-bit end-of-header encodings
    rt(16000, 16, 1, wave(256 * 2, i => (i % 512) - 256), blockSize = 256)
    rt(16000, 16, 1, wave(576, i => (i % 512) - 256), blockSize = 576)
  }

  test("round trip: stereo independent and mid/side; odd/even sums") {
    val n = 192 * 2
    val inter = new Array[Int](n * 2)
    for (i <- 0 until n) {
      inter(2 * i) = ((i * 11) % 2048) - 1024
      inter(2 * i + 1) = ((i * 17 + 3) % 2048) - 1024
    }
    rt(16000, 16, 2, inter)
    rt(16000, 16, 2, inter, midSide = true)
    // mid/side with odd sums exercises the reconstructed low bit
    val odd = inter.clone()
    odd(1) = odd(0) + 3
    rt(16000, 16, 2, odd, midSide = true)
  }

  test("round trip: wasted bits and Rice partition orders") {
    val n = 192 * 2
    val shifted = wave(n, i => (((i * 37) % 1000) - 500) << 3)
    rt(16000, 16, 1, shifted, wasted = 3)
    rt(16000, 16, 1, wave(n, i => ((i * 37) % 1000) - 500),
      plan = PlanFixed(2), po = 3)
    rt(16000, 16, 1, shifted, plan = PlanLpc(Array(2, -1), 1, 3),
      wasted = 3, po = 2)
  }

  test("round trip: many frames, frame numbers past the 1-byte UTF-8 range") {
    val frames = 140 // frame numbers 0..139 > 0x7f: 2-byte coded numbers
    val n = 192 * frames
    rt(16000, 16, 1, wave(n, i => ((i * 13 + 5) % 512) - 256))
  }

  test("escape-coded (raw) residual partitions decode") {
    // hand-built single-frame stream: header via the real encoder path,
    // then patch is unneeded — build the frame manually with BitOut
    val blockSize = 192
    val res = Array.tabulate(blockSize)(i => ((i * 29) % 64) - 32)
    val si = new BitOut
    si.put(blockSize, 16); si.put(blockSize, 16); si.put(0, 24); si.put(0, 24)
    si.put(16000, 20); si.put(0, 3); si.put(15, 5); si.put(blockSize, 36)
    for (_ <- 0 until 16) si.put(0, 8)
    val head = Array[Byte]('f', 'L', 'a', 'C', 0x80.toByte, 0, 0, 34) ++ si.bytes
    val fb = new BitOut
    fb.put(0x3ffe, 14); fb.put(0, 1); fb.put(0, 1)
    fb.put(1, 4) // blocksize 192
    fb.put(5, 4) // 16 kHz
    fb.put(0, 4) // mono
    fb.put(4, 3) // 16-bit
    fb.put(0, 1)
    fb.put(0, 8) // frame number 0
    fb.alignZero()
    val hdr = fb.bytes
    val body = new BitOut
    body.put(0, 1); body.put(8, 6); body.put(0, 1) // FIXED order 0, no wasted
    body.put(0, 2) // 4-bit rice params
    body.put(1, 4) // partition order 1 -> two partitions of 96
    body.put(15, 4) // partition 1: ESCAPE
    body.put(7, 5)  //   raw 7-bit residuals
    for (i <- 0 until 96) body.put(res(i).toLong & 0x7f, 7)
    body.put(2, 4)  // partition 2: rice k=2
    for (i <- 96 until 192) {
      val u = (res(i).toLong << 1) ^ (res(i).toLong >> 63)
      body.put(0, (u >>> 2).toInt); body.put(1, 1)
      body.put(u & 3, 2)
    }
    body.alignZero()
    val frame = hdr ++ Array(FlacCodec.crc8(hdr, 0, hdr.length).toByte) ++
      body.bytes
    val c16 = crc16(frame, 0, frame.length)
    val p = head ++ frame ++ Array((c16 >> 8).toByte, c16.toByte)
    val pcm = decode(p).getOrElse(fail("escape stream decode returned None"))
    assert(pcm.samples.toSeq == res.toSeq)
  }

  test("CRC mismatches and malformed payloads reject cleanly") {
    val good = encode(16000, 16, 1, wave(192 * 2, i => (i % 512) - 256))
    assert(decode(good).isDefined)
    // flip one bit in checked regions: magic, first frame header (CRC-8
    // or sync), last frame tail (CRC-16)
    for (off <- Seq(0, 43, good.length - 3)) {
      val b = good.clone()
      b(off) = (b(off) ^ 0x40).toByte
      assert(decode(b).isEmpty, s"mutation at $off must fail a check")
    }
    assert(decode(null).isEmpty)
    assert(decode("not flac".getBytes).isEmpty)
    assert(decode(Array[Byte]('f', 'L', 'a', 'C')).isEmpty)
    // every truncation: None, never a throw
    for (len <- 0 until good.length) decode(good.take(len))
    // random single-byte mutations: never a throw (None or a decode —
    // CRCs catch nearly everything)
    val rnd = new scala.util.Random(3)
    for (_ <- 0 until 400) {
      val b = good.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      decode(b)
    }
  }

  test("sniffFlac reads STREAMINFO and skips other metadata blocks") {
    val p = encode(44100, 24, 2, Array.fill(192 * 2 * 2)(0))
    val (info, at) = sniffFlac(p).get
    assert(info.sampleRate == 44100 && info.channels == 2 &&
      info.bitsPerSample == 24 && info.totalSamples == 192 * 2)
    assert(info.durationMs == 192 * 2 * 1000L / 44100)
    assert(at == 4 + 4 + 34)
    // insert a PADDING block between STREAMINFO and frames
    val pad = Array[Byte](0x81.toByte, 0, 0, 4, 0, 0, 0, 0)
    val withPad = p.take(42) ++ pad ++ p.drop(42)
    // clear the last-block flag on STREAMINFO
    withPad(4) = (withPad(4) & 0x7f).toByte
    val (info2, at2) = sniffFlac(withPad).get
    assert(info2 == info && at2 == at + 8)
    assert(decode(withPad).exists(_.samples.length == 192 * 2 * 2))
  }

  test("allocation guards: giant totalSamples claims reject") {
    val p = encode(16000, 16, 1, wave(192, _ => 5))
    // STREAMINFO totalSamples lives in bytes 8+13..8+17 region; patch the
    // 36-bit field to a huge value via the known layout (bits 144..179 of
    // the 34-byte block starting at byte 8)
    val b = p.clone()
    // the 36-bit total field spans bits 108..143 of the block (after
    // 16+16+24+24+20+3+5 = 108 bits); bytes 14..17 are its low 32 bits
    for (i <- 14 to 17) b(8 + i) = 0xff.toByte
    assert(decode(b).isEmpty)
  }
}
