package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Seeded-random property sweeps over the codec/container family —
  * round-trip exactness across the whole parameter lattice, not just the
  * hand-picked spec cases. Lossless formats admit no tolerance: any
  * mismatch anywhere in (channels x bps x subframe plan x wasted bits x
  * partition order x block geometry) is a bug. */
class CodecPropertySpec extends AnyFunSuite {

  test("FLAC: 60 random parameter combinations round-trip bit-exactly") {
    val rnd = new scala.util.Random(0xf1ac)
    for (trial <- 0 until 60) {
      val channels = 1 + rnd.nextInt(2)
      val bps = Seq(8, 12, 16, 20, 24)(rnd.nextInt(5))
      val blockSize = Seq(192, 192, 256, 576)(rnd.nextInt(4))
      val frames = 1 + rnd.nextInt(3)
      val n = blockSize * frames
      val lim = 1 << (bps - 2)
      val wasted = if (rnd.nextInt(4) == 0) 1 + rnd.nextInt(3) else 0
      val po = if (rnd.nextInt(3) == 0) 1 + rnd.nextInt(2) else 0
      val midSide = channels == 2 && rnd.nextBoolean()
      val plan = rnd.nextInt(4) match {
        case 0 => FlacCodec.PlanFixed(rnd.nextInt(5))
        case 1 => FlacCodec.PlanVerbatim
        case 2 => FlacCodec.PlanLpc(Array(2, -1), 1, 3)
        case _ => FlacCodec.PlanAuto
      }
      val samples = Array.tabulate(n * channels) { _ =>
        val v = rnd.nextInt(2 * lim) - lim
        (v >> wasted) << wasted // wasted-bit-compatible when requested
      }
      val p = FlacCodec.encode(16000, bps, channels, samples, blockSize,
        plan, midSide, wasted, po)
      val pcm = FlacCodec.decode(p).getOrElse(
        fail(s"trial $trial (ch=$channels bps=$bps bs=$blockSize " +
          s"w=$wasted po=$po ms=$midSide $plan) decoded None"))
      assert(pcm.samples.length == samples.length, s"trial $trial length")
      for (i <- samples.indices)
        assert(pcm.samples(i) == samples(i),
          s"trial $trial sample $i (ch=$channels bps=$bps bs=$blockSize " +
            s"w=$wasted po=$po ms=$midSide $plan)")
    }
  }

  test("tar: 40 random member sets round-trip, gzipped and plain") {
    val rnd = new scala.util.Random(0x7a7)
    for (trial <- 0 until 40) {
      val k = 1 + rnd.nextInt(6)
      val members = (0 until k).map { j =>
        val dir = if (rnd.nextBoolean()) s"d$j/" else ""
        val ext = Seq(".jpg", ".txt", ".seg.json", "")(rnd.nextInt(4))
        val name = s"${dir}m${trial}_$j$ext"
        val data = Array.fill(rnd.nextInt(2000))(rnd.nextInt(256).toByte)
        (name, data)
      }
      val tar = TarShard.encodeTar(members)
      val payload = if (rnd.nextBoolean()) TarShard.gzip(tar) else tar
      val es = TarShard.entries(payload).getOrElse(fail(s"trial $trial: None"))
      assert(es.map(_.name) == members.map(_._1).toVector, s"trial $trial")
      for ((e, (_, data)) <- es.zip(members))
        assert(TarShard.memberBytes(payload, e).get.sameElements(data),
          s"trial $trial ${e.name}")
    }
  }

  test("zip: 40 random member sets round-trip with CRC verification") {
    val rnd = new scala.util.Random(0x21b)
    for (trial <- 0 until 40) {
      val k = 1 + rnd.nextInt(6)
      val members = (0 until k).map { j =>
        val name = s"m${trial}_$j.${if (rnd.nextBoolean()) "bin" else "txt"}"
        // mix incompressible noise and compressible runs
        val data =
          if (rnd.nextBoolean()) Array.fill(rnd.nextInt(2000))(rnd.nextInt(256).toByte)
          else Array.fill(rnd.nextInt(2000))((trial % 7).toByte)
        (name, data, rnd.nextBoolean())
      }
      val zip = ZipShard.encodeZip(members)
      val es = ZipShard.entries(zip).getOrElse(fail(s"trial $trial: None"))
      assert(es.map(_.name) == members.map(_._1).toVector, s"trial $trial")
      for ((e, (_, data, _)) <- es.zip(members))
        assert(ZipShard.memberBytes(zip, e).get.sameElements(data),
          s"trial $trial ${e.name}")
    }
  }

  test("BPE: token concatenation always reconstructs the word; counts " +
       "are monotone in the merge budget") {
    val rnd = new scala.util.Random(0xb9e)
    for (trial <- 0 until 30) {
      val alphabet = "abcd"
      val words = (0 until 6).map(_ =>
        (1 to 2 + rnd.nextInt(6)).map(_ => alphabet(rnd.nextInt(4))).mkString)
      val counts = words.distinct.map(w => (w, (1 + rnd.nextInt(9)).toLong))
      val allMerges = BpeTokenizer.learnFromCounts(counts, 12)
      var prevTotal = Long.MaxValue
      for (k <- 0 to allMerges.length) {
        val ranks = allMerges.take(k).map(m => ((m.left, m.right), m.rank)).toMap
        var total = 0L
        for ((w, c) <- counts) {
          val toks = BpeTokenizer.encodeWord(w, ranks)
          assert(toks.mkString == w, s"trial $trial '$w' under $k merges")
          total += toks.length * c
        }
        assert(total <= prevTotal,
          s"trial $trial: token count rose at merge budget $k")
        prevTotal = total
      }
      // a single repeated word collapses to one token with enough merges
      val solo = BpeTokenizer.learnFromCounts(Seq((words.head, 5L)), 32)
      val soloRanks = solo.map(m => ((m.left, m.right), m.rank)).toMap
      assert(BpeTokenizer.encodeWord(words.head, soloRanks).length == 1,
        s"trial $trial '${words.head}' did not collapse")
    }
  }

  test("12-bit JPEG: random coefficient mosaics agree with the direct " +
       "O(n^4) IDCT at every pixel") {
    val rnd = new scala.util.Random(0x12b17)
    def directIdct(coef: Array[Int]): Array[Int] = {
      def cc(u: Int) = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
      Array.tabulate(64) { i =>
        val x = i % 8; val y = i / 8
        var s = 0.0
        for (v <- 0 until 8; u <- 0 until 8)
          s += 0.25 * cc(u) * cc(v) * coef(v * 8 + u) *
            math.cos((2 * x + 1) * u * math.Pi / 16.0) *
            math.cos((2 * y + 1) * v * math.Pi / 16.0)
        val px = math.round(s + 2048.0).toInt
        if (px < 0) 0 else if (px > 4095) 4095 else px
      }
    }
    for (trial <- 0 until 12) {
      val wB = 1 + rnd.nextInt(3)
      val hB = 1 + rnd.nextInt(3)
      val blocks = Array.fill(wB * hB) {
        val c = new Array[Int](64)
        // sparse spectra with 12-bit-scale magnitudes
        for (_ <- 0 until 1 + rnd.nextInt(8))
          c(rnd.nextInt(64)) = rnd.nextInt(16000) - 8000
        c
      }
      val p = Jpeg12.encode12GrayCoefBlocks(wB, hB, (bx, by) => blocks(by * wB + bx))
      val img = Jpeg12.decode(p).getOrElse(fail(s"trial $trial: None"))
      for (by <- 0 until hB; bx <- 0 until wB) {
        val want = directIdct(blocks(by * wB + bx))
        for (y <- 0 until 8; x <- 0 until 8)
          assert(img.samples((by * 8 + y) * (wB * 8) + bx * 8 + x) ==
            want(y * 8 + x), s"trial $trial block($bx,$by) px($x,$y)")
      }
    }
  }
}
