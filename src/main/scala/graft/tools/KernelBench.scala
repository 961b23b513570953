package graft.tools

import org.apache.spark.unsafe.types.UTF8String

import graft.functions.TextFunctions

/** Microbenchmark of the text-hash kernels against naive per-position
  * reference loops — the r14 evidence that the rolling-hash and
  * duplicate-shingle-skip rewrites speed up the kernel itself (at sf0.1 the
  * corpus is a few MB, so per-QUERY walls are box-noise-dominated; the
  * kernel is the per-byte CPU that dominates the signature pass at corpus
  * scale). Both forms run on identical deterministic pseudo-text and their
  * outputs are asserted equal, so the timing comparison cannot drift from
  * a correctness bug.
  *
  * Usage: runMain graft.tools.KernelBench [megabytes]
  * Diagnostic main; no Spark session, not part of the library surface.
  */
object KernelBench {
  private val P = TextFunctions.HashMod
  private val A = TextFunctions.MinhashA.toArray
  private val B = TextFunctions.MinhashB.toArray
  private val K = A.length

  /** Naive per-position polynomial hash — the pre-r14 formulation. */
  private def naiveGramHashes(s: String, n: Int): Array[Long] = {
    val last = s.length - n
    val hs = new Array[Long](math.max(0, last + 1))
    var i = 0
    while (i <= last) {
      var acc = 0L
      var j = i
      val end = i + n
      while (j < end) { acc = (acc * 31L + s.charAt(j)) % P; j += 1 }
      hs(i) = acc
      i += 1
    }
    hs
  }

  /** Naive minhash: every position (duplicates included) pays the K-loop. */
  private def naiveMinhashSig(s: String, n: Int): Array[Long] = {
    val mins = Array.fill(K)(Long.MaxValue)
    val hs = naiveGramHashes(s, n)
    var i = 0
    while (i < hs.length) {
      val h = hs(i)
      var j = 0
      while (j < K) {
        val v = (A(j) * h + B(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    if (hs.isEmpty) java.util.Arrays.fill(mins, 0L)
    mins
  }

  /** Deterministic word-like pseudo-text: Zipf-ish vocabulary so the
    * 3-gram duplicate rate resembles natural text. */
  private def makeText(chars: Int): String = {
    val vocab = (0 until 4096).map { i =>
      val len = 2 + (i % 9)
      val sb = new StringBuilder
      var x = i * 2654435761L + 12345
      (0 until len).foreach { _ =>
        sb.append(('a' + math.floorMod(x, 26)).toChar); x = x * 6364136223846793005L + 1442695040888963407L
      }
      sb.toString
    }
    val sb = new StringBuilder(chars + 16)
    var x = 42L
    while (sb.length < chars) {
      x = x * 6364136223846793005L + 1442695040888963407L
      // Zipf-ish: bias toward the head of the vocabulary
      val r = math.floorMod(x >>> 16, 4096 * 64)
      val idx = if (r < 4096 * 48) math.floorMod(r, 256).toInt
                else math.floorMod(r, 4096).toInt
      sb.append(vocab(idx)).append(' ')
    }
    sb.toString
  }

  private def time[T](reps: Int)(f: => T): (Double, T) = {
    var out: T = f // warm-up
    val t0 = System.nanoTime()
    var i = 0
    while (i < reps) { out = f; i += 1 }
    ((System.nanoTime() - t0) / 1e9 / reps, out)
  }

  def main(args: Array[String]): Unit = {
    val mb = if (args.nonEmpty) args(0).toInt else 8
    // many medium docs, not one giant string: matches the corpus shape
    val docs = (0 until mb * 4).map(_ => makeText(256 * 1024)).toArray
    val docsU = docs.map(UTF8String.fromString)
    val totalMb = docs.map(_.length).sum / 1e6

    def mbps(sec: Double) = f"${totalMb / sec}%9.1f MB/s"

    // minhash signature: kernel (rolling + seen-set skip) vs naive
    val (tMinK, outMinK) = time(3)(docsU.map(u =>
      graft.expressions.TextHashKernels.minhashSig(u, 3).toLongArray()))
    val (tMinN, outMinN) = time(1)(docs.map(s => naiveMinhashSig(s, 3)))
    require(outMinK.zip(outMinN).forall { case (a, b) => a.sameElements(b) },
      "minhashSig kernel != naive reference")
    println(s"minhash_sig   kernel ${mbps(tMinK)}   naive ${mbps(tMinN)}   " +
      f"speedup ${tMinN / tMinK}%5.1fx")

    // char-gram hashes at the exact-substring n=30: rolling vs naive
    val (tCgK, outCgK) = time(3)(docsU.map(u =>
      graft.expressions.TextHashKernels.charGramHashes(u, 30).toLongArray()))
    val (tCgN, outCgN) = time(1)(docs.map(s => naiveGramHashes(s, 30)))
    require(outCgK.zip(outCgN).forall { case (a, b) => a.sameElements(b) },
      "charGramHashes kernel != naive reference")
    println(s"char_gram_30  kernel ${mbps(tCgK)}   naive ${mbps(tCgN)}   " +
      f"speedup ${tCgN / tCgK}%5.1fx")

    // shingle hash set (rolling feed into sort+dedup)
    val (tShK, _) = time(3)(docsU.map(u =>
      graft.expressions.TextHashKernels.shingleHashSet(u, 3).toLongArray()))
    println(s"shingle_set   kernel ${mbps(tShK)}")
  }
}
