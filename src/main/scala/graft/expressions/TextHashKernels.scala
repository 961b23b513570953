package graft.expressions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.TextFunctions

/** JVM kernels behind the custom Catalyst expressions in
  * [[GraftExpressions]]. The arithmetic is EXACTLY the portable polynomial
  * hash of [[TextFunctions]] (fold `acc*31 + char` mod 1e9+7 over ASCII
  * chars), so results are reproducible by the DuckDB oracle and by the
  * higher-order-function formulations — these kernels exist because a tight
  * allocation-free JVM loop is ~1000x faster than interpreted HOF evaluation
  * on the 100 TB hot path.
  */
object TextHashKernels {
  final val P: Long = TextFunctions.HashMod
  private val A: Array[Long] = TextFunctions.MinhashA.toArray
  private val B: Array[Long] = TextFunctions.MinhashB.toArray
  final val K: Int = A.length

  /** Polynomial hash of s[from, from+len) — no allocation. */
  @inline private def hashRange(s: String, from: Int, len: Int): Long = {
    var acc = 0L
    var i = from
    val end = from + len
    while (i < end) { acc = (acc * 31L + s.charAt(i)) % P; i += 1 }
    acc
  }

  /** 31^(len-1) mod P — the drop coefficient of the rolling form below. */
  @inline private def pow31(len: Int): Long = {
    var r = 1L
    var i = 1
    while (i < len) { r = (r * 31L) % P; i += 1 }
    r
  }

  /** Rolling update: the hash of s[i+1, i+1+n) from the hash of s[i, i+n).
    * Identical arithmetic to [[hashRange]] (h = sum s[i+j]*31^(n-1-j) mod P,
    * all residues in [0, P)), evaluated in O(1) instead of O(n):
    * h' = (h - s[i]*31^(n-1)) * 31 + s[i+n] mod P. Overflow-safe:
    * s[i] < 2^16 and pw < P < 2^30 keep every intermediate under 2^47. */
  @inline private def rollHash(h: Long, dropped: Char, added: Char,
                               pw: Long): Long =
    (((h + P - (dropped * pw) % P) % P) * 31L + added) % P

  /** MinHash signature (K longs) over n-gram shingle hashes. Duplicate
    * shingles cannot change a minimum, so the K-permutation update runs
    * once per DISTINCT shingle hash: an open-addressing seen-set in front
    * of the update skips repeats (natural text repeats most of its char
    * 3-grams, so this cuts the dominant K-multiply loop by the duplicate
    * fraction), and the per-position hash itself is the O(1) rolling form.
    * Output is bit-identical to the process-every-position formulation —
    * mins are order- and multiplicity-free. */
  def minhashSig(text: UTF8String, n: Int): ArrayData = {
    val s = text.toString
    val mins = Array.fill(K)(Long.MaxValue)
    val last = s.length - n
    if (last < 0) {
      java.util.Arrays.fill(mins, 0L)
      return new GenericArrayData(mins)
    }
    // Seen-set: capacity 2-4x positions rounded to a power of two, bounded
    // at 2^22 entries (32 MB) for pathological documents; entries store h+1
    // so 0 marks empty (h in [0, P)). The skip is only ever an OPTIMIZATION
    // hint: a hash NOT in the table re-runs the K-loop (sound — redundant
    // work, identical mins), so once the fill bound is reached the table
    // simply stops admitting new entries and keeps serving lookups. A false
    // "seen" would be wrong, so probes compare exact stored values.
    val cap = math.min(1 << 22,
      math.max(8, java.lang.Integer.highestOneBit(last + 1) << 2))
    val seen = new Array[Long](cap)
    val mask = cap - 1
    val maxFill = cap >> 1
    var fill = 0
    val pw = pow31(n)
    var h = hashRange(s, 0, n)
    var i = 0
    while (i <= last) {
      var idx = ((h * -7046029254386353131L) >>> 40).toInt & mask
      var isDup = false
      var probing = true
      while (probing) {
        val e = seen(idx)
        if (e == 0L) {
          if (fill < maxFill) { seen(idx) = h + 1; fill += 1 }
          probing = false
        }
        else if (e == h + 1) { isDup = true; probing = false }
        else idx = (idx + 1) & mask
      }
      if (!isDup) {
        var j = 0
        while (j < K) {
          val v = (A(j) * h + B(j)) % P
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      if (i < last) h = rollHash(h, s.charAt(i), s.charAt(i + n), pw)
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Sorted distinct n-gram shingle hashes (the doc's shingle set, hashed).
    * Near-dup verification compares these sets; two distinct shingles
    * colliding mod P (~1e-4 per doc pair) is an accepted approximation, and
    * the oracle computes the identical quantity. */
  def shingleHashSet(text: UTF8String, n: Int): ArrayData = {
    val s = text.toString
    val last = s.length - n
    if (last < 0) return new GenericArrayData(Array.emptyLongArray)
    val hs = allGramHashes(s, n, last)
    java.util.Arrays.sort(hs)
    // in-place dedup of the sorted array
    var w = 1
    var i = 1
    while (i <= last) {
      if (hs(i) != hs(w - 1)) { hs(w) = hs(i); w += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hs, w))
  }

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03): the
    * minimum shingle hash of every sliding window of `w` consecutive n-gram
    * hashes, sorted distinct. Guarantees any match of length >= w+n-1
    * shares a fingerprint, at ~2/(w+1) the density of the full hash
    * sequence. Plain (not robust) winnowing — the window minimum — so a
    * SQL oracle reproduces it with list_min over slices. */
  def winnowFingerprints(text: UTF8String, n: Int, w: Int): ArrayData = {
    val s = text.toString
    val last = s.length - n
    if (last < 0) return new GenericArrayData(Array.emptyLongArray)
    val hs = allGramHashes(s, n, last)
    var i = 0
    val nw = math.max(1, hs.length - w + 1)
    val fps = new Array[Long](nw)
    i = 0
    while (i < nw) {
      var m = Long.MaxValue
      var j = i
      val end = math.min(i + w, hs.length)
      while (j < end) { if (hs(j) < m) m = hs(j); j += 1 }
      fps(i) = m
      i += 1
    }
    java.util.Arrays.sort(fps)
    var wIdx = 1
    i = 1
    while (i < nw) {
      if (fps(i) != fps(wIdx - 1)) { fps(wIdx) = fps(i); wIdx += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(fps, wIdx))
  }

  /** [intersection, union] sizes of two SORTED distinct long arrays via a
    * linear merge — allocation-free. */
  /** Count of agreeing positions of two equal-length long arrays (the
    * MinHash signature-agreement estimator). Extra tail positions of a
    * longer array count as disagreement. */
  def countEq(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    var m = 0L
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) m += 1
      i += 1
    }
    m
  }

  /** Nibble SKETCH of a minhash signature: one 4-bit nibble per
    * permutation, `(v % 16)`, packed two per byte (even permutation in the
    * high nibble) — HALF a byte of transport per permutation, ~1/16 the
    * signature's width. The sketch supports a sound, deterministic
    * estimate PREFILTER: nibble equality is implied by value equality, so
    * the nibble-estimate only ever READS HIGH (collision rate 1/16 per
    * disagreeing position) — a pair dropped on the nibble estimate is
    * dropped on the exact estimate too, and the Chernoff miss bound for a
    * TRUE pair only tightens (collisions inflate the estimate, never
    * deflate it). Pruning power at the d02 operating point survives the
    * coarser mod: a J=0.5 boilerplate pair reads ~0.5 + 0.5/16 = 53%
    * expected agreement, still under the 55% drop threshold. Power of two
    * keeps the mod portable to the SQL oracle's integer arithmetic
    * (`v % 16`). An ODD permutation count would leave a padding nibble
    * that compares equal on both sides (one estimate count of inflation —
    * still sound, reads high); the signature is 200 permutations. */
  def sigSketch(sig: ArrayData): Array[Byte] = {
    val n = sig.numElements()
    val out = new Array[Byte]((n + 1) >> 1)
    var i = 0
    while (i < n) {
      val nib = (sig.getLong(i) % 16L).toInt
      if ((i & 1) == 0) out(i >> 1) = (nib << 4).toByte
      else out(i >> 1) = (out(i >> 1) | nib).toByte
      i += 1
    }
    out
  }

  /** Count of agreeing NIBBLE positions of two packed nibble sketches
    * ([[sigSketch]]). Positions beyond the shorter sketch count as
    * disagreement. */
  def countEqNibbles(a: Array[Byte], b: Array[Byte]): Long = {
    val n = math.min(a.length, b.length)
    var i = 0
    var m = 0L
    while (i < n) {
      val x = a(i) ^ b(i)
      if ((x & 0xf0) == 0) m += 1
      if ((x & 0x0f) == 0) m += 1
      i += 1
    }
    m
  }

  /** Integer squared L2 distance between two equal-length long-code arrays —
    * the SQ8 symmetric-ADC inner loop (e13/e14). Ragged lengths yield SQL
    * null, mirroring the `zip_with` reference formulation (which null-pads
    * the shorter array and nulls the aggregate). Overflow-safe for 8-bit
    * codes up to ~1e14 dimensions. */
  def codeSqDist(a: ArrayData, b: ArrayData): java.lang.Long = {
    val na = a.numElements()
    if (na != b.numElements()) return null
    var i = 0
    var s = 0L
    while (i < na) {
      // null elements null the whole sum, exactly as the zip_with
      // reference does — the two formulations must stay bitwise-equal
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getLong(i) - b.getLong(i)
      s += d * d
      i += 1
    }
    java.lang.Long.valueOf(s)
  }

  def sortedIU(a: ArrayData, b: ArrayData): ArrayData = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var inter = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    new GenericArrayData(Array(inter, na.toLong + nb.toLong - inter))
  }

  /** Hashed feature buckets of whitespace tokens (empty tokens skipped,
    * term frequency preserved, document order): bucket = polyhash(token)
    * mod m. The feature-hashing front of DSIR importance scoring. */
  /** Positional character n-gram hashes: element i (0-based) is the
    * polynomial hash of s[i, i+n). Unlike [[shingleHashSet]] this keeps
    * POSITION — the exact-substring span detector ([[graft.operators
    * .ExactSubstr]]) needs (position, hash) pairs, and shipping 8-byte
    * hashes instead of n-byte substrings is what keeps its first shuffle
    * narrow. Collisions mod P only ever ADD candidates there (stage 2
    * regroups candidates by the raw substring), so the hash is a pruner,
    * not a correctness dependency. */
  def charGramHashes(text: UTF8String, n: Int): ArrayData = {
    val s = text.toString
    val last = s.length - n
    if (last < 0) return new GenericArrayData(Array.emptyLongArray)
    new GenericArrayData(allGramHashes(s, n, last))
  }

  /** Hashes of ALL n-gram positions 0..last via the rolling form — O(len)
    * total instead of O(len*n), bit-identical to per-position [[hashRange]]
    * (the exact-substring detector at n=30 pays 30x without this). */
  @inline private def allGramHashes(s: String, n: Int, last: Int): Array[Long] = {
    val hs = new Array[Long](last + 1)
    val pw = pow31(n)
    var h = hashRange(s, 0, n)
    hs(0) = h
    var i = 1
    while (i <= last) {
      h = rollHash(h, s.charAt(i - 1), s.charAt(i - 1 + n), pw)
      hs(i) = h
      i += 1
    }
    hs
  }

  /** Suffix-array round-0 keys: element p (0-based) is the first `m`
    * Java chars of the suffix starting at p packed into ONE order-
    * preserving non-negative long, 0-padded past the doc end so a prefix
    * sorts before its extensions. Base 128 at m = 9 (all-ASCII corpora:
    * 9 chars x 7 bits fill the 63 sign-safe bits exactly, max key
    * 128^9 - 1 = Long.MaxValue) or base 65536 at m = 3 (BMP corpora —
    * Java char code order, the class's documented collation). Computed as
    * a rolling O(1) update per position — the HOF formulation paid an
    * O(position) `substring` walk per char, O(len^2) per document. */
  def saInitKeys(text: UTF8String, m: Int): ArrayData = {
    val s = text.toString
    val len = s.length
    if (len == 0) return new GenericArrayData(Array.emptyLongArray)
    val base = if (m == 9) 128L else 65536L
    // top = base^(m-1): the dropped leading char's place value
    var top = 1L
    var j = 1
    while (j < m) { top *= base; j += 1 }
    @inline def charAt(p: Int): Long = if (p < len) s.charAt(p).toLong else 0L
    val keys = new Array[Long](len)
    // key(0): fold the first m chars
    var key = 0L
    j = 0
    while (j < m) { key = key * base + charAt(j); j += 1 }
    keys(0) = key
    var p = 1
    while (p < len) {
      key = (key - charAt(p - 1) * top) * base + charAt(p - 1 + m)
      keys(p) = key
      p += 1
    }
    new GenericArrayData(keys)
  }

  def tokenBuckets(text: UTF8String, m: Long): ArrayData = {
    val s = text.toString
    val len = s.length
    var n = 0
    var i = 0
    while (i < len) { // count tokens first: exact-size single allocation
      while (i < len && s.charAt(i) == ' ') i += 1
      if (i < len) { n += 1; while (i < len && s.charAt(i) != ' ') i += 1 }
    }
    val out = new Array[Long](n)
    var w = 0
    i = 0
    while (i < len) {
      while (i < len && s.charAt(i) == ' ') i += 1
      val start = i
      while (i < len && s.charAt(i) != ' ') i += 1
      if (i > start) { out(w) = hashRange(s, start, i - start) % m; w += 1 }
    }
    new GenericArrayData(out)
  }

  /** Occurrence count of the doc's most frequent word 2-gram — the Gopher
    * top-n-gram repetition statistic, computed IN-ROW over exact bigram
    * strings (no hashing: a hash-merge of two distinct bigrams would
    * silently inflate the max, and at corpus scale some doc would hit it).
    * 0 when the doc has fewer than two non-empty tokens. Replaces a
    * corpus-wide (doc_id, gram) shuffle with a per-row map bounded by
    * document length. */
  def topBigramCount(text: UTF8String): Long = {
    val s = text.toString
    val len = s.length
    val counts = new java.util.HashMap[String, Int]()
    var best = 0
    var prevStart = -1
    var prevEnd = -1
    var i = 0
    while (i < len) {
      while (i < len && s.charAt(i) == ' ') i += 1
      val start = i
      while (i < len && s.charAt(i) != ' ') i += 1
      if (i > start) {
        if (prevStart >= 0) {
          val bigram = s.substring(prevStart, prevEnd) + " " + s.substring(start, i)
          val c = counts.merge(bigram, 1, Integer.sum)
          if (c > best) best = c
        }
        prevStart = start
        prevEnd = i
      }
    }
    best.toLong
  }

  /** Word spans of `s` (split on ' ', empties skipped): packed
    * (start, end) pairs — starts in even slots, ends in odd. */
  private def wordSpans(s: String): Array[Int] = {
    val out = new scala.collection.mutable.ArrayBuffer[Int](64)
    val len = s.length
    var i = 0
    while (i < len) {
      while (i < len && s.charAt(i) == ' ') i += 1
      val start = i
      while (i < len && s.charAt(i) != ' ') i += 1
      if (i > start) { out += start; out += i }
    }
    out.toArray
  }

  /** Gopher repetition (top-n-gram form): the character mass of the most
    * frequent word n-gram — max over grams of `count * gram_chars`, where
    * the gram is its words joined by ONE space (so gram_chars counts the
    * n-1 separators once; the max-of-products form is well-defined under
    * count ties, unlike argmax-then-measure). 0 when fewer than n words. */
  def topNgramChars(text: UTF8String, n: Int): Long = {
    val s = text.toString
    val sp = wordSpans(s)
    val m = sp.length / 2
    if (m < n) return 0L
    val counts = new java.util.HashMap[String, Long]()
    var best = 0L
    var i = 0
    while (i + n <= m) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(s, sp(2 * (i + j)), sp(2 * (i + j) + 1))
        j += 1
      }
      val g = sb.toString
      val c = counts.merge(g, java.lang.Long.valueOf(1L),
        (a, b) => java.lang.Long.valueOf(a.longValue + b.longValue))
      // each increment only grows this gram's mass, so the running max
      // over updates equals the max over final counts
      val mass = c.longValue * g.length
      if (mass > best) best = mass
      i += 1
    }
    best
  }

  /** Gopher repetition (duplicate-n-gram form): total word characters
    * (separators excluded) covered by positions inside ANY n-gram that
    * occurs at least twice in the document. 0 when fewer than n words. */
  def dupNgramChars(text: UTF8String, n: Int): Long = {
    val s = text.toString
    val sp = wordSpans(s)
    val m = sp.length / 2
    if (m < n) return 0L
    val counts = new java.util.HashMap[String, Int]()
    val grams = new Array[String](m - n + 1)
    var i = 0
    while (i + n <= m) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(s, sp(2 * (i + j)), sp(2 * (i + j) + 1))
        j += 1
      }
      grams(i) = sb.toString
      counts.merge(grams(i), 1, Integer.sum)
      i += 1
    }
    val covered = new Array[Boolean](m)
    i = 0
    while (i + n <= m) {
      if (counts.get(grams(i)) >= 2) {
        var j = 0
        while (j < n) { covered(i + j) = true; j += 1 }
      }
      i += 1
    }
    var total = 0L
    i = 0
    while (i < m) {
      if (covered(i)) total += sp(2 * i + 1) - sp(2 * i)
      i += 1
    }
    total
  }

  /** Total word characters (separators excluded) — the denominator the
    * n-gram char-fraction rules share. */
  def wordChars(text: UTF8String): Long = {
    val s = text.toString
    val sp = wordSpans(s)
    var total = 0L
    var i = 0
    while (i < sp.length) { total += sp(i + 1) - sp(i); i += 2 }
    total
  }

  /** SimHash over whitespace tokens (term frequency preserved, empty tokens
    * skipped), `bits` wide; bit j set iff sum of +-1 votes of hash bit j > 0. */
  def simhash(text: UTF8String, bits: Int): Long = {
    val s = text.toString
    val votes = new Array[Int](bits)
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && s.charAt(i) == ' ') i += 1
      val start = i
      while (i < len && s.charAt(i) != ' ') i += 1
      if (i > start) {
        val h = hashRange(s, start, i - start)
        var j = 0
        while (j < bits) {
          if (((h >> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
    }
    var fp = 0L
    var j = 0
    while (j < bits) { if (votes(j) > 0) fp |= (1L << j); j += 1 }
    fp
  }
}
