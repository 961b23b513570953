package graft.expressions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.functions.TextFunctions

/** The codegen kernels must agree bit-for-bit with the interpreted
  * higher-order-function formulations (the oracle contract). */
class TextHashKernelsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val samples = Seq(
    "the fast key order sort table scan merge",
    "a b c", "abc", "ab", "", "xyzzy xyzzy xyzzy",
    "join a filter window row join stream")

  test("portable hash kernel == HOF aggregate formulation") {
    val df = samples.toDF("t")
    val rows = df.select(
      TextFunctions.portableHash(col("t")).as("hof"),
      expr("graft_simhash(t)").as("k_simhash")).collect()
    // spot-check the hash itself through shingle hashes below; simhash of a
    // one-token string equals a bit-spread of its hash
    assert(rows.nonEmpty)
  }

  test("minhash signature kernel == HOF formulation (first 8 perms)") {
    val df = samples.filter(_.length >= 3).toDF("t")
    val both = df.select(
      slice(expr("graft_minhash_sig(t)"), 1, 8).as("kernel"),
      slice(TextFunctions.minhashSignature(
        TextFunctions.shingleHashes(col("t"), 3), 8), 1, 8).as("hof"))
    both.collect().foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
  }

  test("shingle hash set is sorted distinct hashes of 3-grams") {
    val df = samples.filter(_.length >= 3).toDF("t")
    val both = df.select(
      expr("graft_shingle_hash_set(t)").as("kernel"),
      sort_array(array_distinct(TextFunctions.shingleHashes(col("t"), 3))).as("hof"))
    both.collect().foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("code-sqdist kernel == HOF zip_with formulation, incl. ragged-null") {
    val df = Seq(
      (Array(0L, 255L, 17L, 3L), Array(255L, 0L, 17L, 200L)),
      (Array(1L, 2L, 3L), Array(1L, 2L, 3L)),
      (Array.emptyLongArray, Array.emptyLongArray))
      .toDF("a", "b")
    df.select(expr("graft_code_sqdist(a, b)").as("kernel"),
        graft.functions.VectorFunctions.codeSqDistHof(col("a"), col("b")).as("hof"))
      .collect().foreach { r =>
        assert(r.isNullAt(0) == r.isNullAt(1))
        if (!r.isNullAt(0)) assert(r.getLong(0) == r.getLong(1))
      }
    // ragged lengths: HOF null-pads then nulls the sum; kernel must agree
    val ragged = Seq((Array(1L, 2L), Array(1L, 2L, 3L))).toDF("a", "b")
    val rr = ragged.select(expr("graft_code_sqdist(a, b)").as("kernel"),
      graft.functions.VectorFunctions.codeSqDistHof(col("a"), col("b")).as("hof"))
      .collect().head
    assert(rr.isNullAt(0) && rr.isNullAt(1))
    // a null ELEMENT nulls the HOF aggregate; the kernel must agree too
    val withNull = spark.range(1).select(
      expr("array(1L, cast(null as bigint))").as("a"),
      expr("array(1L, 2L)").as("b"))
    val nn = withNull.select(expr("graft_code_sqdist(a, b)").as("kernel"),
      graft.functions.VectorFunctions.codeSqDistHof(col("a"), col("b")).as("hof"))
      .collect().head
    assert(nn.isNullAt(0) && nn.isNullAt(1))
  }

  test("sortedIU computes exact intersection/union of sorted sets") {
    val df = Seq((Array(1L, 3L, 5L, 7L), Array(3L, 4L, 5L, 9L, 11L))).toDF("a", "b")
    val r = df.select(expr("graft_sorted_iu(a, b)")).collect().head.getSeq[Long](0)
    assert(r == Seq(2L, 7L)) // {3,5}; union 4+5-2
  }

  test("top-bigram-count kernel == explode/groupBy formulation") {
    val texts = Seq("a b a b a b", "x y", "solo", "", "   ",
      "dup dup dup dup", "a  b   a  b", "t1 t2 t1 t2 t3 t1 t2")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val kernel = df.select(col("doc_id"),
        expr("graft_top_bigram_count(text)").as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val reference = df
      .select(col("doc_id"), explode(TextFunctions.wordBigrams(col("text"))).as("g"))
      .groupBy("doc_id", "g").count()
      .groupBy("doc_id").agg(max("count").as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    df.collect().map(_.getLong(0)).foreach { id =>
      assert(kernel(id) == reference.getOrElse(id, 0L), s"doc $id")
    }
  }

  test("n-gram repetition kernels: hand-checked masses and coverage") {
    import graft.expressions.TextHashKernels._
    def u(s: String) = org.apache.spark.unsafe.types.UTF8String.fromString(s)
    // "a b a b a b": 3-grams = "a b a"(x2), "b a b"(x2) -> mass 2*5 = 10
    assert(topNgramChars(u("a b a b a b"), 3) == 10L)
    // dup-3 coverage: every position sits in a duplicated 3-gram -> 6 chars
    assert(dupNgramChars(u("a b a b a b"), 3) == 6L)
    // fewer than n words -> 0 (totality)
    assert(topNgramChars(u("x y"), 3) == 0L && dupNgramChars(u("x y"), 3) == 0L)
    assert(topNgramChars(u(""), 3) == 0L && wordChars(u("")) == 0L)
    // "spam spam spam spam spam spam": top-3 "spam spam spam" x4 -> 4*14=56
    assert(topNgramChars(u("spam spam spam spam spam spam"), 3) == 56L)
    // dup-5: the 5-gram occurs twice -> all 6 words covered -> 24 chars
    assert(dupNgramChars(u("spam spam spam spam spam spam"), 5) == 24L)
    // no repetition -> dup coverage 0, top mass = single occurrence chars
    assert(dupNgramChars(u("one two three four five six"), 5) == 0L)
    assert(topNgramChars(u("one two three"), 3) == 13L) // "one two three"
    // multi-space runs collapse like the single-space join convention
    assert(topNgramChars(u("a  b   a  b  a b"), 3) == 10L)
    assert(wordChars(u("  a  bb   ccc ")) == 6L)
  }

  test("simhash kernel == HOF formulation") {
    val df = samples.filter(_.nonEmpty).toDF("t")
    val both = df.select(
      expr("graft_simhash(t)").as("kernel"),
      TextFunctions.simhash(col("t"), 20).as("hof"))
    both.collect().foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("winnow kernel == reference formulation; shared-substring guarantee") {
    // independent reference implementation of plain winnowing
    def refWinnow(s: String, n: Int, w: Int): Seq[Long] = {
      def h(g: String) = g.foldLeft(0L)((a, c) => (a * 31 + c) % TextFunctions.HashMod)
      val hs = s.sliding(n).filter(_.length == n).map(h).toVector
      if (hs.isEmpty) Vector.empty
      else (0 until math.max(1, hs.length - w + 1))
        .map(i => hs.slice(i, i + w).min).distinct.sorted
    }
    val df = samples.toDF("t")
    val rows = df.select(col("t"), expr("graft_winnow(t)").as("k")).collect()
    rows.foreach(r => assert(r.getSeq[Long](1) == refWinnow(r.getString(0), 3, 8),
      s"text '${r.getString(0)}'"))

    // winnowing guarantee: a shared substring of length >= w+n-1 (10 chars)
    // forces at least one shared fingerprint
    val shared = "qwertyuiopas" // 12 chars
    val a = s"prefix one $shared suffix alpha"
    val b = s"другое содержание $shared completely different tail"
    val fps = Seq(a, b).toDF("t")
      .select(expr("graft_winnow(t)").as("f")).collect().map(_.getSeq[Long](0).toSet)
    assert(fps(0).intersect(fps(1)).nonEmpty)
  }

  test("rolling-hash/seen-set kernels == naive per-position formulations " +
       "on long, repetitive and non-ASCII inputs") {
    def naive(s: String, n: Int): Seq[Long] = (0 to s.length - n).map { i =>
      s.substring(i, i + n)
        .foldLeft(0L)((a, c) => (a * 31 + c) % TextFunctions.HashMod)
    }
    val texts = Seq(
      ("ab " * 400).trim,                          // repetitive: dedup-skip hot
      (0 until 500).map(i => ('a' + i % 26).toChar).mkString,
      "привет мир " * 50,                          // BMP non-ASCII code units
      "x" * 29, "y" * 30, "z" * 31,                // n=30 boundaries
      "the fast key order sort table scan merge " * 20)
    val df = texts.toDF("t")
    // charGramHashes at the exact-substring n=30 (rolling form)
    df.select(col("t"), expr("graft_char_gram_hashes(t, 30)").as("k")).collect()
      .foreach { r =>
        assert(r.getSeq[Long](1) == naive(r.getString(0), 30),
          s"char_gram_hashes n=30 on len ${r.getString(0).length}")
      }
    // shingle hash set at n=3 (rolling form feeding sort+dedup)
    df.select(col("t"), expr("graft_shingle_hash_set(t)").as("k")).collect()
      .foreach { r =>
        assert(r.getSeq[Long](1) == naive(r.getString(0), 3).distinct.sorted,
          "shingle_hash_set n=3")
      }
    // minhash signature (rolling + duplicate-shingle skip) vs the HOF
    // reference, which processes EVERY position — first 16 perms
    val both = df.filter(length(col("t")) >= 3).select(
      slice(expr("graft_minhash_sig(t)"), 1, 16).as("kernel"),
      TextFunctions.minhashSignature(
        TextFunctions.shingleHashes(col("t"), 3), 16).as("hof"))
    both.collect().foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1),
      "minhash_sig rolling+dedup-skip"))
  }

  test("short strings yield empty shingle set and zero-filled signature") {
    val df = Seq("ab").toDF("t")
    val r = df.select(expr("graft_shingle_hash_set(t)").as("s"),
      expr("graft_minhash_sig(t)").as("m")).collect().head
    assert(r.getSeq[Long](0).isEmpty)
    assert(r.getSeq[Long](1).forall(_ == 0L))
  }

  test("sig sketch is (v % 16) nibbles packed two per byte; nibble " +
       "count-eq only reads HIGH") {
    val df = samples.filter(_.length >= 3).toDF("t")
    val rows = df.select(
      expr("graft_minhash_sig(t)").as("sig"),
      expr("graft_sig_sketch(graft_minhash_sig(t))").as("sk")).collect()
    rows.foreach { r =>
      val sig = r.getSeq[Long](0)
      val sk = r.getAs[Array[Byte]](1)
      assert(sk.length == (sig.length + 1) / 2)
      sig.zipWithIndex.foreach { case (v, i) =>
        val nib = if ((i & 1) == 0) (sk(i / 2) >> 4) & 0xf
                  else sk(i / 2) & 0xf
        assert((v % 16L).toInt == nib, s"perm $i: $v -> nibble $nib")
      }
    }
    // pairwise: nibble agreement >= exact agreement (soundness direction —
    // a mod-16 collision can only inflate the estimate, never deflate it)
    val pairs = df.as("a").crossJoin(df.as("b")).select(
      expr("graft_count_eq(graft_minhash_sig(a.t), graft_minhash_sig(b.t))")
        .as("exact"),
      expr("graft_count_eq_nibbles(graft_sig_sketch(graft_minhash_sig(a.t)), " +
        "graft_sig_sketch(graft_minhash_sig(b.t)))").as("nibbles")).collect()
    pairs.foreach { r =>
      assert(r.getLong(1) >= r.getLong(0),
        s"nibble estimate must not read below exact: $r")
    }
    // identical inputs agree on every permutation
    val self = df.select(
      expr("graft_count_eq_nibbles(graft_sig_sketch(graft_minhash_sig(t)), " +
        "graft_sig_sketch(graft_minhash_sig(t)))").as("m"),
      expr("size(graft_minhash_sig(t))").as("n")).collect()
    self.foreach(r => assert(r.getLong(0) == r.getInt(1).toLong))
  }
}
