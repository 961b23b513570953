package graft.expressions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions (with codegen) for the text-hash kernels.
  * Registered through [[GraftSparkSessionExtensions]] so queries call them as
  * SQL functions (`graft_minhash_sig(text)`), staying inside whole-stage
  * codegen — the generated code is a single static call into
  * [[TextHashKernels]].
  */
case class MinhashSigExpression(child: Expression, n: Int = 3)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextHashKernels.minhashSig(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextHashKernels.minhashSig($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): MinhashSigExpression =
    copy(child = newChild)
  override def prettyName: String = "graft_minhash_sig"
}

/** Sorted distinct n-gram shingle hashes of a string. */
case class ShingleHashSetExpression(child: Expression, n: Int = 3)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextHashKernels.shingleHashSet(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextHashKernels.shingleHashSet($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): ShingleHashSetExpression =
    copy(child = newChild)
  override def prettyName: String = "graft_shingle_hash_set"
}

/** [intersection, union] of two sorted distinct long arrays (linear merge). */
case class SortedIUExpression(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(a: Any, b: Any): Any =
    TextHashKernels.sortedIU(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.expressions.TextHashKernels.sortedIU($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedIUExpression =
    copy(left = l, right = r)
  override def prettyName: String = "graft_sorted_iu"
}

/** Nibble sketch of a minhash signature — `(v % 16)` per permutation,
  * packed two per byte: the half-byte-per-perm transport form of the
  * signature used by the LSH candidate prefilter (each band row carries
  * one; the estimate evaluates inside the band join so no per-pair
  * payload ever shuffles). */
case class SigSketchExpression(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullSafeEval(input: Any): Any =
    TextHashKernels.sigSketch(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextHashKernels.sigSketch($c)")
  override protected def withNewChildInternal(newChild: Expression): SigSketchExpression =
    copy(child = newChild)
  override def prettyName: String = "graft_sig_sketch"
}

/** Count of NIBBLE positions where two packed nibble sketches agree —
  * the prefilter's inner loop over [[SigSketchExpression]] output (a
  * sound over-estimate of the signature agreement: nibble collisions
  * only read high). */
case class CountEqNibblesExpression(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    TextHashKernels.countEqNibbles(
      a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.expressions.TextHashKernels.countEqNibbles($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CountEqNibblesExpression =
    copy(left = l, right = r)
  override def prettyName: String = "graft_count_eq_nibbles"
}

/** Count of positions where two equal-length long arrays agree — the
  * MinHash signature-agreement estimator's inner loop (d44). */
case class CountEqExpression(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    TextHashKernels.countEq(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.expressions.TextHashKernels.countEq($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CountEqExpression =
    copy(left = l, right = r)
  override def prettyName: String = "graft_count_eq"
}

/** Integer squared L2 distance of two equal-length long-code arrays — the
  * fused form of `aggregate(zip_with(a, b, (x,y) => (x-y)*(x-y)), 0L, +)`,
  * the SQ8 symmetric-ADC scoring loop (e13/e14). d44 measured the
  * interpreted HOF shape 2x slower than a fused kernel on the identical
  * per-pair array walk; the HOF form stays as the bitwise cross-check. */
case class CodeSqDistExpression(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<bigint> code inputs, " +
          s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    TextHashKernels.codeSqDist(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("codeSqDist")
      s"""
         |java.lang.Long $tmp = graft.expressions.TextHashKernels.codeSqDist($a, $b);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.longValue(); }
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CodeSqDistExpression =
    copy(left = l, right = r)
  override def prettyName: String = "graft_code_sqdist"
}

/** Sorted distinct winnowing fingerprints (window-min of n-gram hashes). */
case class WinnowExpression(child: Expression, n: Int = 3, window: Int = 8)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextHashKernels.winnowFingerprints(input.asInstanceOf[UTF8String], n, window)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.TextHashKernels.winnowFingerprints($c, $n, $window)")
  override protected def withNewChildInternal(newChild: Expression): WinnowExpression =
    copy(child = newChild)
  override def prettyName: String = "graft_winnow"
}

/** Positional character n-gram hashes (element i = hash of text[i, i+n)). */
case class CharGramHashesExpression(child: Expression, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextHashKernels.charGramHashes(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.TextHashKernels.charGramHashes($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): CharGramHashesExpression =
    copy(child = newChild)
  override def prettyName: String = "graft_char_gram_hashes"
}

/** Suffix-array round-0 keys: packed order-preserving first-m-char keys,
  * one per position ([[TextHashKernels.saInitKeys]]). */
case class SaInitKeysExpression(child: Expression, m: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextHashKernels.saInitKeys(input.asInstanceOf[UTF8String], m)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.TextHashKernels.saInitKeys($c, $m)")
  override protected def withNewChildInternal(newChild: Expression): SaInitKeysExpression =
    copy(child = newChild)
  override def prettyName: String = "graft_sa_init_keys"
}

/** Hashed feature buckets of whitespace tokens: polyhash(token) mod m. */
case class TokenBucketsExpression(child: Expression, m: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextHashKernels.tokenBuckets(input.asInstanceOf[UTF8String], m)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.TextHashKernels.tokenBuckets($c, ${m}L)")
  override protected def withNewChildInternal(newChild: Expression): TokenBucketsExpression =
    copy(child = newChild)
  override def prettyName: String = "graft_token_buckets"
}

/** In-row count of the most frequent word bigram (Gopher repetition rule). */
case class TopBigramCountExpression(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    TextHashKernels.topBigramCount(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.TextHashKernels.topBigramCount($c)")
  override protected def withNewChildInternal(newChild: Expression): TopBigramCountExpression =
    copy(child = newChild)
  override def prettyName: String = "graft_top_bigram_count"
}

/** Gopher repetition, top-n-gram form: char mass of the most frequent
  * word n-gram (max of count x gram chars; kernel doc on
  * [[TextHashKernels.topNgramChars]]). */
case class TopNgramCharsExpression(child: Expression, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    TextHashKernels.topNgramChars(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.TextHashKernels.topNgramChars($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): TopNgramCharsExpression =
    copy(child = newChild)
  override def prettyName: String = "graft_top_ngram_chars"
}

/** Gopher repetition, duplicate-n-gram form: word chars covered by any
  * n-gram occurring >= 2 times ([[TextHashKernels.dupNgramChars]]). */
case class DupNgramCharsExpression(child: Expression, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    TextHashKernels.dupNgramChars(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.TextHashKernels.dupNgramChars($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): DupNgramCharsExpression =
    copy(child = newChild)
  override def prettyName: String = "graft_dup_ngram_chars"
}

/** Total word characters (the shared denominator of the char-fraction
  * repetition rules). */
case class WordCharsExpression(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    TextHashKernels.wordChars(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.TextHashKernels.wordChars($c)")
  override protected def withNewChildInternal(newChild: Expression): WordCharsExpression =
    copy(child = newChild)
  override def prettyName: String = "graft_word_chars"
}

case class SimhashExpression(child: Expression, bits: Int = 20)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    TextHashKernels.simhash(input.asInstanceOf[UTF8String], bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextHashKernels.simhash($c, $bits)")
  override protected def withNewChildInternal(newChild: Expression): SimhashExpression =
    copy(child = newChild)
  override def prettyName: String = "graft_simhash"
}

/** PII redaction: one codegen'd left-to-right scan replacing emails,
  * IPv4 addresses, phone numbers and 13+-digit runs with typed
  * placeholders — grammar documented on [[RedactKernels]]. */
case class RedactPiiExpression(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    RedactKernels.redactPii(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.RedactKernels.redactPii($c)")
  override protected def withNewChildInternal(newChild: Expression): RedactPiiExpression =
    copy(child = newChild)
  override def prettyName: String = "graft_redact_pii"
}

/** Unicode NFC/NFKC normalization (UAX #15 via the JDK): the dedup-key
  * canonicalization, codegen'd — kernels on [[NormKernels]]. */
case class UnicodeNormalizeExpression(child: Expression, compat: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    if (compat) NormKernels.nfkc(input.asInstanceOf[UTF8String])
    else NormKernels.nfc(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = if (compat) "nfkc" else "nfc"
    defineCodeGen(ctx, ev, c => s"graft.expressions.NormKernels.$m($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalizeExpression =
    copy(child = newChild)
  override def prettyName: String = if (compat) "graft_nfkc" else "graft_nfc"
}

/** Shared shape of the binary vector expressions: double-typed, nullable
  * (ragged or null-element inputs yield SQL null, mirroring the HOF
  * reference), element width resolved from the child array types, codegen
  * emitting ONE static kernel call. */
abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  /** "dot" | "cosine" | "sqDist" — the [[VectorKernels]] method. */
  protected def kernel: String

  protected final def isFloat(e: Expression): Boolean =
    e.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<float>/array<double> inputs, " +
          s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val r = kernel match {
      case "dot" => VectorKernels.dot(a.asInstanceOf[ArrayData],
        b.asInstanceOf[ArrayData], isFloat(left), isFloat(right))
      case "cosine" => VectorKernels.cosine(a.asInstanceOf[ArrayData],
        b.asInstanceOf[ArrayData], isFloat(left), isFloat(right))
      case "sqDist" => VectorKernels.sqDist(a.asInstanceOf[ArrayData],
        b.asInstanceOf[ArrayData], isFloat(left), isFloat(right))
    }
    r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("vecKernel")
      s"""
         |java.lang.Double $tmp = graft.expressions.VectorKernels.$kernel(
         |  $a, $b, ${isFloat(left)}, ${isFloat(right)});
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })
}

/** Double-precision dot product of two embedding arrays. */
case class DotExpression(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override protected def kernel: String = "dot"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotExpression =
    copy(left = l, right = r)
  override def prettyName: String = "graft_dot"
}

/** Cosine similarity of two embedding arrays (one fused pass). */
case class CosineExpression(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override protected def kernel: String = "cosine"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineExpression =
    copy(left = l, right = r)
  override def prettyName: String = "graft_cosine"
}

/** Squared L2 distance of two embedding arrays. */
case class SqDistExpression(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override protected def kernel: String = "sqDist"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SqDistExpression =
    copy(left = l, right = r)
  override def prettyName: String = "graft_sqdist"
}

/** Fused nearest-centroid argmin: `graft_nearest_cell(emb, cells, cents)`
  * where `cells` is a foldable `array<bigint>` of cell ids and `cents` the
  * k×dim centroid matrix flattened row-major as a foldable `array<double>`.
  * Exactly `min_by(cell, struct(sqDist(emb, c_emb), cell))` over the k-row
  * centroid table, fused per row — the Lloyd-iteration assignment becomes a
  * shuffle-free projection (the centroid constants ride along as a codegen
  * reference object, the per-row cost is one k×dim loop). */
case class NearestCellExpression(emb: Expression, cellsLit: Expression,
                                 centsLit: Expression) extends TernaryExpression {
  override def first: Expression = emb
  override def second: Expression = cellsLit
  override def third: Expression = centsLit
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  private def embIsFloat: Boolean = emb.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  @transient private lazy val cells: Array[Long] =
    cellsLit.eval().asInstanceOf[ArrayData].toLongArray()
  @transient private lazy val cents: Array[Double] =
    centsLit.eval().asInstanceOf[ArrayData].toDoubleArray()

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val embOk = emb.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (!embOk)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects an array<float>/array<double> embedding, got ${emb.dataType.sql}")
    else if (!cellsLit.foldable || !centsLit.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects foldable cell-id and centroid arrays")
    else if (cellsLit.dataType != ArrayType(LongType, containsNull = false) &&
        cellsLit.dataType != ArrayType(LongType, containsNull = true))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<bigint> cell ids, got ${cellsLit.dataType.sql}")
    else if (centsLit.dataType != ArrayType(DoubleType, containsNull = false) &&
        centsLit.dataType != ArrayType(DoubleType, containsNull = true))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<double> centroids, got ${centsLit.dataType.sql}")
    else if (cellsLit.eval() == null || centsLit.eval() == null)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName cell-id and centroid arrays must not be null")
    else {
      val nCells = cellsLit.eval().asInstanceOf[ArrayData].numElements()
      val nCents = centsLit.eval().asInstanceOf[ArrayData].numElements()
      if (nCells > 0 && nCents % nCells != 0)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName centroid matrix length $nCents is not a multiple of " +
            s"the $nCells cell ids — wrong dim/m configuration")
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    }
  }

  override def nullSafeEval(e: Any, c1: Any, c2: Any): Any =
    VectorKernels.nearestCell(e.asInstanceOf[ArrayData], cells, cents, embIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cellsRef = ctx.addReferenceObj("nearestCells", cells, "long[]")
    val centsRef = ctx.addReferenceObj("nearestCents", cents, "double[]")
    nullSafeCodeGen(ctx, ev, (e, _, _) => {
      val tmp = ctx.freshName("nearestCell")
      s"""
         |java.lang.Long $tmp = graft.expressions.VectorKernels.nearestCell(
         |  $e, $cellsRef, $centsRef, $embIsFloat);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.longValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
                                                 t: Expression): NearestCellExpression =
    copy(emb = f, cellsLit = s, centsLit = t)
  override def prettyName: String = "graft_nearest_cell"
}

/** Broadcast-sketch membership probe: `graft_bloom_might_contain(value,
  * bits)` where `bits` is a foldable serialized
  * `org.apache.spark.util.sketch.BloomFilter` and `value` a long key.
  * False positives possible (the caller MUST follow with an exact verify
  * join — the standard sketch-prefilter discipline), false negatives
  * impossible. The filter deserializes once per task via a codegen
  * reference object; the per-row probe stays inside whole-stage codegen.
  * At 100 TB this is what replaces broadcasting an exact key set: a 10M-key
  * 1%-fpp filter is ~12 MB, and the exact join downstream only sees the
  * prefiltered survivors. */
case class BloomMightContainExpression(value: Expression, bitsLit: Expression)
    extends BinaryExpression {
  override def left: Expression = value
  override def right: Expression = bitsLit
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true

  @transient private lazy val filter: org.apache.spark.util.sketch.BloomFilter =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bitsLit.eval().asInstanceOf[Array[Byte]]))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (value.dataType != LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a BIGINT probe value, got ${value.dataType.sql}")
    else if (!bitsLit.foldable || bitsLit.dataType != BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a foldable BINARY serialized Bloom filter")
    else if (bitsLit.eval() == null)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName Bloom filter bits must not be null")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  override def nullSafeEval(v: Any, b: Any): Any =
    filter.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomFilter", filter,
      "org.apache.spark.util.sketch.BloomFilter")
    nullSafeCodeGen(ctx, ev, (v, _) => s"${ev.value} = $ref.mightContainLong($v);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): BloomMightContainExpression =
    copy(value = l, bitsLit = r)
  override def prettyName: String = "graft_bloom_might_contain"
}

/** `spark.sql.extensions=graft.expressions.GraftSparkSessionExtensions` */
class GraftSparkSessionExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_minhash_sig"),
      new ExpressionInfo(classOf[MinhashSigExpression].getName, "graft_minhash_sig"),
      (children: Seq[Expression]) => MinhashSigExpression(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_shingle_hash_set"),
      new ExpressionInfo(classOf[ShingleHashSetExpression].getName, "graft_shingle_hash_set"),
      (children: Seq[Expression]) => ShingleHashSetExpression(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_sorted_iu"),
      new ExpressionInfo(classOf[SortedIUExpression].getName, "graft_sorted_iu"),
      (children: Seq[Expression]) => SortedIUExpression(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_count_eq"),
      new ExpressionInfo(classOf[CountEqExpression].getName, "graft_count_eq"),
      (children: Seq[Expression]) => CountEqExpression(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_sig_sketch"),
      new ExpressionInfo(classOf[SigSketchExpression].getName, "graft_sig_sketch"),
      (children: Seq[Expression]) => SigSketchExpression(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_count_eq_nibbles"),
      new ExpressionInfo(classOf[CountEqNibblesExpression].getName, "graft_count_eq_nibbles"),
      (children: Seq[Expression]) => CountEqNibblesExpression(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_code_sqdist"),
      new ExpressionInfo(classOf[CodeSqDistExpression].getName, "graft_code_sqdist"),
      (children: Seq[Expression]) => CodeSqDistExpression(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimhashExpression].getName, "graft_simhash"),
      (children: Seq[Expression]) => SimhashExpression(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_top_bigram_count"),
      new ExpressionInfo(classOf[TopBigramCountExpression].getName,
        "graft_top_bigram_count"),
      (children: Seq[Expression]) => TopBigramCountExpression(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_top_ngram_chars"),
      new ExpressionInfo(classOf[TopNgramCharsExpression].getName,
        "graft_top_ngram_chars"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"graft_top_ngram_chars(text, n) takes 2 arguments, got ${children.length}")
        require(children(1).foldable, "graft_top_ngram_chars: n must be a literal")
        val n = children(1).eval(null).toString.toInt
        require(n > 0, s"graft_top_ngram_chars: n must be positive, got $n")
        TopNgramCharsExpression(children(0), n)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_dup_ngram_chars"),
      new ExpressionInfo(classOf[DupNgramCharsExpression].getName,
        "graft_dup_ngram_chars"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"graft_dup_ngram_chars(text, n) takes 2 arguments, got ${children.length}")
        require(children(1).foldable, "graft_dup_ngram_chars: n must be a literal")
        val n = children(1).eval(null).toString.toInt
        require(n > 0, s"graft_dup_ngram_chars: n must be positive, got $n")
        DupNgramCharsExpression(children(0), n)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_word_chars"),
      new ExpressionInfo(classOf[WordCharsExpression].getName, "graft_word_chars"),
      (children: Seq[Expression]) => WordCharsExpression(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_token_buckets"),
      new ExpressionInfo(classOf[TokenBucketsExpression].getName, "graft_token_buckets"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"graft_token_buckets(text, m) takes 2 arguments, got ${children.length}")
        require(children(1).foldable,
          "graft_token_buckets: m must be a literal")
        val m = children(1).eval(null).toString.toLong
        require(m > 0, s"graft_token_buckets: m must be positive, got $m")
        TokenBucketsExpression(children(0), m)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_char_gram_hashes"),
      new ExpressionInfo(classOf[CharGramHashesExpression].getName,
        "graft_char_gram_hashes"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"graft_char_gram_hashes(text, n) takes 2 arguments, got ${children.length}")
        require(children(1).foldable,
          "graft_char_gram_hashes: n must be a literal")
        val n = children(1).eval(null).toString.toInt
        require(n > 0, s"graft_char_gram_hashes: n must be positive, got $n")
        CharGramHashesExpression(children(0), n)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_sa_init_keys"),
      new ExpressionInfo(classOf[SaInitKeysExpression].getName,
        "graft_sa_init_keys"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"graft_sa_init_keys(text, m) takes 2 arguments, got ${children.length}")
        require(children(1).foldable, "graft_sa_init_keys: m must be a literal")
        val m = children(1).eval(null).toString.toInt
        require(m == 3 || m == 9,
          s"graft_sa_init_keys: m must be 3 (BMP) or 9 (ASCII), got $m")
        SaInitKeysExpression(children(0), m)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_redact_pii"),
      new ExpressionInfo(classOf[RedactPiiExpression].getName, "graft_redact_pii"),
      (children: Seq[Expression]) => RedactPiiExpression(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[UnicodeNormalizeExpression].getName, "graft_nfc"),
      (children: Seq[Expression]) =>
        UnicodeNormalizeExpression(children.head, compat = false)))
    ext.injectFunction((
      FunctionIdentifier("graft_nfkc"),
      new ExpressionInfo(classOf[UnicodeNormalizeExpression].getName, "graft_nfkc"),
      (children: Seq[Expression]) =>
        UnicodeNormalizeExpression(children.head, compat = true)))
    ext.injectFunction((
      FunctionIdentifier("graft_winnow"),
      new ExpressionInfo(classOf[WinnowExpression].getName, "graft_winnow"),
      (children: Seq[Expression]) => WinnowExpression(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotExpression].getName, "graft_dot"),
      (children: Seq[Expression]) => DotExpression(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineExpression].getName, "graft_cosine"),
      (children: Seq[Expression]) => CosineExpression(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_sqdist"),
      new ExpressionInfo(classOf[SqDistExpression].getName, "graft_sqdist"),
      (children: Seq[Expression]) => SqDistExpression(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_might_contain"),
      new ExpressionInfo(classOf[BloomMightContainExpression].getName,
        "graft_bloom_might_contain"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"graft_bloom_might_contain(value, bits) takes 2 arguments, got ${children.length}")
        BloomMightContainExpression(children(0), children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_nearest_cell"),
      new ExpressionInfo(classOf[NearestCellExpression].getName, "graft_nearest_cell"),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          s"graft_nearest_cell(emb, cells, cents) takes 3 arguments, got ${children.length}")
        NearestCellExpression(children(0), children(1), children(2))
      }))
    // SQL surface over lake tables: catalog reads of graft.sql.LakeSqlTable
    // become manifest-backed file relations (see graft.sql.LakeRelationRule),
    // and upsert-shaped MERGE INTO statements run the transactional
    // copy-on-write merge (see graft.sql.LakeMergeIntoRule)
    ext.injectResolutionRule(sp => new graft.sql.LakeRelationRule(sp))
    ext.injectResolutionRule(sp => new graft.sql.LakeMergeIntoRule(sp))
    ext.injectResolutionRule(sp => new graft.sql.LakeDmlRule(sp))
  }
}
