package graft.expressions

import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization kernels — the canonicalization step every
  * dedup/hash key needs BEFORE hashing: "é" as U+00E9 and as
  * "e"+U+0301 are the same text to a reader and different bytes to
  * md5/minhash, so un-normalized corpora leak duplicates past every
  * content-keyed operator upstream.
  *
  * Forms: NFC (canonical composition — the dedup-key default; ligatures
  * and width variants survive) and NFKC (compatibility — folds "ﬁ"→"fi",
  * fullwidth→ASCII; the aggressive form token-matching pipelines use).
  * The JDK's `java.text.Normalizer` implements both (Unicode UAX #15).
  *
  * `isNormalized` runs first so the (overwhelmingly common) already-NFC
  * ASCII row costs one scan and ZERO allocation; invoked from codegen as
  * a single static call — normalization runs at scan speed inside
  * whole-stage codegen, no UDF, no shuffle.
  */
object NormKernels {

  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  def nfkc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFKC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFKC))
  }
}
