package graft.expressions

import org.apache.spark.unsafe.types.UTF8String

/** PII redaction scanner — the curation stage every production
  * training-data pipeline runs before release (C4 and its descendants
  * strip emails/phones/IPs/ID-like numbers). ONE deterministic
  * left-to-right pass; at each position the matchers try in fixed
  * priority order (EMAIL, IPV4, PHONE, NUMBER), the first match emits its
  * placeholder and the scan resumes after the matched span. The grammar
  * is deliberately exact (documented per matcher below) so the operator
  * is oracle-able: a gate that PLANTS entities analytically knows the
  * redacted text byte-for-byte.
  *
  * Invoked from codegen as a single static call (the kernel-family
  * pattern) — redaction runs at scan speed inside whole-stage codegen,
  * no UDF, no shuffle.
  */
object RedactKernels {

  private def isDigit(c: Char) = c >= '0' && c <= '9'
  private def isAlpha(c: Char) = c >= 'a' && c <= 'z'
  /** RFC-5321-ish local-part characters (lowercase grammar — callers
    * lowercase first if they need case-insensitive matching). */
  private def isLocal(c: Char) =
    isAlpha(c) || isDigit(c) || c == '.' || c == '_' || c == '%' ||
      c == '+' || c == '-'

  /** EMAIL: maximal local-part run, '@', then a dot-separated domain of
    * [a-z0-9-] labels (trailing '.'/'-' excluded), at least two labels,
    * final label all-alpha of length >= 2. Anchored: the char before the
    * local part must not itself be a local char. Returns the exclusive
    * end of the match, or -1. */
  private def matchEmail(s: String, i: Int): Int = {
    if (!isLocal(s.charAt(i)) || (i > 0 && isLocal(s.charAt(i - 1)))) return -1
    val n = s.length
    var j = i
    while (j < n && isLocal(s.charAt(j))) j += 1
    if (j >= n || s.charAt(j) != '@') return -1
    var k = j + 1
    while (k < n && (isAlpha(s.charAt(k)) || isDigit(s.charAt(k)) ||
        s.charAt(k) == '-' || s.charAt(k) == '.')) k += 1
    var e = k
    while (e > j + 1 && (s.charAt(e - 1) == '.' || s.charAt(e - 1) == '-')) e -= 1
    if (e <= j + 1) return -1
    val labels = s.substring(j + 1, e).split('.')
    if (labels.length < 2 || labels.exists(_.isEmpty)) return -1
    val last = labels.last
    if (last.length < 2 || !last.forall(isAlpha)) return -1
    e
  }

  /** IPV4: four 1-3 digit octets, each <= 255, dot-separated; anchored on
    * NON-alphanumeric, non-dot boundaries on both sides ("v91.2.3.4",
    * "1.2.3.4x" and the five-part "1.2.3.4.5" are version-like strings,
    * not addresses). */
  private def matchIpv4(s: String, i: Int): Int = {
    if (!isDigit(s.charAt(i))) return -1
    if (i > 0 && (isDigit(s.charAt(i - 1)) || isAlpha(s.charAt(i - 1)) ||
        s.charAt(i - 1) == '.')) return -1
    val n = s.length
    var p = i
    var octet = 0
    while (octet < 4) {
      var d = 0
      var v = 0
      while (p < n && d < 3 && isDigit(s.charAt(p))) {
        v = v * 10 + (s.charAt(p) - '0'); p += 1; d += 1
      }
      if (d == 0 || v > 255) return -1
      octet += 1
      if (octet < 4) {
        if (p >= n || s.charAt(p) != '.') return -1
        p += 1
      }
    }
    if (p < n && (isDigit(s.charAt(p)) || isAlpha(s.charAt(p)))) return -1
    if (p + 1 < n && s.charAt(p) == '.' && isDigit(s.charAt(p + 1))) return -1
    p
  }

  /** PHONE: '+' then 7-15 digits, single '-' separators allowed between
    * digit runs; must end at a non-digit. The char before the '+' must
    * not be a digit. */
  private def matchPhone(s: String, i: Int): Int = {
    if (s.charAt(i) != '+') return -1
    if (i > 0 && isDigit(s.charAt(i - 1))) return -1
    val n = s.length
    var p = i + 1
    var digits = 0
    // extend over digits, or over a '-' flanked by digits on both sides
    while (p < n && (isDigit(s.charAt(p)) ||
        (s.charAt(p) == '-' && p > i + 1 && isDigit(s.charAt(p - 1)) &&
         p + 1 < n && isDigit(s.charAt(p + 1))))) {
      if (isDigit(s.charAt(p))) digits += 1
      p += 1
    }
    // the loop cannot stop mid-number (it consumes every digit it sees),
    // and a trailing '-' is never consumed (the flank condition), so p is
    // the exact exclusive end. A 16+-digit run is NOT a phone — it falls
    // through to the NUMBER matcher at the first digit.
    if (digits < 7 || digits > 15) return -1
    p
  }

  /** NUMBER: a maximal run of >= 13 digits (ID/card-like), anchored on a
    * non-digit on the left. */
  private def matchLongNumber(s: String, i: Int): Int = {
    if (!isDigit(s.charAt(i))) return -1
    if (i > 0 && isDigit(s.charAt(i - 1))) return -1
    val n = s.length
    var p = i
    while (p < n && isDigit(s.charAt(p))) p += 1
    if (p - i >= 13) p else -1
  }

  /** The scanner: null-safe at the Expression layer (nullSafeEval). */
  def redactPii(input: UTF8String): UTF8String = {
    val s = input.toString
    val n = s.length
    val out = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      var e = matchEmail(s, i)
      var token = "[EMAIL]"
      if (e < 0) { e = matchIpv4(s, i); token = "[IP]" }
      if (e < 0) { e = matchPhone(s, i); token = "[PHONE]" }
      if (e < 0) { e = matchLongNumber(s, i); token = "[NUMBER]" }
      if (e >= 0) { out.append(token); i = e }
      else { out.append(s.charAt(i)); i += 1 }
    }
    UTF8String.fromString(out.toString)
  }
}
