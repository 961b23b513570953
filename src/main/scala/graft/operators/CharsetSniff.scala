package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Charset detection + transcoding — the encoding-normalization front
  * door of a crawl pipeline: raw fetched bytes arrive in whatever
  * encoding the origin served, and EVERYTHING downstream (tokenizing,
  * hashing, dedup — all keyed on text bytes) silently breaks if two
  * encodings of the same text survive as different strings.
  *
  * Detection ladder (deterministic, no statistical guessing):
  *   1. BOM: UTF-8 (EF BB BF), UTF-16LE (FF FE), UTF-16BE (FE FF) —
  *      the only self-declaring encodings; BOM is stripped on decode.
  *   2. strict UTF-8 validation walk (RFC 3629: no overlongs, no
  *      surrogates, no 5/6-byte forms, U+10FFFF cap) — a valid UTF-8
  *      byte stream IS UTF-8 for pipeline purposes.
  *   3. ISO-8859-1 fallback — total (every byte sequence is valid
  *      Latin-1), which makes the ladder a TOTAL function: no input
  *      throws, no input is dropped, the worst case is a mojibake
  *      classification a quality filter can score later.
  *
  * BOM-less UTF-16 is NOT guessed (a 50%-wrong coin flip on short
  * inputs); such bytes classify as latin1 honestly.
  *
  * Scale shape: a pure per-row byte walk inside `mapPartitions` — no
  * shuffle, no allocation beyond the decoded string; runs at scan speed
  * on 100 TB of fetched bodies.
  */
object CharsetSniff {

  /** One decoded row: detected charset label, text transcoded to a JVM
    * string (= UTF-8 downstream), decoded char count. */
  final case class Decoded(doc_id: Long, charset: String, text_utf8: String,
                           n_chars: Long)

  /** Strict RFC 3629 validation: overlongs, surrogates, >U+10FFFF and
    * truncated tails all reject. */
  def isValidUtf8(b: Array[Byte], off: Int): Boolean = {
    var i = off
    val n = b.length
    while (i < n) {
      val c = b(i) & 0xff
      if (c < 0x80) i += 1
      else if (c < 0xc2) return false // continuation byte or overlong C0/C1
      else if (c < 0xe0) { // 2-byte
        if (i + 1 >= n || (b(i + 1) & 0xc0) != 0x80) return false
        i += 2
      } else if (c < 0xf0) { // 3-byte
        if (i + 2 >= n) return false
        val c1 = b(i + 1) & 0xff
        if ((c1 & 0xc0) != 0x80 || (b(i + 2) & 0xc0) != 0x80) return false
        if (c == 0xe0 && c1 < 0xa0) return false // overlong
        if (c == 0xed && c1 >= 0xa0) return false // surrogate range
        i += 3
      } else if (c < 0xf5) { // 4-byte
        if (i + 3 >= n) return false
        val c1 = b(i + 1) & 0xff
        if ((c1 & 0xc0) != 0x80 || (b(i + 2) & 0xc0) != 0x80 ||
            (b(i + 3) & 0xc0) != 0x80) return false
        if (c == 0xf0 && c1 < 0x90) return false // overlong
        if (c == 0xf4 && c1 >= 0x90) return false // > U+10FFFF
        i += 4
      } else return false // F5..FF never valid
    }
    true
  }

  /** Detect + decode one document's bytes; total (never throws, never
    * None). Returns (charset label, decoded string). */
  def sniffDecode(bytes: Array[Byte]): (String, String) = {
    if (bytes == null || bytes.length == 0) return ("empty", "")
    val n = bytes.length
    if (n >= 3 && (bytes(0) & 0xff) == 0xef && (bytes(1) & 0xff) == 0xbb &&
        (bytes(2) & 0xff) == 0xbf)
      return ("utf8-bom", new String(bytes, 3, n - 3,
        java.nio.charset.StandardCharsets.UTF_8))
    if (n >= 2 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xfe)
      return ("utf16le-bom", new String(bytes, 2, n - 2,
        java.nio.charset.StandardCharsets.UTF_16LE))
    if (n >= 2 && (bytes(0) & 0xff) == 0xfe && (bytes(1) & 0xff) == 0xff)
      return ("utf16be-bom", new String(bytes, 2, n - 2,
        java.nio.charset.StandardCharsets.UTF_16BE))
    if (isValidUtf8(bytes, 0))
      return ("utf8", new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
    ("latin1", new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1))
  }

  /** Partition-parallel detect+transcode of (doc_id, raw binary) rows. */
  def decodeDocs(spark: SparkSession, docs: DataFrame, idCol: String,
                 bytesCol: String): Dataset[Decoded] = {
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val (cs, text) = sniffDecode(bytes)
        Decoded(id, cs, text, text.length.toLong)
      })
  }
}
