package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact-substring duplicate-span detection — the Lee et al. 2022
  * ("Deduplicating Training Data Makes Language Models Better",
  * ExactSubstr) corpus operation: find every position whose length-L
  * character substring occurs more than once ANYWHERE in the corpus, merge
  * the hits into maximal per-document spans, and report (or cut) them.
  * This is the exact complement of the approximate detectors already in
  * the suite (winnowing D8/D10 fingerprints, MinHash D2): those sample;
  * this one misses nothing of length >= L.
  *
  * Semantics: position p (1-based) in doc d is DUPLICATED iff
  * text_d[p, p+L) equals the length-L substring at some other (doc, pos)
  * != (d, p) — within-doc repeats count, exactly as in the paper (their
  * suffix array is over the corpus concatenation). Overlapping or abutting
  * duplicated positions merge into one span (a run of duplicated text of
  * any length >= L becomes one span, the paper's maximal match).
  *
  * Plan shape (the 100 TB story): exact substring dedup is inherently
  * O(total characters) — the suffix-array formulation is too. The
  * scale-critical choices here are about SHUFFLE WIDTH and exactness:
  *
  *  1. One codegen kernel emits (position, 64-bit polynomial hash) pairs
  *     in-row (`graft_char_gram_hashes`), so the corpus-wide first shuffle
  *     carries 8-byte hashes, never L-byte substrings.
  *  2. A groupBy(hash) count finds hash buckets with >= 2 members; the
  *     position stream is semi-joined to those keys. At realistic L
  *     (20-50 chars) the overwhelming majority of positions are unique and
  *     never travel again — the candidate set is the duplicated tail plus
  *     a ~(positions^2 / 2e18) sliver of hash collisions.
  *  3. Candidates alone rejoin their document text and regroup by the RAW
  *     substring; occurrence counts >= 2 there are exact, so a mod-P hash
  *     collision can only add a candidate that stage 3 rejects — the
  *     operator's output is collision-independent (and the SQL oracle
  *     verifies it from raw substrings only).
  *  4. Span merge is a per-document lag/running-sum island walk (windows
  *     partitioned by doc_id — bounded by document length, never by
  *     corpus size). No collect, no cartesian, no corpus-wide window.
  *
  * Because every interval has the same length L, interval merge reduces to
  * the sorted-starts rule `new span iff p - prev_p > L`, which both engines
  * express with one lag window.
  */
object ExactSubstr {

  /** Per-document duplicate-span report.
    *
    * @param docs   (idCol: long, textCol: string)
    * @param minLen L — the minimum duplicated-substring length detected;
    *               every duplicated run of length >= L is found in full
    * @return one row per input document:
    *         (doc_id, n_positions, n_dup_positions, n_spans, chars_dup,
    *         clean_len) where chars_dup is the total character count
    *         covered by merged duplicate spans and clean_len =
    *         length(text) - chars_dup (the post-cut size)
    */
  def dupSpanStats(docs: DataFrame, idCol: String, textCol: String,
                   minLen: Int): DataFrame = {
    val spans = dupSpans(docs, idCol, textCol, minLen)
    val perDoc = spans.groupBy(col("doc_id")).agg(
      count(lit(1)).as("n_spans"),
      sum(col("n_positions")).as("n_dup_positions"),
      sum(col("span_end") - col("span_start")).as("chars_dup"))
    docs.select(col(idCol).as("doc_id"),
        greatest(length(col(textCol)) - minLen + 1, lit(0))
          .cast("long").as("n_positions"),
        length(col(textCol)).cast("long").as("len"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_positions"),
        coalesce(col("n_dup_positions"), lit(0L)).as("n_dup_positions"),
        coalesce(col("n_spans"), lit(0L)).cast("long").as("n_spans"),
        coalesce(col("chars_dup"), lit(0L)).as("chars_dup"),
        (col("len") - coalesce(col("chars_dup"), lit(0L))).as("clean_len"))
  }

  /** Merged maximal duplicate spans, one row per span:
    * (doc_id, span_start (1-based, inclusive), span_end (exclusive),
    * n_positions — duplicated L-gram starts merged into the span). */
  def dupSpans(docs: DataFrame, idCol: String, textCol: String,
               minLen: Int): DataFrame = {
    val d = docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))

    // stage 1: corpus-wide (doc, pos, hash) stream — 8-byte shuffle width
    val pos = d
      .select(col("doc_id"),
        posexplode(expr(s"graft_char_gram_hashes(text, $minLen)"))
          .as(Seq("p0", "h")))
      .select(col("doc_id"), (col("p0") + 1).cast("long").as("p"), col("h"))

    // stage 2: hash buckets with company — the df-cap groupBy pattern,
    // never a window over corpus-ordered data
    val dupHashes = pos.groupBy(col("h"))
      .agg(count(lit(1)).as("hc"))
      .where(col("hc") >= 2)
      .select("h")
    val cand = pos.join(dupHashes, Seq("h"), "left_semi")

    // stage 3: candidates rejoin their text, regroup by the raw substring —
    // exact occurrence counts; collisions die here
    val candGram = cand
      .join(d, Seq("doc_id"))
      .select(col("doc_id"), col("p"),
        expr(s"substring(text, p, $minLen)").as("gram"))
    val occ = candGram.groupBy(col("gram"))
      .agg(count(lit(1)).as("occ"))
      .where(col("occ") >= 2)
      .select("gram")
    val dup = candGram.join(occ, Seq("gram"), "left_semi")
      .select("doc_id", "p")

    // stage 4: per-doc island merge (equal-length intervals: new span
    // starts when the gap from the previous duplicated start exceeds L)
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("p"))
    val marked = dup.withColumn("brk",
      when(col("p") - lag(col("p"), 1).over(byDoc) <= minLen, 0).otherwise(1))
    val withSpan = marked.withColumn("sid",
      sum(col("brk")).over(byDoc.rowsBetween(Window.unboundedPreceding, 0)))
    withSpan.groupBy(col("doc_id"), col("sid"))
      .agg(min(col("p")).as("span_start"),
        (max(col("p")) + minLen).as("span_end"),
        count(lit(1)).as("n_positions"))
      .drop("sid")
  }

  /** The cut operation: remove every duplicate span from the text.
    * Re-assembles the kept segments per document; span lists are bounded
    * by document length (collect_list per doc, never per corpus). */
  def removeDupSpans(docs: DataFrame, idCol: String, textCol: String,
                     minLen: Int): DataFrame = {
    val d = docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))
    val spans = dupSpans(docs, idCol, textCol, minLen)
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("span_start"), col("span_end"))))
        .as("spans"))
    d.join(spans, Seq("doc_id"), "left")
      .withColumn("clean_text",
        when(col("spans").isNull, col("text")).otherwise(
          // fold kept segments: aggregate over spans with (cursor, acc)
          expr("""aggregate(spans,
                    named_struct('cur', 1L, 'acc', ''),
                    (st, sp) -> named_struct(
                      'cur', sp.span_end,
                      'acc', concat(st.acc, substring(text, cast(st.cur as int),
                        cast(sp.span_start - st.cur as int)))),
                    st -> concat(st.acc, substring(text, cast(st.cur as int),
                      length(text) - cast(st.cur as int) + 1)))""")))
      .select(col("doc_id"), col("clean_text"))
  }
}
