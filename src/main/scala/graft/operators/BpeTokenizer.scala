package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer — REAL merge learning and encoding, the
  * token-budgeting primitive a training-data pipeline prices documents
  * with (the existing d13/d21 token counts are whitespace/regex level;
  * this is the subword layer).
  *
  * Training is the classic word-level BPE (Sennrich et al. 2016,
  * variant without an end-of-word marker, documented): the ONLY
  * data-sized pass is one distributed word count (explode + groupBy —
  * one shuffle); the merge loop then runs over the top-V word-frequency
  * table (V bounded, default 50k — standard practice; the tail carries
  * negligible pair mass), so its cost is k x V regardless of corpus
  * size. At 100 TB: one shuffle over the corpus, a bounded collect
  * (~V rows), k driver iterations, and a broadcast of the learned merge
  * ranks back out for encoding.
  *
  * Encoding is the standard greedy lowest-rank-pair loop per word,
  * applied map-side under the broadcast rank table — no shuffle.
  */
object BpeTokenizer {

  /** One learned merge, rank-ordered (rank 0 applied most eagerly). */
  final case class Merge(rank: Int, left: String, right: String)

  /** Learn `numMerges` merges from the corpus. One distributed shuffle
    * (word count), then a driver loop over the top-`topWords` table.
    * Deterministic: pair ties break lexicographically. */
  def learnMerges(df: DataFrame, textCol: String, numMerges: Int,
                  topWords: Int = 50000): Seq[Merge] = {
    val words = df
      .select(explode(split(lower(col(textCol)), "\\s+")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").count()
      .orderBy(col("count").desc, col("w"))
      .limit(topWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    learnFromCounts(words, numMerges)
  }

  /** The merge loop itself (driver-side over the bounded vocab table) —
    * exposed for spec-level hand-checked corpora. */
  def learnFromCounts(wordCounts: Seq[(String, Long)],
                      numMerges: Int): Seq[Merge] = {
    var words: Array[(Array[String], Long)] =
      wordCounts.map { case (w, c) => (w.map(_.toString).toArray, c) }.toArray
    val merges = Seq.newBuilder[Merge]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      val pairCounts = new java.util.HashMap[(String, String), Long]()
      for ((syms, c) <- words; i <- 0 until syms.length - 1) {
        val k = (syms(i), syms(i + 1))
        pairCounts.merge(k, c, (a, b) => a + b)
      }
      if (pairCounts.isEmpty) done = true
      else {
        var best: ((String, String), Long) = null
        val it = pairCounts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val cand = (e.getKey, e.getValue)
          if (best == null || cand._2 > best._2 ||
              (cand._2 == best._2 &&
               (cand._1._1 < best._1._1 ||
                (cand._1._1 == best._1._1 && cand._1._2 < best._1._2))))
            best = cand
        }
        val (l, r) = best._1
        merges += Merge(rank, l, r)
        val fused = l + r
        words = words.map { case (syms, c) =>
          val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              out += fused; i += 2
            } else { out += syms(i); i += 1 }
          }
          (out.toArray, c)
        }
        rank += 1
      }
    }
    merges.result()
  }

  /** Greedy BPE encode of one word under the rank table: repeatedly
    * merge the LOWEST-rank adjacent pair (the standard priority
    * semantics — a later-learned merge never preempts an earlier one). */
  def encodeWord(word: String, ranks: Map[(String, String), Int]): Array[String] = {
    var syms: Array[String] = word.map(_.toString).toArray
    var changed = true
    while (changed && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var i = 0
      while (i < syms.length - 1) {
        ranks.get((syms(i), syms(i + 1))).foreach { r =>
          if (r < bestRank) { bestRank = r; bestAt = i }
        }
        i += 1
      }
      if (bestAt < 0) changed = false
      else {
        val fused = syms(bestAt) + syms(bestAt + 1)
        val l = syms(bestAt); val r = syms(bestAt + 1)
        // merge ALL occurrences of this pair (left to right)
        val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
        var j = 0
        while (j < syms.length) {
          if (j + 1 < syms.length && syms(j) == l && syms(j + 1) == r) {
            out += fused; j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out.toArray
      }
    }
    syms
  }

  /** Per-row BPE facts: subword tokens and counts. */
  final case class BpeStats(doc_id: Long, n_words: Long, n_bpe_tokens: Long)

  /** Map-side encode under broadcast merge ranks: one row per document
    * with word and subword-token counts — the length-budgeting numbers a
    * pipeline prices samples with. No shuffle (plan-lockable). */
  def encodeStats(spark: SparkSession, df: DataFrame, idCol: String,
                  textCol: String, merges: Seq[Merge]): Dataset[BpeStats] = {
    import spark.implicits._
    val ranks = merges.map(m => ((m.left, m.right), m.rank)).toMap
    val bc = spark.sparkContext.broadcast(ranks)
    df.select(col(idCol).cast("long"), lower(col(textCol)))
      .as[(Long, String)]
      .mapPartitions { it =>
        val r = bc.value
        it.map { case (id, text) =>
          var nWords = 0L
          var nToks = 0L
          if (text != null) {
            for (w <- text.split("\\s+") if w.nonEmpty) {
              nWords += 1
              nToks += encodeWord(w, r).length
            }
          }
          BpeStats(id, nWords, nToks)
        }
      }
  }
}
