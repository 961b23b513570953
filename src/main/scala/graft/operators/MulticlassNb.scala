package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-class quantized Naive Bayes — the many-label sibling of the
  * binary quality gate ([[NbClassifier]]): language identification over
  * the observed language set, domain classification over source buckets,
  * topic routing — the "which of K is this document" stage (CLD-style
  * lang-id, corpus domain tagging) where the binary log-odds form does
  * not apply.
  *
  * Quantization stance (the d37/d40 exactness contract): every count
  * enters through its integer bit-length `flog2(c) = length(bin(c)) - 1`.
  * A document's score for class c is
  *
  *   bits(d, c) = flog2(n_c)                         (prior)
  *              + Σ_occurrences [flog2(cnt(w,c) + 1) - flog2(t_c)]
  *
  * (+1 Laplace smoothing; t_c = class token total; a token unseen in
  * class c contributes -flog2(t_c), the smoothed floor) — floor-log2
  * multinomial NB per class, argmax with the smallest-label tie-break,
  * all integer-exact so the SQL oracle restates it verbatim.
  *
  * Plan shape (the 100 TB story): training is ONE explode+groupBy to the
  * (w, class) count table (vocab x K rows, map-side combined); the class
  * roster (t_c, n_c — K rows) broadcasts.
  * Scoring explodes each occurrence across the K classes (K is small by
  * contract — languages, domains), left-joins the count table, and one
  * groupBy(doc, class) sum + a per-doc argmax over K rows finishes. No
  * window ever holds more than K rows per document.
  */
object MulticlassNb {

  private def flog2(c: Column): Column = NbClassifier.flog2(c)

  /** Classify every doc: (doc_id, is_train, n_tokens, predicted, best_bits)
    * where `predicted` is the argmax class label (ties -> smallest label).
    * `labelCol` must be a string class label, non-null on training docs. */
  def classify(docs: DataFrame, idCol: String, tokensCol: String,
               labelCol: String, isTrain: Column,
               cacheHook: DataFrame => DataFrame = identity): DataFrame = {
    val d = docs.select(col(idCol).as("doc_id"),
      col(tokensCol).as("tokens"), col(labelCol).as("cls"),
      isTrain.cast("boolean").as("is_train"))
    val occ = d.select(col("doc_id"), col("cls"), col("is_train"),
      explode(col("tokens")).as("w"))
    val trainOcc = occ.where(col("is_train"))
    // The hook owns the (vocab x K, bounded) count table: training is ONE
    // explode+groupBy over the occurrences — the class token totals tc
    // derive from it as sum(cnt) (the same number as counting trainOcc
    // per class, which used to tokenize the whole training slice a
    // second time), and the scoring join reads the same cached table.
    val counts = cacheHook(
      trainOcc.groupBy("w", "cls").agg(count(lit(1)).as("cnt")))
    // class roster: K rows (token totals + doc counts per class),
    // broadcast to both scoring joins; nc's scan never needs the tokens
    // column (pruned away)
    val roster = cacheHook(
      counts.groupBy("cls").agg(sum("cnt").as("tc"))
        .join(d.where(col("is_train")).groupBy("cls")
          .agg(count(lit(1)).as("nc")), "cls"))
    // fail fast on an empty training slice, but cheaply: probe one row
    // (the probe warms the hook-owned count table both broadcasts read)
    require(!roster.limit(1).isEmpty,
      "multi-class NB needs a non-empty training slice (isTrain matched no docs)")
    val classes = broadcast(roster)
    // per-occurrence, per-class quantized bits
    val perOcc = occ.select(col("doc_id"), col("w"))
      .crossJoin(classes.select(col("cls"), col("tc")))
      .join(counts, Seq("w", "cls"), "left")
      .select(col("doc_id"), col("cls"),
        (flog2(coalesce(col("cnt"), lit(0L)) + 1L) - flog2(col("tc")))
          .cast("long").as("b"))
    val perDocClass = perOcc.groupBy("doc_id", "cls")
      .agg(count(lit(1)).as("n_tokens"), sum("b").as("tb"))
    val scoredAll = d.select(col("doc_id"))
      .crossJoin(classes.select(col("cls"), col("nc")))
      .join(perDocClass, Seq("doc_id", "cls"), "left")
      .select(col("doc_id"), col("cls"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        (coalesce(col("tb"), lit(0L)) + flog2(col("nc")).cast("long"))
          .as("bits"))
    // argmax over K rows per doc (bounded window)
    val w = Window.partitionBy("doc_id")
      .orderBy(col("bits").desc, col("cls").asc)
    val best = scoredAll.withColumn("rk", row_number().over(w))
      .where(col("rk") === 1)
      .select(col("doc_id"), col("cls").as("predicted"),
        col("n_tokens"), col("bits").as("best_bits"))
    d.select(col("doc_id"), col("is_train").cast("long").as("is_train"))
      .join(best, "doc_id")
      .select("doc_id", "is_train", "n_tokens", "predicted", "best_bits")
  }
}
