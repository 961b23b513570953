package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.tables.LakeTable

/** Persisted product-quantization index over the lake table layer — the
  * deploy shape of [[Similarity.pqTopK]]: train + encode ONCE, write the
  * codes (m small ints per vector, ~64x smaller than the raw embeddings)
  * and the m×k codebooks as transactional lake tables, then serve top-k
  * queries from the stored index without touching the raw corpus.
  *
  * At 100 TB this is the separation that matters: the encode pass streams
  * the corpus once and is shuffle-free; every later query wave reads only
  * the compact codes table (manifest-planned, bounds-prunable) plus the
  * driver-tiny codebook table. Rebuilds go through the same transactional
  * replace, so a serving query never sees a half-written index.
  */
object PqIndex {

  private val CodebookSchema = StructType(Seq(
    StructField("subspace", IntegerType, nullable = false),
    StructField("cell", IntegerType, nullable = false),
    StructField("c_emb", ArrayType(DoubleType), nullable = false)))

  /** Train codebooks and encode `corpus`; persist both under
    * `location/codes` and `location/codebooks` (replace semantics —
    * rebuilding an index is atomic). Returns the trained codebooks. */
  def build(spark: SparkSession, corpus: DataFrame, location: String,
            m: Int, dim: Int, k: Int, iters: Int): Seq[Array[Array[Double]]] = {
    val codebooks = Similarity.trainPqCodebooks(corpus, m, dim, k, iters)
    val codes = Similarity.encodePq(corpus, codebooks)
    val codesTable = LakeTable.ensure(spark, s"$location/codes", codes.schema)
    codesTable.write(codes, "replace",
      properties = Map("pq.m" -> m.toString, "pq.dim" -> dim.toString,
        "pq.k" -> k.toString))
    val cbRows = for {
      (cb, s) <- codebooks.zipWithIndex
      (cent, c) <- cb.zipWithIndex
    } yield Row(s, c, cent.toSeq)
    val cbDf = spark.createDataFrame(
      java.util.Arrays.asList(cbRows: _*), CodebookSchema)
    LakeTable.ensure(spark, s"$location/codebooks", CodebookSchema)
      .write(cbDf, "replace")
    codebooks
  }

  /** Read the codebooks back from the persisted index (driver-tiny). */
  def loadCodebooks(spark: SparkSession, location: String): Seq[Array[Array[Double]]] = {
    val rows = LakeTable.load(spark, s"$location/codebooks").read()
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
    rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (_, cells) =>
      cells.sortBy(_._2).map(_._3)
    }
  }

  /** Serve top-k from the persisted index: the coded corpus streams from
    * the lake table's manifest-backed scan; raw embeddings are never read. */
  def search(spark: SparkSession, location: String, queries: DataFrame,
             topK: Int): DataFrame = {
    val codebooks = loadCodebooks(spark, location)
    val encoded = LakeTable.load(spark, s"$location/codes").read()
    Similarity.pqAdcSearch(encoded, codebooks, queries, topK)
  }
}
