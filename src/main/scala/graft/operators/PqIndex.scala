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
    * `location/codes` and `location/codebooks`. The two tables are
    * separate transactions, so cross-table consistency comes from a
    * shared `pq.build_id` stamp: codebooks commit FIRST, codes last, and
    * [[search]] refuses to serve when the stamps disagree — a crash or
    * concurrent read between the two commits fails loudly instead of
    * silently decoding codes against the wrong centroids. Returns the
    * trained codebooks. */
  def build(spark: SparkSession, corpus: DataFrame, location: String,
            m: Int, dim: Int, k: Int, iters: Int): Seq[Array[Array[Double]]] = {
    val codebooks = Similarity.trainPqCodebooks(corpus, m, dim, k, iters)
    val buildId = java.util.UUID.randomUUID().toString
    val cbRows = for {
      (cb, s) <- codebooks.zipWithIndex
      (cent, c) <- cb.zipWithIndex
    } yield Row(s, c, cent.toSeq)
    val cbDf = spark.createDataFrame(
      java.util.Arrays.asList(cbRows: _*), CodebookSchema)
    LakeTable.ensure(spark, s"$location/codebooks", CodebookSchema)
      .write(cbDf, "replace", properties = Map("pq.build_id" -> buildId))
    val codes = Similarity.encodePq(corpus, codebooks)
    val codesTable = LakeTable.ensure(spark, s"$location/codes", codes.schema)
    codesTable.write(codes, "replace",
      properties = Map("pq.m" -> m.toString, "pq.dim" -> dim.toString,
        "pq.k" -> k.toString, "pq.build_id" -> buildId))
    codebooks
  }

  /** Read the codebooks back from the persisted index (driver-tiny),
    * with the build id they were committed under. */
  def loadCodebooks(spark: SparkSession, location: String): Seq[Array[Array[Double]]] =
    loadCodebooksStamped(spark, location)._1

  private def loadCodebooksStamped(spark: SparkSession,
                                   location: String): (Seq[Array[Array[Double]]], String) = {
    val table = LakeTable.load(spark, s"$location/codebooks")
    // One metadata read pins BOTH the stamp and the snapshot the rows come
    // from — a rebuild committing between the two would otherwise pair old
    // centroids with its new stamp (or vice versa).
    val meta = table.metadata
    val rows = table.readAt(meta.currentSnapshotId)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
    val cbs = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (_, cells) =>
      cells.sortBy(_._2).map(_._3)
    }
    (cbs, meta.properties.getOrElse("pq.build_id", ""))
  }

  /** Serve top-k from the persisted index: the coded corpus streams from
    * the lake table's manifest-backed scan; raw embeddings are never read.
    * Fails if the codes and codebook tables carry different build stamps
    * (interrupted or in-flight rebuild). */
  def search(spark: SparkSession, location: String, queries: DataFrame,
             topK: Int): DataFrame = {
    val (codebooks, cbBuild) = loadCodebooksStamped(spark, location)
    val codesTable = LakeTable.load(spark, s"$location/codes")
    // Stamp check and data scan must come from ONE metadata read: a rebuild
    // committing between them would serve new codes against the
    // already-collected old codebooks — silent wrong decode. readAt pins
    // the scan to the snapshot the stamp was read from.
    val codesMeta = codesTable.metadata
    val codesBuild = codesMeta.properties.getOrElse("pq.build_id", "")
    if (cbBuild != codesBuild)
      throw new IllegalStateException(
        s"PQ index at '$location' is inconsistent: codes build '$codesBuild' " +
          s"vs codebooks build '$cbBuild' — a rebuild is in flight or failed " +
          "between its two commits; re-run build()")
    Similarity.pqAdcSearch(codesTable.readAt(codesMeta.currentSnapshotId),
      codebooks, queries, topK)
  }
}
