package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.tables.LakeTable

/** Persisted MinHash-LSH text index over the lake table layer — the deploy
  * shape of [[Dedup.buildLshIndex]]: compute the capped band keys and the
  * per-doc sorted shingle-hash sets ONCE over the indexed corpus, write
  * both as transactional lake tables, and probe every incoming batch
  * against the stored tables (the daily-ingest / admission-gate flow,
  * [[Dedup.incrementalNearDup]] and the T6 streaming gate, without keeping
  * the index resident or recomputing it per run).
  *
  * At 100 TB: the band table is ~25 short rows per document and the
  * shingle-set table one array row per document — both manifest-planned,
  * and the probe join touches only band-key matches. Cross-table
  * consistency uses the same build-stamp discipline as [[PqIndex]]:
  * bands commit first, sets last, probe refuses mismatched stamps. */
object LshIndex {

  def build(spark: SparkSession, indexed: DataFrame, location: String,
            idCol: String, textCol: String,
            maxBandBucket: Int = Dedup.DefaultMaxBandBucket): Unit = {
    val (bands, shs) = Dedup.buildLshIndex(indexed, idCol, textCol, maxBandBucket)
    try {
      val buildId = java.util.UUID.randomUUID().toString
      LakeTable.ensure(spark, s"$location/bands", bands.schema)
        .write(bands, "replace", properties = Map("lsh.build_id" -> buildId))
      LakeTable.ensure(spark, s"$location/shingles", shs.schema)
        .write(shs, "replace",
          properties = Map("lsh.build_id" -> buildId,
            "lsh.max_band_bucket" -> maxBandBucket.toString))
    } finally {
      bands.unpersist()
      shs.unpersist()
    }
  }

  /** Probe a batch of incoming docs against the stored index: one row per
    * matched new doc `(doc_id, n_matches, best_jaccard_e6)` — identical
    * output to [[Dedup.probeLshIndex]] over a resident index. */
  def probe(spark: SparkSession, location: String, batch: DataFrame,
            idCol: String, textCol: String,
            thresholdNum: Int = 4, thresholdDen: Int = 5): DataFrame = {
    val bandsTable = LakeTable.load(spark, s"$location/bands")
    val shsTable = LakeTable.load(spark, s"$location/shingles")
    // One metadata read per table pins stamp + snapshot together; the scans
    // below go through readAt so a rebuild landing mid-probe cannot pair
    // old bands with new shingle sets (see PqIndex.search).
    val bandsMeta = bandsTable.metadata
    val shsMeta = shsTable.metadata
    val b1 = bandsMeta.properties.getOrElse("lsh.build_id", "")
    val b2 = shsMeta.properties.getOrElse("lsh.build_id", "")
    if (b1 != b2)
      throw new IllegalStateException(
        s"LSH index at '$location' is inconsistent: bands build '$b1' vs " +
          s"shingles build '$b2' — a rebuild is in flight or failed between " +
          "its two commits; re-run build()")
    Dedup.probeLshIndex(batch, idCol, textCol,
      bandsTable.readAt(bandsMeta.currentSnapshotId),
      shsTable.readAt(shsMeta.currentSnapshotId), thresholdNum, thresholdDen)
  }
}
