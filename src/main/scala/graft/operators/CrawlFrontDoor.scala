package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The crawl FRONT DOOR composed end to end — what runs between "bytes
  * arrived from the fetcher" and "text enters the curation pipeline
  * (D45/D51)": domain blocklist, robots.txt politeness, charset
  * normalization, boilerplate removal, corpus-wide paragraph dedup.
  *
  * Scale shape (the reason the composition is an operator and not five
  * gate-side joins): the three PER-ROW stages — robots evaluation,
  * charset sniff+transcode, HTML main-content extraction — FUSE into a
  * single `mapPartitions` projection over the fetch table (one scan, no
  * intermediate shuffles, no per-stage doc_id re-joins); the only
  * exchanges in the whole front door are the blocklist's broadcast
  * semi-join (corpus side never shuffles), and the paragraph dedup's
  * digest + reassembly shuffles. At 100 TB that is: one scan, one
  * broadcast, two keyed shuffles — each load-bearing, none avoidable.
  */
object CrawlFrontDoor {

  /** The fused per-row admission+extraction stage: drop rows robots
    * disallow, sniff+decode the raw bytes, extract main content. Input
    * columns: id, raw fetched bytes, robots body, crawler agent, URL
    * path. Output: (doc_id, main_text) for admitted rows. */
  def admitAndExtract(spark: SparkSession, pages: DataFrame, idCol: String,
                      rawCol: String, bodyCol: String, agentCol: String,
                      pathCol: String, minChars: Int = 25,
                      maxLinkDensityPct: Int = 33): DataFrame = {
    import spark.implicits._
    pages
      .select(col(idCol).cast("long"), col(rawCol), col(bodyCol),
        col(agentCol), col(pathCol))
      .as[(Long, Array[Byte], String, String, String)]
      .mapPartitions(_.flatMap { case (id, raw, body, agent, path) =>
        val (allowed, _) = RobotsTxt.evaluate(body, agent, path)
        if (!allowed) None
        else {
          val (_, html) = CharsetSniff.sniffDecode(raw)
          val (text, _, _) =
            HtmlExtract.extractMain(html, minChars, maxLinkDensityPct)
          Some((id, text))
        }
      })
      .toDF("doc_id", "main_text")
  }

  /** WET extraction — the Common Crawl derivation (warc.gz in, clean
    * text out): shards explode through the streaming WARC walk into
    * body-carrying records, then HTTP 200 responses decode (charset
    * ladder) and extract (boilerplate removal) in the SAME partition —
    * the explode and the per-record stages fuse into one scan, no
    * intermediate shuffle anywhere. Output: (shard_id, rec_idx,
    * target_uri, main_text, n_blocks, n_content). */
  def wetExtract(spark: SparkSession, shards: DataFrame,
                 minChars: Int = 25, maxLinkDensityPct: Int = 33,
                 allowStatus: Long = 200L): DataFrame = {
    import spark.implicits._
    WarcShard.explodeBodies(spark, shards)
      .mapPartitions(_.flatMap { r =>
        if (r.warc_type != "response" || !r.http_status.contains(allowStatus))
          None
        else {
          val (_, html) = CharsetSniff.sniffDecode(r.body)
          val (text, nb, nc) =
            HtmlExtract.extractMain(html, minChars, maxLinkDensityPct)
          Some((r.shard_id, r.rec_idx, r.target_uri.getOrElse(""),
            text, nb, nc))
        }
      })
      .toDF("shard_id", "rec_idx", "target_uri", "main_text", "n_blocks",
        "n_content")
  }

  /** The whole front door: blocklist -> (robots, charset, extract) fused
    * -> corpus-wide paragraph dedup. Output: (doc_id, cleaned_text,
    * n_kept) for documents that survive every stage with at least one
    * owned paragraph (the D57 contract). */
  def pipeline(spark: SparkSession, pages: DataFrame, idCol: String,
               hostCol: String, rawCol: String, bodyCol: String,
               agentCol: String, pathCol: String, blocklist: DataFrame,
               minChars: Int = 25, maxLinkDensityPct: Int = 33): DataFrame = {
    val unblocked = graft.functions.UrlFunctions
      .blocklistFilter(pages, idCol, hostCol, blocklist)
      .where(col("blocked") === 0L)
      .drop("blocked", "matched_domain")
    val extracted = admitAndExtract(spark, unblocked, idCol, rawCol,
      bodyCol, agentCol, pathCol, minChars, maxLinkDensityPct)
    Dedup.paragraphDedup(extracted, "doc_id", "main_text")
  }
}
