package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream interval join (T7): enrich one live stream
  * with another — the canonical form is click attribution, matching each
  * click to the impression that caused it within an attribution window.
  *
  * Scale design: an unbounded stream-stream equi-join must buffer BOTH
  * streams forever; with watermarks on both sides and a join condition
  * that bounds the event-time distance, Spark derives how long each
  * side's state can possibly matter and evicts it as the watermark
  * advances — state stays bounded by (rate x window), independent of
  * stream lifetime. Left-outer emits unmatched left rows only once the
  * watermark proves no match can still arrive (same eviction machinery).
  */
object StreamJoin {

  /** Join `clicks` to the `impressions` that caused them: equal `imp_id`,
    * click within `[imp_ts, imp_ts + withinSeconds]`. Column contract:
    * impressions(imp_id, user_id, imp_ts), clicks(click_id, imp_id,
    * click_ts). `joinType` "inner" (attributed clicks only) or
    * "left_outer" (every impression, null click columns when none arrived
    * in the window — emitted once the watermark closes the window). */
  def attributedClicks(impressions: DataFrame, clicks: DataFrame,
                       withinSeconds: Long,
                       impressionLateness: String = "0 seconds",
                       clickLateness: String = "0 seconds",
                       joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left_outer",
      s"Stream-stream attribution supports inner or left_outer, got '$joinType'")
    val imp = impressions.withWatermark("imp_ts", impressionLateness)
    val clk = clicks
      .withColumnRenamed("imp_id", "click_imp_id")
      .withWatermark("click_ts", clickLateness)
    imp.join(clk,
        col("imp_id") === col("click_imp_id") &&
          col("click_ts") >= col("imp_ts") &&
          col("click_ts") <= col("imp_ts") +
            expr(s"INTERVAL $withinSeconds SECONDS"),
        joinType)
      .select(col("imp_id"), col("user_id"), col("imp_ts"),
        col("click_id"), col("click_ts"))
  }
}
