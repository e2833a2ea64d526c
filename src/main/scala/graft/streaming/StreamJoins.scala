package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream join: the tick stream enriched against a token-metadata
  * UPDATE stream — the streaming upgrade of the static broadcast
  * directory (ingest.TokenDirectory): when instrument metadata itself
  * arrives as events (renames, lot-size changes), the reference's
  * load-once map goes stale; a watermarked stream-stream join keeps the
  * enrichment live.
  *
  * State is bounded on both sides by the watermark + the join-window time
  * constraint (Spark drops tick state once no in-window update can still
  * arrive, and update state once no in-window tick can). A tick matches
  * every update within [tick - window, tick]; pair with a downstream
  * dedup (max_by updated_at) when exactly-one is needed.
  */
object StreamJoins {

  /** `updates` schema: (token, meta, updated_at). Left-outer: ticks with
    * no in-window update emit with null meta once the watermark closes
    * their match window. */
  def enrichWithUpdates(
      ticks: DataFrame, updates: DataFrame,
      joinWindow: String = "10 minutes",
      watermark: String = "1 minute"): DataFrame = {
    val t = ticks.withWatermark("exchange_timestamp", watermark)
    val u = updates
      .withColumnRenamed("token", "u_token")
      .withWatermark("updated_at", watermark)
    t.join(u,
        col("token") === col("u_token") &&
          col("updated_at") <= col("exchange_timestamp") &&
          col("updated_at") >= col("exchange_timestamp") - expr(s"INTERVAL $joinWindow"),
        "leftOuter")
      .drop("u_token")
  }
}
