package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming façade over the events schema — an extension
  * beyond the reference, which is batch-only (SURVEY.md §2.10: no
  * watermarks/state store anywhere in its tree; its "streaming" means
  * pipelined execution). The same transforms work in batch mode, which
  * is how the oracle checks them; in streaming mode add `readStream` +
  * these functions + `writeStream`.
  */
object StreamingFacade {

  /** Tumbling-window counts with event-time watermarking (streaming) or
    * plain windowed aggregation (batch) — works on either DataFrame kind.
    */
  def tumblingCounts(events: DataFrame, windowLen: String = "1 hour",
                     watermark: String = "10 minutes"): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", watermark) else events
    src.groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(avg(col("value")), 6).as("avg_value"))
      .select(col("w.start").as("bucket"), col("event_type"), col("n"), col("avg_value"))
  }

  /** Gap-based session aggregation via `session_window` (30-minute gap).
    * In streaming mode this is incremental session state; in batch it is
    * equivalent to lag-gap sessionization.
    */
  def sessionStats(events: DataFrame, gap: String = "30 minutes",
                   watermark: String = "10 minutes"): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", watermark) else events
    src.groupBy(session_window(col("ts"), gap).as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n"), min(col("ts")).as("start_ts"))
  }
}
