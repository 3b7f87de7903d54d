package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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

  case class UserCount(user_id: Long, events: Long, total_value: Double)

  /** Custom keyed state via `mapGroupsWithState` (SURVEY §2.10 stateful
    * path): a per-user running (count, value-sum) updated per micro-batch.
    * Update output mode emits the refreshed row per key per batch.
    */
  def statefulUserCounts(events: DataFrame): Dataset[UserCount] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.selectExpr("user_id", "value").as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Double)], state: GroupState[(Long, Double)]) =>
          val (n0, v0) = state.getOption.getOrElse((0L, 0.0))
          var n = n0; var v = v0
          rows.foreach { r => n += 1; v += r._2 }
          state.update((n, v))
          UserCount(user, n, v)
      }
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
