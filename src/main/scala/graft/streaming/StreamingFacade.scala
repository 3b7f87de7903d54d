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

  case class ClosedSession(user_id: Long, start_micros: Long, end_micros: Long, n: Long)

  /** Custom-state sessionization via `flatMapGroupsWithState` + event-time
    * timeout — the fully-general stateful path (arbitrary per-key state,
    * the shape `session_window` can't express: custom close rules,
    * session-local aggregates, side outputs). Emits a session when a
    * later in-key event exceeds the gap, and closes the FINAL open
    * session through the event-time timeout once the watermark passes
    * `end + gap` — no sentinel input needed. Mirrors the batch lag-gap
    * sessionization (`events_sessionize_lag`), which is its differential
    * oracle in `StreamingSpec`.
    */
  def sessionizeWithState(events: DataFrame,
                          gapMinutes: Long = 30): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMicros = gapMinutes * 60L * 1000000L
    // the watermark-tagged TIMESTAMP column must reach the stateful
    // operator itself (UnsupportedOperationChecker rejects event-time
    // timeout otherwise) — carry ts as java.time.Instant (µs-exact) and
    // convert inside the function
    events
      .withWatermark("ts", "10 minutes")
      .select(col("user_id"), col("ts")).as[(Long, java.time.Instant)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Long), ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        // state = (start, end, n) of the open session, a primitive tuple
        // (tuple encoders stay inside codegen; a nested case class does not)
        (user: Long, raw: Iterator[(Long, java.time.Instant)],
         state: GroupState[(Long, Long, Long)]) =>
          if (state.hasTimedOut) {
            // watermark passed end+gap: the open session can never extend
            val (st, en, n) = state.get
            state.remove()
            Iterator.single(ClosedSession(user, st, en, n))
          } else {
            // micro-batch delivery order is not event-time order: treat the
            // open session plus every batch event as intervals, sort by
            // start, and gap-merge. The LAST merged interval stays open;
            // earlier ones close eagerly (exact when stragglers stay
            // within one gap of the open session — the usual
            // watermark<gap contract; later-batch stragglers older than
            // an already-emitted session would re-open it, which append
            // mode cannot express).
            val intervals = (state.getOption.toSeq ++ raw.map { case (_, i) =>
              val t = i.getEpochSecond * 1000000L + i.getNano / 1000L
              (t, t, 1L)
            }).sortBy(iv => (iv._1, iv._2))
            val merged = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
            intervals.foreach { iv =>
              merged.lastOption match {
                case Some((st, en, n)) if iv._1 - en <= gapMicros =>
                  merged(merged.length - 1) = (st, math.max(en, iv._2), n + iv._3)
                case _ => merged += iv
              }
            }
            val closed = merged.dropRight(1).map { case (st, en, n) =>
              ClosedSession(user, st, en, n)
            }
            if (merged.nonEmpty) {
              val open = merged.last
              state.update(open)
              state.setTimeoutTimestamp((open._2 + gapMicros) / 1000L + 1L)
            }
            closed.iterator
          }
      }
  }
}
