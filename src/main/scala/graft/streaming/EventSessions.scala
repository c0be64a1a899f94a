package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gap-based sessionization as a STREAMING aggregation — the live form of
  * the batch lag-and-flag sessionizer (q29): `session_window` merges
  * events closer than `gap` into one growing window per user, state is
  * one open session per active user (not the events themselves), and the
  * watermark both bounds that state and decides when a session is final
  * (append mode emits a session only once the watermark passes its
  * close — late events inside the gap horizon still extend it).
  *
  * At 100 TB-scale ingest this is the right shape: state size tracks
  * ACTIVE users only, sessions finalize continuously, and the same plan
  * runs unchanged in batch (the parity the spec pins).
  */
object EventSessions {

  /** (session_start, session_end, user_id, n_events) per finalized
    * session. `events` must carry the engine's nanos `ts` column (events
    * table shape); works on both streaming and batch frames.
    */
  def sessionize(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame =
    events
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
      .withWatermark("event_time", watermark)
      .groupBy(session_window(col("event_time"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"))
}
