package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gap-based sessionization over the event stream — the standard
  * user-activity grouping a training-data pipeline derives behavioral
  * documents from (and the reference's consume/stream surface has no
  * analog for; beyond-reference extension).
  *
  * Spark shape: `session_window(ts, gap)` inside a groupBy — one
  * shuffle on (user, merged-window); Catalyst's native session-window
  * merge does the island detection, so there is no per-user sort or
  * window function pass. The same expression works under Structured
  * Streaming with a watermark (state = open sessions only), which is
  * the 100 TB continuous-ingest path; the batch form here is the
  * backfill job.
  */
object Sessions {

  /** One row per (user, session): session = maximal event run where
    * consecutive gaps are < `gapMinutes`. Emits epoch-micro bounds
    * (first/last event — not the speculative window end) so results
    * compare exactly against relational oracles. */
  def sessionize(events: DataFrame, gapMinutes: Int): DataFrame =
    events.groupBy(col("user_id"),
        session_window(col("ts"), s"$gapMinutes minutes").as("w"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"))
      .select(col("user_id"),
        unix_micros(col("first_ts")).as("start_us"),
        unix_micros(col("last_ts")).as("last_us"),
        col("n_events"))
}
