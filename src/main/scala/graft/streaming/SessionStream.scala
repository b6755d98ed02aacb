package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming gap sessionization — the ingest-time form of the batch
  * `w8_session_window` catalog query, built on the engine's native
  * MERGING session-window aggregation (`session_window`): an open
  * session is state, a new event within `gap` of the session's current
  * close extends it (micro-batch boundaries included — two halves of a
  * session arriving in different triggers merge in the state store),
  * and append mode emits a session exactly once, after the watermark
  * passes its close.
  *
  * State design: one state row per OPEN session per key — bounded by
  * the number of concurrently-active keys, never by history, and
  * evicted at emission. This is the streaming-legal form of gap
  * sessionization: the lag+cumsum composition (`w4_gap_sessions`,
  * `CycleDetection.sessionizeByGap`) needs an unbounded ordered window
  * and cannot run on a stream at all.
  *
  * Boundary semantics (shared with `w8_session_window`, pinned in
  * SessionStreamSpec): touching windows MERGE — the engine coalesces
  * sessions on `start <= currentEnd`, so an event arriving at EXACTLY
  * `gap` after the previous one extends the session. That is the same
  * boundary as the w4 composition's strict-`>` test: the native
  * operator and the lag+cumsum form produce identical sessions, and
  * the w8 oracle is w4's SQL re-keyed by bounds.
  */
object SessionStream {

  /** Per-session bounds/size/duration per key, emitted on session close.
    *
    * Output columns: `<keyCol>, s_ts, e_ts, n_events, duration_us` —
    * `s_ts`/`e_ts` are the observed min/max event times (NOT the
    * gap-padded window end the engine tracks internally), `duration_us`
    * their integer-microsecond difference, matching the batch twin and
    * the `w8_session_window` oracle expression.
    */
  def gapSessions(stream: DataFrame, keyCol: String, tsCol: String,
      gap: String, watermarkDelay: String): DataFrame =
    stream
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(col(keyCol), session_window(col(tsCol), gap))
      .agg(min(tsCol).as("s_ts"), max(tsCol).as("e_ts"),
        count(lit(1)).as("n_events"))
      .select(col(keyCol), col("s_ts"), col("e_ts"), col("n_events"),
        (unix_micros(col("e_ts")) - unix_micros(col("s_ts")))
          .as("duration_us"))

  /** Batch twin: the identical aggregation over a static frame (the
    * same code path minus the watermark — `session_window` is
    * mode-agnostic), so stream ≡ batch is an equality of outputs, not
    * of two reimplementations. */
  def gapSessionsBatch(df: DataFrame, keyCol: String, tsCol: String,
      gap: String): DataFrame =
    df.groupBy(col(keyCol), session_window(col(tsCol), gap))
      .agg(min(tsCol).as("s_ts"), max(tsCol).as("e_ts"),
        count(lit(1)).as("n_events"))
      .select(col(keyCol), col("s_ts"), col("e_ts"), col("n_events"),
        (unix_micros(col("e_ts")) - unix_micros(col("s_ts")))
          .as("duration_us"))
}
