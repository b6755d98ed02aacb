package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DateType

/** Hourly machine summary: cycle stats + conditional force stats + per-rule
  * error counts, outer-joined and zero-filled.
  *
  * Re-expresses `src/daily_aggregator.py:193-265` with identical semantics,
  * including the two parity quirks documented in SURVEY §7.4:
  *   - events are bucketed to the hour of their cycle's *start* timestamp
  *     (`:207-214`), not their own timestamp;
  *   - `fillna(0)` after the full-outer join zero-fills the avg/min/max
  *     columns too (`:238-243`), so an hour with cycles but no force
  *     readings reports 0.0 averages, not NULL.
  *
  * Scale: both aggregations shuffle once on (summary_date, hour_of_day,
  * machine_id); partial aggregation (map-side combine) is automatic for
  * avg/min/max/sum. `countDistinct("cycle_seq")` (`:201`) is kept for parity
  * — its input already has one row per cycle so it costs the same as count.
  * The final join is tiny (<= 24 rows/machine/day) — AQE broadcasts it.
  */
object HourlyRollup {

  private val zeroFillCols = Seq(
    "cycle_count", "avg_cycle_time_seconds", "min_cycle_time_seconds", "max_cycle_time_seconds",
    "avg_pick_force", "max_pick_force", "min_pick_force",
    "avg_place_force", "max_place_force", "min_place_force",
    "as_vacuum_error_count", "pp_vacuum_error_count", "as_release_error_count",
    "pp_release_error_count", "pick_force_error_count", "place_force_error_count",
    "total_error_count")

  private def withHourBucket(df: DataFrame): DataFrame = df
    // date_format(..).cast(date) in the reference (`:194`); to_date is the
    // same result under the UTC session timezone.
    .withColumn("summary_date", date_format(col("cycle_start_ts"), "yyyy-MM-dd").cast(DateType))
    .withColumn("hour_of_day", hour(col("cycle_start_ts")))
    .filter(col("summary_date").isNotNull)

  /** Cycle-side hourly stats (`daily_aggregator.py:193-205`).
    *
    * `approxDistinct` swaps the exact `countDistinct` for HLL++
    * (`approx_count_distinct`, rsd 1%) — the 100 TB opt-in when the
    * distinct key set per group is itself huge. Off by default: the input
    * here has one row per cycle, so exact counting costs the same as
    * `count(*)` and stays reference-faithful.
    */
  def cycleSummary(cycleTimes: DataFrame, approxDistinct: Boolean = false): DataFrame =
    withHourBucket(cycleTimes)
      .groupBy("summary_date", "hour_of_day", "machine_id")
      .agg(
        (if (approxDistinct) approx_count_distinct("cycle_seq", 0.01)
         else countDistinct("cycle_seq")).as("cycle_count"),
        avg("cycle_time_seconds").as("avg_cycle_time_seconds"),
        min("cycle_time_seconds").as("min_cycle_time_seconds"),
        max("cycle_time_seconds").as("max_cycle_time_seconds"))

  /** Event-side hourly stats: conditional (filtered) force aggregates and
    * per-rule error counters (`daily_aggregator.py:207-232`). Aggregates over
    * `when(cond, value)` skip the NULLs produced by non-matching rows — a
    * manual pivot with no extra pass over the data.
    */
  def eventSummary(flaggedEvents: DataFrame, cycleTimes: DataFrame): DataFrame = {
    // No broadcast hint here on purpose: cycle_times grows linearly with
    // the input (one row per cycle ≈ 1/8th of events), so a forced
    // broadcast would hard-fail past the 8 GB broadcast limit at scale.
    // AQE picks broadcast-hash at runtime when the actual size is small
    // (a machine-day is ~140 k rows) and falls back to SMJ when it isn't.
    val withStart = flaggedEvents.join(
      cycleTimes.select("machine_id", "cycle_seq", "cycle_start_ts"),
      Seq("machine_id", "cycle_seq"),
      "left")

    def forceValue(event: String) =
      when(col("event_name") === event && col("parameter_name") === "PP_Force", col("value"))
    def errorCount(param: String, event: String) =
      sum(when(col("parameter_name") === param && col("event_name") === event &&
        col("is_error") === 1, 1).otherwise(0))

    withHourBucket(withStart)
      .groupBy("summary_date", "hour_of_day", "machine_id")
      .agg(
        avg(forceValue("Pick_Check")).as("avg_pick_force"),
        max(forceValue("Pick_Check")).as("max_pick_force"),
        min(forceValue("Pick_Check")).as("min_pick_force"),
        avg(forceValue("Place_Check")).as("avg_place_force"),
        max(forceValue("Place_Check")).as("max_place_force"),
        min(forceValue("Place_Check")).as("min_place_force"),
        errorCount("AS_VacuumUnits", "AS_Check").as("as_vacuum_error_count"),
        errorCount("PP_VacuumUnits", "Pick_Check").as("pp_vacuum_error_count"),
        errorCount("AS_VacuumUnits", "AS_Blowoff_Check").as("as_release_error_count"),
        errorCount("PP_VacuumUnits", "Place_Check").as("pp_release_error_count"),
        errorCount("PP_Force", "Pick_Check").as("pick_force_error_count"),
        errorCount("PP_Force", "Place_Check").as("place_force_error_count"),
        sum("is_error").as("total_error_count"))
  }

  /** Full-outer join of the two summaries + zero-fill + rounding + final
    * column order (`daily_aggregator.py:234-265`).
    */
  def hourlySummary(flaggedEvents: DataFrame, cycleTimes: DataFrame): DataFrame =
    hourlySummary(flaggedEvents, cycleTimes, cycleTimes)

  /** Variant with the event-side enrichment cycles separated from the
    * cycle-stat cycles: an incremental caller (e.g. the streaming parity
    * spec) can report an hour whose trailing cycle is still open — its
    * events contribute to the event side while its not-yet-final cycle
    * row is absent from the stats (which then zero-fill, exactly like the
    * streaming aggregation).
    */
  def hourlySummary(
      flaggedEvents: DataFrame,
      enrichCycles: DataFrame,
      statCycles: DataFrame): DataFrame = {
    val joined = cycleSummary(statCycles)
      .join(eventSummary(flaggedEvents, enrichCycles),
        Seq("summary_date", "hour_of_day", "machine_id"), "outer")
      .na.fill(0, zeroFillCols)

    val rounded = Seq(
      "min_cycle_time_seconds" -> 3, "max_cycle_time_seconds" -> 3, "avg_cycle_time_seconds" -> 3,
      "avg_pick_force" -> 2, "max_pick_force" -> 2, "min_pick_force" -> 2,
      "avg_place_force" -> 2, "max_place_force" -> 2, "min_place_force" -> 2
    ).foldLeft(joined) { case (df, (c, scale)) => df.withColumn(c, round(col(c), scale)) }

    rounded.select(
      "summary_date", "hour_of_day", "machine_id",
      "avg_pick_force", "max_pick_force", "min_pick_force",
      "avg_place_force", "max_place_force", "min_place_force",
      "as_vacuum_error_count", "pp_vacuum_error_count",
      "as_release_error_count", "pp_release_error_count",
      "pick_force_error_count", "place_force_error_count",
      "cycle_count", "min_cycle_time_seconds",
      "max_cycle_time_seconds", "avg_cycle_time_seconds")
  }
}
