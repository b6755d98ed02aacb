package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.FloatType
import org.apache.spark.storage.StorageLevel

import graft.model.{EventRule, Schemas}
import graft.ops.{CycleDetection, ErrorRules, HourlyRollup}

/** The full reference pipeline, end to end: raw machine-event CSV ->
  * cleaned events -> cycle detection -> error flagging -> (enriched events,
  * hourly summary).
  *
  * Wires SURVEY §3.1 steps 4-8 with one deliberate improvement: the two
  * reused intermediates are persisted, fixing the reference's
  * full-lineage-recomputed-per-action inefficiency (`daily_aggregator.py`
  * has no cache/persist; both writes re-run the CSV scan, window and joins —
  * SURVEY §3.1 step 9). At 100 TB that recompute doubles the job.
  */
object DailyAggregatorJob {

  final case class Outputs(
      enrichedEvents: DataFrame,
      hourlySummary: DataFrame,
      private val persisted: Seq[DataFrame] = Nil) {
    /** Release the intermediates persisted by [[process]]. */
    def unpersist(): Unit = persisted.foreach(_.unpersist())
  }

  /** Step 4 — scan + normalize (`daily_aggregator.py:152-168`). */
  def readRawCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(Schemas.rawEvents)
      .option("header", "true")
      .option("timestampFormat", Schemas.inputTimestampFormat)
      .csv(path)

  /** P1-P7: parse timestamp, cast value, null handling, drop/rename
    * (`daily_aggregator.py:161-168`).
    */
  def cleanse(raw: DataFrame): DataFrame = raw
    .withColumn("event_timestamp", to_timestamp(col("timestamp"), Schemas.inputTimestampFormat))
    .withColumn("value_float", col("value").cast(FloatType))
    .na.fill("", Seq("parameter_name"))
    .na.drop(Seq("event_timestamp", "machine_id", "event_name"))
    .drop("timestamp", "value")
    .withColumnRenamed("value_float", "value")
    .filter(col("event_timestamp").isNotNull)

  /** Steps 5-8 on an already-cleaned event frame. */
  def process(cleanEvents: DataFrame, rules: Seq[EventRule]): Outputs = {
    val (eventsWithSeq, cycleTimes) = CycleDetection.detect(cleanEvents)

    // Both frames feed two downstream consumers each — persist once.
    val flagged = ErrorRules.flag(eventsWithSeq, rules).persist(StorageLevel.MEMORY_AND_DISK)
    val cycles  = cycleTimes.persist(StorageLevel.MEMORY_AND_DISK)

    // Enriched events: attach cycle_time (left join keeps pre-first-cycle
    // rows with cycle_seq = 0 and NULL cycle_time — parity, SURVEY §7.4).
    val enriched = flagged
      .join(cycles.select("machine_id", "cycle_seq", "cycle_time_seconds"),
        Seq("machine_id", "cycle_seq"), "left")
      .withColumn("cycle_time_seconds", round(col("cycle_time_seconds"), 3))
      .select("event_timestamp", "machine_id", "event_name", "parameter_name",
        "value", "is_error", "cycle_seq", "cycle_time_seconds")

    val summary = HourlyRollup.hourlySummary(flagged, cycles)

    Outputs(enriched, summary, persisted = Seq(flagged, cycles))
  }

  /** Convenience: full run from a CSV path. */
  def run(spark: SparkSession, csvPath: String, rules: Seq[EventRule]): Outputs =
    process(cleanse(readRawCsv(spark, csvPath)), rules)
}
