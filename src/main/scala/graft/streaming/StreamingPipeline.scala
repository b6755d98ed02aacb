package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.model.Schemas

/** Structured-Streaming form of the pipeline (SURVEY §7.1 item 6): a file
  * source streams daily CSVs; cycle detection becomes *stateful* — the
  * running `Cycle_Start` count lives in `flatMapGroupsWithState` state
  * keyed by machine, so cycles survive micro-batch (and file) boundaries,
  * which the batch job cannot do (it resets per file — an accepted
  * divergence documented in SURVEY §7.4); the hourly rollup becomes a
  * watermarked event-time window aggregation; the sink is a `foreachBatch`
  * JDBC upsert (idempotent, so retried batches are safe — exactly-once
  * effect on the summary table).
  */
object StreamingPipeline {

  /** Post-cleanse event (the stream-side mirror of the batch cleanse). */
  final case class CleanedEvent(
      event_timestamp: Timestamp,
      machine_id: String,
      event_name: String,
      parameter_name: String,
      value: Option[Float])

  final case class SeqEvent(
      event_timestamp: Timestamp,
      machine_id: String,
      event_name: String,
      parameter_name: String,
      value: Option[Float],
      cycle_seq: Long)

  /** File-source stream of raw daily CSVs (same schema/format as S1). */
  def readCsvStream(spark: SparkSession, dir: String, maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(Schemas.rawEvents)
      .option("header", "true")
      .option("timestampFormat", Schemas.inputTimestampFormat)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .csv(dir)

  /** Streaming W2: per-machine running Cycle_Start counter in group state.
    *
    * Events inside one micro-batch are sorted by (event_timestamp,
    * parameter_name) before applying the counter — same order as the batch
    * window; ties never involve Cycle_Start so assignment is deterministic.
    * State is one Long per machine: O(#machines), no timeout needed for a
    * bounded fleet (add a timeout if machines churn).
    */
  def withCycleSeq(clean: Dataset[CleanedEvent]): Dataset[SeqEvent] = {
    import clean.sparkSession.implicits._
    clean
      .groupByKey(_.machine_id)
      .flatMapGroupsWithState[Long, SeqEvent](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (machine: String, events: Iterator[CleanedEvent], state: GroupState[Long]) =>
          var seq = state.getOption.getOrElse(0L)
          val out = events.toSeq
            .sortBy(e => (e.event_timestamp.getTime, e.parameter_name))
            .map { e =>
              if (e.event_name == Schemas.cycleStartEvent) seq += 1
              SeqEvent(e.event_timestamp, e.machine_id, e.event_name,
                e.parameter_name, e.value, seq)
            }
          state.update(seq)
          out.iterator
      }
  }

  final case class CycleOpenState(counter: Long, openStartMs: Option[Long])

  final case class StreamCycleTime(
      machine_id: String,
      cycle_seq: Long,
      cycle_start_ts: Timestamp,
      cycle_time_seconds: Float)

  /** Streaming A1/C2: per-machine open-cycle state — a Cycle_Start opens
    * a cycle (incrementing the running counter), the matching Cycle_End
    * closes it and emits the boundary row with its epoch-seconds duration
    * (the batch C2 semantics). A cycle spanning two micro-batches closes
    * correctly because the open start lives in state. A cycle whose End
    * is lost closes with duration 0.0 when the next Start arrives (batch
    * parity). Documented divergences from batch: the FINAL open cycle
    * never emits (streams have no end-of-file; batch closes it with 0.0),
    * and a duplicated Cycle_End extends the batch boundary but is ignored
    * here (well-formed Start/End alternation assumed).
    */
  def cycleTimes(clean: Dataset[CleanedEvent]): Dataset[StreamCycleTime] = {
    import clean.sparkSession.implicits._
    clean
      .groupByKey(_.machine_id)
      .flatMapGroupsWithState[CycleOpenState, StreamCycleTime](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (machine: String, events: Iterator[CleanedEvent], state: GroupState[CycleOpenState]) =>
          var st = state.getOption.getOrElse(CycleOpenState(0L, None))
          val out = scala.collection.mutable.ArrayBuffer[StreamCycleTime]()
          events.toSeq
            .sortBy(e => (e.event_timestamp.getTime, e.parameter_name))
            .foreach { e =>
              e.event_name match {
                case Schemas.cycleStartEvent =>
                  // batch parity: a cycle whose End never arrived before
                  // the next Start still exists with boundaries collapsed
                  // to its Start row — emit it with duration 0.0 (what
                  // the batch min/max-over-Start&End grouping produces)
                  st.openStartMs.foreach { startMs =>
                    out += StreamCycleTime(
                      machine, st.counter, new Timestamp(startMs), 0.0f)
                  }
                  st = CycleOpenState(st.counter + 1, Some(e.event_timestamp.getTime))
                case Schemas.cycleEndEvent =>
                  st.openStartMs.foreach { startMs =>
                    out += StreamCycleTime(
                      machine, st.counter, new Timestamp(startMs),
                      ((e.event_timestamp.getTime / 1000.0) - (startMs / 1000.0)).toFloat)
                  }
                  st = st.copy(openStartMs = None)
                case _ => ()
              }
            }
          state.update(st)
          out.iterator
      }
  }

  /** Batch cleanse re-expressed on the stream (identical expressions). */
  def cleanse(raw: DataFrame): Dataset[CleanedEvent] = {
    import raw.sparkSession.implicits._
    graft.pipeline.DailyAggregatorJob.cleanse(raw).as[CleanedEvent]
  }

  /** Watermarked hourly cycle counts: event-time window over Cycle_Start
    * markers. Late events beyond the watermark are dropped — the streaming
    * trade-off the batch job doesn't have to make.
    */
  def hourlyCycleCounts(clean: Dataset[CleanedEvent], watermark: String = "2 hours"): DataFrame =
    clean.toDF()
      .filter(col("event_name") === Schemas.cycleStartEvent)
      .withWatermark("event_timestamp", watermark)
      .groupBy(
        window(col("event_timestamp"), "1 hour").as("w"),
        col("machine_id"))
      .agg(count(lit(1)).as("cycle_count"))
      .select(
        to_date(col("w.start")).as("summary_date"),
        hour(col("w.start")).as("hour_of_day"),
        col("machine_id"), col("cycle_count"))

  /** Stream → JDBC upsert via foreachBatch: each micro-batch merges the
    * CHANGED windows into the summary table (update mode — so the
    * watermark actually evicts window state and write volume stays
    * proportional to fresh data; complete mode would retain all state
    * forever and rewrite the full history every batch). Upsert idempotence
    * makes batch replays safe.
    */
  def startJdbcUpsert(
      counts: DataFrame,
      url: String,
      table: String,
      dialect: graft.io.JdbcSinks.UpsertDialect,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    counts.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (df: DataFrame, _: Long) =>
        graft.io.JdbcSinks.upsert(df, url, table,
          keyCols = Seq("summary_date", "hour_of_day", "machine_id"), dialect)
      }
      .start()
}
