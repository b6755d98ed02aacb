package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import graft.streaming.StreamingPipeline.{Buffered => _, _}

/** The event-time REORDER BUFFER on `transformWithState` — the v2-API
  * port of [[StreamingPipeline.cycleTimesOrdered]] (the v1
  * `flatMapGroupsWithState` form), kept semantically identical and
  * pinned v2 ≡ v1 on the same out-of-order replay in CycleSeqTwsSpec.
  *
  * Where [[CycleSeqTws]] ported the simplest stateful stage (one Long),
  * this ports the one with real state CHOREOGRAPHY, exercising the v2
  * surface the way a production pipeline would:
  *   - `ListState[CleanedEvent]("pending")` holds the reorder buffer as
  *     an APPENDABLE engine-managed list — under RocksDB an append is a
  *     merge write, so buffering N events costs N small writes, not
  *     read-modify-write of one ever-growing blob the way the v1 API's
  *     single `Buffered[S]` case class does;
  *   - `ValueState[CycleOpenState]("cycle")` carries the wrapped stage's
  *     own state in a SEPARATE named slot: the buffer and the logic
  *     state evolve independently (a new slot can join a running
  *     checkpoint; the v1 blob couldn't change shape);
  *   - release scheduling uses first-class event-time TIMERS
  *     (`registerTimer`/`handleExpiredTimer`) instead of v1's single
  *     overloaded `GroupStateTimeout` — a drained group needs no timer
  *     at all, where v1 had to encode "no timeout" vs "TTL" vs
  *     "release" in one channel.
  *
  * Release rule (identical to v1, see [[StreamingPipeline]]'s
  * orderedStateful scaladoc for the full contract): an event is
  * processed only once `event_timestamp < watermark` — strictly below,
  * because Spark's late drop is also strict — so the wrapped step sees
  * a provably non-decreasing event-time order per machine, and
  * cross-batch disorder within the watermark delay is invisible to it.
  *
  * `ttl`: per-slot declarative expiry (v2's replacement for v1's
  * hand-built timeout choreography). NOTE the semantic difference,
  * which is the API's, not ours: `TTLConfig` expires on PROCESSING-time
  * idleness, where the v1 variant's `idleTtl` is defined in event time
  * (deterministic under replay). Default NONE = bounded-fleet
  * assumption, exact parity with the v1 default.
  */
object CycleTimesTws {

  private final class CycleTimesProcessor(ttl: TTLConfig)
      extends StatefulProcessor[String, CleanedEvent, StreamCycleTime] {
    @transient private var pending: ListState[CleanedEvent] = _
    @transient private var cycle: ValueState[CycleOpenState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      pending = getHandle.getListState[CleanedEvent](
        "pending", Encoders.product[CleanedEvent], ttl)
      cycle = getHandle.getValueState[CycleOpenState](
        "cycle", Encoders.product[CycleOpenState], ttl)
    }

    /** Shared by fresh-input and timer paths: merge, release the ripe
      * prefix through the (shared, v1-identical) cycle step, re-buffer
      * the rest, keep exactly one timer at the earliest held event.
      */
    private def release(
        machine: String, fresh: Seq[CleanedEvent],
        wm: Long): Iterator[StreamCycleTime] = {
      val all = pending.get().toSeq ++ fresh
      val (ripe, hold) = all.partition(_.event_timestamp.getTime < wm)
      val out = scala.collection.mutable.ArrayBuffer[StreamCycleTime]()
      var st = if (cycle.exists()) cycle.get() else CycleOpenState(0L, None)
      ripe.sortBy(e => (e.event_timestamp.getTime, e.parameter_name))
        .foreach { e => st = StreamingPipeline.cycleTimeStep(machine, st, e, out) }
      cycle.update(st)
      pending.clear()
      // one timer per key: drop whatever was armed, re-arm at the new
      // earliest held event (wm+1 floor keeps an == wm tie legal and
      // firing on the next watermark advance — the v1 rule verbatim)
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
      if (hold.nonEmpty) {
        hold.foreach(pending.appendValue)
        getHandle.registerTimer(
          math.max(hold.map(_.event_timestamp.getTime).min, wm + 1))
      }
      out.iterator
    }

    override def handleInputRows(
        machine: String, rows: Iterator[CleanedEvent],
        timerValues: TimerValues): Iterator[StreamCycleTime] =
      release(machine, rows.toSeq, timerValues.getCurrentWatermarkInMs())

    override def handleExpiredTimer(
        machine: String, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[StreamCycleTime] =
      release(machine, Nil, timerValues.getCurrentWatermarkInMs())
  }

  /** Per-machine closed-cycle times behind the v2 reorder buffer.
    * Requires the RocksDB state-store provider (`transformWithState`
    * rejects the default HDFS-backed one at query start).
    */
  def cycleTimesOrdered(
      clean: Dataset[CleanedEvent], delay: String,
      ttl: TTLConfig = TTLConfig.NONE): Dataset[StreamCycleTime] = {
    import clean.sparkSession.implicits._
    clean
      .withWatermark("event_timestamp", delay)
      .groupByKey(_.machine_id)
      .transformWithState(new CycleTimesProcessor(ttl),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
