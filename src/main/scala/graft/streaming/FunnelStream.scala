package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming mirror of [[graft.ops.Funnel]]: per-entity ordered funnel
  * progression maintained continuously over an event stream.
  *
  * Design: the same event-time reorder buffer as
  * [[StreamingPipeline]]'s `orderedStateful` stages — events are held in
  * group state and released STRICTLY below the watermark in (ts, type)
  * order — feeding an in-order greedy step machine: the first step-k
  * event strictly after the step-(k−1) match sets step k, exactly once.
  * Processing in ascending event time makes greedy ≡ the batch
  * "earliest strictly-after" semantics (a step, once set, can never be
  * improved by a later-released event, because release order IS event
  * order), so each (entity, step) emits AT MOST ONE row — a clean
  * append-mode stream that downstream aggregations can count without
  * retraction. Cross-batch disorder within the watermark delay is
  * absorbed; data later than the delay is dropped by Spark's own
  * late-data rule, the same contract as every ordered stage here.
  *
  * State per entity: the pending buffer (bounded by the watermark
  * delay) + one epoch-ms slot per step — O(steps), not O(events).
  */
object FunnelStream {

  case class FunnelEvent(user_id: Long, event_type: String, ts: Timestamp)

  /** `reached` is epoch-ms per step, `Long.MinValue` = not reached. */
  case class FunnelState(pending: Seq[FunnelEvent], reached: Seq[Long])

  case class StepReach(user_id: Long, step_idx: Int, step_name: String, ts: Timestamp)

  def stepReaches(
      events: Dataset[FunnelEvent],
      steps: Seq[String],
      delay: String): Dataset[StepReach] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", delay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, StepReach](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user, it, state) =>
          val st = state.getOption
            .getOrElse(FunnelState(Nil, Seq.fill(steps.size)(Long.MinValue)))
          val pending = st.pending ++ it
          val wm = state.getCurrentWatermarkMs()
          // strictly below the watermark — ts == wm can still arrive in a
          // later micro-batch (Spark's late drop is also strict)
          val (ripe, hold) = pending.partition(_.ts.getTime < wm)
          val reached = st.reached.toArray
          val out = scala.collection.mutable.ArrayBuffer[StepReach]()
          ripe.sortBy(e => (e.ts.getTime, e.event_type)).foreach { e =>
            val i = steps.indexOf(e.event_type)
            // strictly-after chain: tie timestamps can never chain, in
            // any tie processing order, because the comparison is > on
            // the stored match time
            if (i >= 0 && reached(i) == Long.MinValue &&
                (i == 0 ||
                  (reached(i - 1) != Long.MinValue && e.ts.getTime > reached(i - 1)))) {
              reached(i) = e.ts.getTime
              out += StepReach(user, i + 1, steps(i), e.ts)
            }
          }
          state.update(FunnelState(hold, reached.toSeq))
          if (hold.nonEmpty)
            state.setTimeoutTimestamp(
              math.max(hold.map(_.ts.getTime).min, wm + 1))
          out.iterator
      }
  }
}
