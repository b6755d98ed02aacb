package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import graft.model.Schemas
import graft.streaming.StreamingPipeline.{CleanedEvent, SeqEvent}

/** The streaming W2 cycle counter on `transformWithState` — the engine's
  * arbitrary-stateful-processing v2 API — kept semantically IDENTICAL to
  * `StreamingPipeline.withCycleSeq` (pinned in CycleSeqTwsSpec: same
  * output on the same replay, micro-batch boundaries included).
  *
  * Why the variant exists: `transformWithState` is where stateful
  * streaming is headed, and its operational properties matter at fleet
  * scale even when the state logic is one Long —
  *   - typed, NAMED state slots (`ValueState[Long]("seq")`) instead of
  *     one opaque group-state blob: new slots can be added to a running
  *     pipeline without rewriting existing checkpointed state;
  *   - per-slot TTL is declarative (`TTLConfig`), replacing the
  *     hand-built timeout/expiry choreography `orderedStateful` needs
  *     under the v1 API;
  *   - it REQUIRES the RocksDB state-store provider, which is also the
  *     100 TB answer to state size: state lives off-heap/on-disk with
  *     changelog checkpointing, so a key universe far beyond executor
  *     memory (reference fleet: machines; LLM-pipeline: documents) is a
  *     disk-sizing problem, not an OOM. The HDFS-backed in-memory
  *     provider the v1 pipeline benches with holds every key on heap.
  *
  * Same cross-batch caveat as `withCycleSeq`: events are sorted by
  * (event_timestamp, parameter_name) WITHIN a batch; cross-batch
  * disorder needs the reorder-buffered variant. State: one Long per
  * machine, no TTL (bounded fleet — pass a TTLConfig for key churn).
  */
object CycleSeqTws {

  /** One `ValueState[Long]` per machine: the running Cycle_Start count. */
  private final class CycleSeqProcessor
      extends StatefulProcessor[String, CleanedEvent, SeqEvent] {
    @transient private var seqState: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seqState = getHandle.getValueState[Long](
        "seq", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(machine: String,
        rows: Iterator[CleanedEvent],
        timerValues: TimerValues): Iterator[SeqEvent] = {
      var seq = if (seqState.exists()) seqState.get() else 0L
      val out = scala.collection.mutable.ArrayBuffer[SeqEvent]()
      rows.toSeq
        .sortBy(e => (e.event_timestamp.getTime, e.parameter_name))
        .foreach { e =>
          if (e.event_name == Schemas.cycleStartEvent) seq += 1
          out += SeqEvent(e.event_timestamp, e.machine_id, e.event_name,
            e.parameter_name, e.value, seq)
        }
      seqState.update(seq)
      out.iterator
    }
  }

  /** Per-event cycle numbers, v2-API form. The query this feeds must run
    * under the RocksDB state-store provider
    * (`spark.sql.streaming.stateStore.providerClass` =
    * `...RocksDBStateStoreProvider`) — `transformWithState` rejects the
    * default HDFS-backed provider at query start. */
  def withCycleSeq(clean: Dataset[CleanedEvent]): Dataset[SeqEvent] = {
    import clean.sparkSession.implicits._
    clean
      .groupByKey(_.machine_id)
      .transformWithState(new CycleSeqProcessor,
        TimeMode.None(), OutputMode.Append())
  }
}
