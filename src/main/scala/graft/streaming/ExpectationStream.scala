package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Quality
import graft.ops.Quality.Check

/** Continuous data-quality gate: the expectation suite evaluated per
  * event-time window as data ARRIVES — the streaming twin of
  * `Quality.expectations`, for the deployment where a bad upstream batch
  * must page within minutes, not at the nightly batch.
  *
  * Streaming constraints, and how each check meets them:
  *  - ONE streaming aggregation (append mode): every check struct rides
  *    the same `groupBy(window)` — `Quality.checkStructs`, shared
  *    VERBATIM with the batch gate.
  *  - `Unique` compiles to `approx_count_distinct` (HLL++): streaming
  *    aggregations cannot carry exact distinct aggregates, and the
  *    approximation is the documented 100 TB batch swap anyway. All
  *    other checks are plain conditional sums/counts.
  *  - `RefIntegrity` joins its bounded dimension BEFORE the aggregation
  *    — a stream-static broadcast left join, which is stateless and
  *    streaming-legal (`Quality.joinRiDims`, also shared).
  *  - The reshape to one row per (window, check) is a stateless Generate
  *    after the aggregation.
  *
  * Output (append, finalized on watermark expiry): (window_start,
  * window_end, check_type, col_name, metric, threshold, passed 0/1) —
  * `passed = 0` rows are the alert feed.
  *
  * NO-TRAFFIC CAVEAT: a window with zero arriving rows emits NO output
  * rows at all (append-mode aggregations only materialize windows that
  * saw data), so `RowCountBetween(1, …)` — the emptiness gate in the
  * BATCH operator — can never fire here for "no data arrived": there is
  * no row to carry `passed = 0`. In this streaming twin the no-traffic
  * signal is the ABSENT window itself; consumers must alert on a missing
  * window row (e.g. a gap in `window_start` continuity downstream)
  * separately from the `passed = 0` feed.
  */
object ExpectationStream {

  def windowedExpectations(stream: DataFrame, tsCol: String,
      checks: Seq[Check], windowDur: String,
      watermarkDelay: String): DataFrame =
    windowed(Quality.joinRiDims(stream.withWatermark(tsCol, watermarkDelay), checks),
      tsCol, checks, windowDur)

  /** Batch twin on the identical code path — the stream≡batch oracle.
    * (Also uses the approx `Unique` form, so the pin compares like with
    * like; the exact form is the batch operator's own.)
    */
  def windowedExpectationsBatch(df: DataFrame, tsCol: String,
      checks: Seq[Check], windowDur: String): DataFrame =
    windowed(Quality.joinRiDims(df, checks), tsCol, checks, windowDur)

  private def windowed(joined: DataFrame, tsCol: String,
      checks: Seq[Check], windowDur: String): DataFrame = {
    val structs = Quality.checkStructs(checks, exactDistinct = false)
    val wide = joined
      .groupBy(window(col(tsCol), windowDur))
      .agg(structs.head.as("c0"),
        structs.tail.zipWithIndex.map { case (s, i) => s.as(s"c${i + 1}") }: _*)
      .withColumn("window_start", col("window.start"))
      .withColumn("window_end", col("window.end"))
    Quality.explodeChecks(wide, structs.size,
      keyCols = Seq("window_start", "window_end"))
  }
}
