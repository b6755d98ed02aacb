package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Quality

/** Continuous distribution-drift monitoring: per-event-time-window
  * categorical PSI against a static reference snapshot — the streaming
  * twin of `graft.ops.Quality.psiCategorical`, for the deployment where
  * the corpus is validated as it ARRIVES instead of in a nightly batch.
  *
  * Design for the streaming constraints:
  *  - ONE streaming aggregation (append mode, finalized on watermark
  *    expiry): the whole per-window category histogram is computed as
  *    conditional sums in a single `groupBy(window)` — one column per
  *    spine category, never a second stateful op.
  *  - The reference spine (top-K categories + "(other)") is a BOUNDED
  *    plan-time artifact (K+1 rows, collected once from the static
  *    reference via [[graft.ops.Quality.categorySpine]]) compiled into
  *    codegen'd literals — no stream-static join, no state beyond the
  *    window aggregation itself.
  *  - The histogram aggs and the PSI projection are `Quality`'s own
  *    (`histogramAggs` / `psiTermsFromHistogram`), shared VERBATIM with
  *    the batch operator — which is what lets DriftStreamSpec pin
  *    stream ≡ batch ≡ `psiCategorical` on identical data.
  *
  * Output (append, one row per window × spine category once the
  * watermark closes the window): (window_start, window_end, category,
  * ref_n, cur_n, psi_term) — Σ psi_term per window is the window's PSI
  * (alert ≥ 0.2 by convention).
  */
object DriftStream {

  /** Streaming per-window categorical PSI. `spine` is
    * `Quality.categorySpine(ref, column, topK)` — (category, refCount)
    * pairs whose LAST entry is the "(other)" tail.
    */
  def categoricalPsi(stream: DataFrame, tsCol: String, column: String,
      spine: Seq[(String, Long)], windowDur: String,
      watermarkDelay: String): DataFrame =
    windowed(stream.withWatermark(tsCol, watermarkDelay),
      tsCol, column, spine, windowDur)

  /** Batch twin on the identical code path — the stream≡batch oracle. */
  def categoricalPsiBatch(df: DataFrame, tsCol: String, column: String,
      spine: Seq[(String, Long)], windowDur: String): DataFrame =
    windowed(df, tsCol, column, spine, windowDur)

  private def windowed(df: DataFrame, tsCol: String, column: String,
      spine: Seq[(String, Long)], windowDur: String): DataFrame = {
    val aggs = Quality.histogramAggs(column, spine)
    val agg = df.filter(col(column).isNotNull)
      .groupBy(window(col(tsCol), windowDur))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("window.start"))
      .withColumn("window_end", col("window.end"))
    Quality.psiTermsFromHistogram(agg, spine,
      keyCols = Seq("window_start", "window_end"))
  }
}
