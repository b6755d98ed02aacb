package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regular-grid time-series resampling with gap materialization and
  * forward fill — turning an irregular event stream into the dense
  * per-key hourly/daily series that dashboards and feature pipelines
  * expect (the generalization of the reference pipeline's "every
  * (date, hour) bucket exists, zero-filled" full-outer join).
  *
  * Scale shape: the spine is generated per key from that key's own
  * min/max bucket (`sequence` + `explode` — rows are born distributed,
  * nothing enumerates the grid on the driver), the value join is
  * key+bucket equi-join, and the fill is one window per key in bucket
  * order. One shuffle for the aggregation, one for the join/window.
  */
object Resample {

  /** Bucket each row's `tsCol` to `unit` (a `date_trunc` unit) and
    * aggregate per (keys, bucket); then densify to every bucket between
    * each key's first and last, and forward-fill the aggregated values
    * across the introduced gaps.
    *
    * @param aggs     (name, aggregate over the bucketed frame) pairs;
    *                 each yields `name` (null on gap rows) and
    *                 `name_ffill` (last non-null value at or before the
    *                 bucket).
    * @param stepExpr interval expression matching `unit`, e.g.
    *                 `"interval 1 hour"`.
    * @return one row per (keys, bucket) on the dense grid, with
    *         `n_rows` (0 on gaps), `is_gap`, and the agg columns.
    */
  def resampleFfill(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      unit: String = "hour",
      stepExpr: String = "interval 1 hour",
      aggs: Seq[(String, Column)]): DataFrame = {
    val keyCols = keys.map(col)
    val bucketed = df.withColumn("bucket", date_trunc(unit, col(tsCol)))
    val aggCols = aggs.map { case (n, a) => a.as(n) }
    val perBucket = bucketed.groupBy(keyCols :+ col("bucket"): _*)
      .agg(count(lit(1)).as("n_rows"), aggCols: _*)
    val spine = bucketed.groupBy(keyCols: _*)
      .agg(min("bucket").as("__lo"), max("bucket").as("__hi"))
      .select(keyCols :+
        explode(sequence(col("__lo"), col("__hi"), expr(stepExpr))).as("bucket"): _*)
    val joined = spine.join(perBucket, keys :+ "bucket", "left")
    val w = Window.partitionBy(keyCols: _*).orderBy(col("bucket").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    aggs.foldLeft(
      joined
        .withColumn("is_gap", col("n_rows").isNull.cast("int"))
        .withColumn("n_rows", coalesce(col("n_rows"), lit(0L)))) {
      case (acc, (n, _)) =>
        acc.withColumn(s"${n}_ffill", last(col(n), ignoreNulls = true).over(w))
    }
  }

  /** Exponentially weighted moving average of `valueCol` per key, in
    * `orderCols` order — pandas `ewm(adjust=True)` semantics truncated
    * to the last `window` observations:
    *
    *   ewma_t = Σ_{j<min(t,window)} decay^j · x_{t−j}  /  Σ_j decay^j
    *
    * The truncation makes the kernel finite (for the default
    * decay = 0.5, window = 50 the discarded tail weighs < 2⁻⁵⁰ ≈ 1e-15
    * of the total) and the whole computation map-shaped: ONE shuffle to
    * sort each key, a sliding `collect_list` frame, and a codegen'd
    * in-order `aggregate` fold per row — no self-join, no per-key
    * driver state, no unbounded window memory. The default decay of
    * 0.5 is deliberate: its weights are exact powers of two, so every
    * engine computes bit-identical terms (`pow(0.5, k)` is exact),
    * which is what lets the DuckDB oracle reproduce the result.
    * Null observations are skipped (absent, not zero).
    */
  def ewma(
      df: DataFrame,
      keys: Seq[String],
      orderCols: Seq[String],
      valueCol: String,
      decay: Double = 0.5,
      window: Int = 50,
      outCol: String = "ewma"): DataFrame = {
    require(decay > 0 && decay < 1, "decay must be in (0, 1)")
    require(window >= 1, "window must be >= 1")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(orderCols.map(col(_).asc): _*)
      .rowsBetween(-(window - 1), Window.currentRow)
    val vs = size(col("__vs"))
    df
      .withColumn("__vs", collect_list(col(valueCol).cast("double")).over(w))
      .withColumn(outCol,
        expr(s"""aggregate(sequence(1, size(__vs)), 0D,
                |  (acc, i) -> acc + __vs[i - 1] * pow(${decay}D, size(__vs) - i))"""
          .stripMargin)
          / ((lit(1.0) - pow(lit(decay), vs.cast("double"))) / lit(1.0 - decay)))
      .drop("__vs")
  }
}
