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
}
