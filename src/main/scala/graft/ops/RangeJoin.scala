package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join — the second temporal operator Spark
  * lacks a scale-safe primitive for: match every left "point" row to the
  * right "interval" rows containing it (`lo <= t <= hi`), with an
  * optional equi-key.
  *
  * Spark's own planner turns a pure range predicate into a broadcast
  * nested-loop (all-pairs per key) — correct, quadratic. The scale-safe
  * form here is BINNING: time is cut into fixed-width bins, a point
  * lands in exactly one bin, an interval is replicated into every bin it
  * overlaps, and the join becomes an EQUI-join on (key, bin) plus an
  * exact containment filter. Cost is |points| + Σ interval-spans rows
  * through one hash shuffle — linear as long as `binWidthMicros` is
  * chosen near the typical interval length (spans ≈ len/width + 1;
  * too-small bins replicate intervals, too-large bins degrade to
  * per-bin all-pairs).
  */
object RangeJoin {

  /** @param points    left side; all columns pass through.
    * @param intervals right side; all columns pass through (prefix any
    *                  colliding names before calling).
    * @param keys      equi-key columns present on both sides (may be
    *                  empty — then binning is the only pruning).
    * @param tCol      point timestamp column.
    * @param loCol     interval start timestamp column (inclusive).
    * @param hiCol     interval end timestamp column (inclusive).
    * @param binWidthMicros bin width in microseconds.
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      keys: Seq[String],
      tCol: String,
      loCol: String,
      hiCol: String,
      binWidthMicros: Long): DataFrame = {
    require(binWidthMicros > 0, "binWidthMicros must be positive")
    // integer division (div), not `/` — Spark's `/` on longs is double
    // division; post-1970 micros stay exact either way but div is the
    // honest operation
    val p = points.withColumn("__bin",
      expr(s"unix_micros($tCol) div ${binWidthMicros}L"))
    val i = intervals
      .withColumn("__bin", explode(sequence(
        expr(s"unix_micros($loCol) div ${binWidthMicros}L"),
        expr(s"unix_micros($hiCol) div ${binWidthMicros}L"))))
    p.join(i, keys :+ "__bin")
      .filter(col(tCol) >= col(loCol) && col(tCol) <= col(hiCol))
      .drop("__bin")
  }
}
