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
    *                  colliding names before calling). Inverted intervals
    *                  (`hi < lo`) can contain no point, so they are
    *                  filtered out BEFORE the bin explode — bad data must
    *                  not pay shuffle volume for rows the containment
    *                  filter would discard anyway.
    * @param keys      equi-key columns present on both sides (may be
    *                  empty — then binning is the only pruning).
    * @param tCol      point timestamp column.
    * @param loCol     interval start timestamp column (inclusive).
    * @param hiCol     interval end timestamp column (inclusive).
    * @param binWidthMicros bin width in microseconds.
    * @param maxBinsPerInterval replication-blowup guard: an interval
    *                  spanning at least this many bins fails the job with
    *                  a `raise_error` naming the span, instead of silently
    *                  materializing millions of replicas of one row (the
    *                  symptom of a binWidth far below the real interval
    *                  scale, or a corrupt far-future `hi`). Fail-fast is
    *                  deliberate: at 100 TB a single such row can OOM an
    *                  executor long before anyone reads a log line.
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      keys: Seq[String],
      tCol: String,
      loCol: String,
      hiCol: String,
      binWidthMicros: Long,
      maxBinsPerInterval: Long = 1L << 16): DataFrame = {
    require(binWidthMicros > 0, "binWidthMicros must be positive")
    require(maxBinsPerInterval > 0, "maxBinsPerInterval must be positive")
    // integer division (div), not `/` — Spark's `/` on longs is double
    // division; post-1970 micros stay exact either way but div is the
    // honest operation
    val p = points.withColumn("__bin",
      expr(s"unix_micros($tCol) div ${binWidthMicros}L"))
    val loBin = s"(unix_micros($loCol) div ${binWidthMicros}L)"
    val hiBin = s"(unix_micros($hiCol) div ${binWidthMicros}L)"
    val i = intervals
      .filter(col(loCol) <= col(hiCol))
      .withColumn("__bin", explode(expr(
        s"""CASE WHEN $hiBin - $loBin + 1L >= ${maxBinsPerInterval}L
           THEN raise_error(concat('pointInInterval: interval spans ',
             cast($hiBin - $loBin + 1L as string),
             ' bins (cap $maxBinsPerInterval) — raise binWidthMicros or clean the interval'))
           ELSE sequence($loBin, $hiBin) END""")))
    p.join(i, keys :+ "__bin")
      .filter(col(tCol) >= col(loCol) && col(tCol) <= col(hiCol))
      .drop("__bin")
  }
}
