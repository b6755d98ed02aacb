package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr

/** Stream-stream joins: the continuous counterpart of the batch
  * point-in-interval range join (`ops/RangeJoin`, query `j4`).
  *
  * Both sides are watermarked, and the join condition carries an
  * explicit event-time interval, which is what lets Spark bound the
  * join STATE: a buffered left row can be dropped once the right
  * watermark passes `leftTs − lower`, and vice versa — without the
  * time bound the state would grow forever. Inner-join matches emit
  * eagerly as both sides arrive (append mode), so downstream sinks see
  * results without waiting for watermark closure.
  */
object StreamJoins {

  /** Inner interval join: left rows matched to right rows of the same
    * keys with `leftTs ∈ [rightTs + lowerSec, rightTs + upperSec]`.
    * Right key columns are dropped from the output (they equal the
    * left's). Both inputs must be STREAMING frames; `delay` is each
    * side's watermark.
    */
  /** `joinType` extends the inner form: `leftOuter` additionally emits
    * each unmatched left row exactly once, null-padded, WHEN the
    * watermark proves no in-interval partner can still arrive — outer
    * results are therefore delayed by the watermark, while inner
    * matches still emit eagerly. (Same contract as Spark's
    * stream-stream outer-join semantics; `rightOuter` is symmetric.)
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTs: String,
      rightTs: String,
      lowerSec: Long,
      upperSec: Long,
      delay: String,
      joinType: String = "inner"): DataFrame = {
    require(keyCols.nonEmpty, "interval join needs at least one key")
    require(lowerSec <= upperSec, "lowerSec must be <= upperSec")
    val l = left.withWatermark(leftTs, delay)
    val r = right.withWatermark(rightTs, delay)
    val cond = keyCols.map(k => l(k) === r(k)).reduce(_ && _) &&
      l(leftTs) >= r(rightTs) + expr(s"interval $lowerSec seconds") &&
      l(leftTs) <= r(rightTs) + expr(s"interval $upperSec seconds")
    keyCols.foldLeft(l.join(r, cond, joinType))((df, k) => df.drop(r(k)))
  }
}
