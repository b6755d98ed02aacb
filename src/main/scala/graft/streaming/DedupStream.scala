package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication — the ingest-time form of the batch
  * `TextDedup.exactGroups` stage: keep the FIRST arrival of each exact
  * text (same `md5(text)` key as the batch operator) and drop repeats,
  * as documents flow in.
  *
  * State design: `dropDuplicatesWithinWatermark` holds one state row per
  * key seen within the watermark horizon and EVICTS it once the
  * watermark passes — state is bounded by arrival rate × delay, never by
  * corpus size (a plain streaming `dropDuplicates` would grow keys
  * forever — the thing that kills a long-running ingest). The price is
  * the documented re-admission: an exact duplicate arriving with an
  * event time beyond the horizon is a NEW document to this stage; the
  * nightly batch dedup (exactGroups / minHash) is the backstop, exactly
  * as in the reference curation pipelines.
  */
object DedupStream {

  /** Keep the first arrival per exact text within the watermark horizon.
    * Output = the input columns (the hash key is internal).
    */
  def dedupExact(stream: DataFrame, tsCol: String, textCol: String,
      watermarkDelay: String): DataFrame =
    stream
      .withColumn("__text_hash", md5(col(textCol)))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("__text_hash")
      .drop("__text_hash")

  /** Batch twin: first arrival per exact text by (ts, tiebreak) order.
    * The streamed output equals this when every duplicate pair lies
    * inside the horizon AND arrival order matches event-time order (the
    * file-replay contract the specs use). For out-of-order arrival the
    * two legitimately differ in WHICH copy survives — the stream keeps
    * the first-PROCESSED duplicate (arrival order is its only notion of
    * "first"), the batch twin the event-time-least — while the surviving
    * key set is identical either way; exact-duplicate texts make the
    * difference invisible to downstream content anyway. `tieCol`
    * resolves equal timestamps (file order is not a batch concept).
    */
  def dedupExactBatch(df: DataFrame, tsCol: String, textCol: String,
      tieCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(md5(col(textCol)))
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
