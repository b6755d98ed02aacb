package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** The replay-safety contract every sliced-index reader shares.
  *
  * Persisted incremental indexes (the dedup shingle index, the IVF/IVFPQ
  * embedding index) grow by idempotent `batch=<tag>` parquet slices. A
  * reader running at the START of tick `tag` — a probe, a compaction, a
  * quantizer rebuild — must DROP that tag's slices: if they exist they
  * are a crashed earlier attempt of the very tick being replayed, and
  * folding them in would make the batch dedup against its own vectors
  * (every row is an exact dup of itself in the crashed slice). One
  * definition here instead of a per-call-site filter so the contract's
  * edge cases (no tag, un-sliced layout without a `batch` column) stay
  * fixed in one place.
  */
object Slices {

  /** `df` without the `batch=<tag>` slice; identity when no tag is given
    * or the frame has no `batch` slice column (un-sliced layouts).
    * `batch` is a partition column, so the filter is a directory prune.
    */
  def excludeTag(df: DataFrame, tag: Option[String]): DataFrame = tag match {
    case Some(t) if df.columns.contains("batch") =>
      df.filter(col("batch") =!= t)
    case _ => df
  }
}
