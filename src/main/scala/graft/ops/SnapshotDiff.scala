package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset version diff — the change-data view between two snapshots of
  * a keyed table (what a Delta/Iceberg CDF gives you, computed directly
  * from the two materialized versions): per key, was the row `added`,
  * `removed`, `changed`, or `unchanged`, and if changed, WHICH compared
  * columns moved. The audit a 100 TB corpus pipeline runs between
  * ingest versions before promoting one ("what did this refresh
  * actually touch?").
  *
  * Scale shape: ONE sort-merge full-outer join on the key — each side
  * shuffles once on `keyCols` and nothing else; presence is tracked via
  * injected marker columns (never by key-null sniffing, so null keys in
  * the data can't corrupt classification); the per-column comparison
  * and the `changed_cols` assembly are codegen'd null-safe equality
  * folds, map-side after the join.
  *
  * PRECONDITION: `keyCols` must identify rows uniquely WITHIN each
  * snapshot (they are version keys). Duplicate keys turn the full-outer
  * join many-to-many, silently duplicating and misclassifying rows —
  * and [[summary]] then reports inflated counts. The caller owns this
  * invariant; pass `assertUniqueKeys = true` (on [[diff]] or
  * [[summary]]) to have a corrupt version table fail loudly instead: a
  * per-key window count rides the join's own key partitioning (no extra
  * pass), and the raise_error is attached to every diff-derived output
  * column (`change_type`, `changed_cols`, and the first key column) so
  * downstream column pruning keeps it alive for any projection that
  * reads a diff-derived column. Rows with a
  * NULL in any key column are exempt — non-null-safe join equality
  * never matches them, so multiplicity among them cannot corrupt the
  * classification.
  */
object SnapshotDiff {

  /** Row-level diff: (keyCols…, change_type, changed_cols) where
    * `changed_cols` is a comma-joined list of the compared columns that
    * differ (null-safe), '' for unchanged rows, null for added/removed.
    */
  def diff(oldDf: DataFrame, newDf: DataFrame, keyCols: Seq[String],
      compareCols: Seq[String], assertUniqueKeys: Boolean = false): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    require(compareCols.nonEmpty, "need at least one compared column")
    // Opt-in loud failure on duplicate version keys. The presence marker
    // doubles as the per-key row COUNT (a window over the same hash
    // partitioning the join needs — no extra pass); the raise_error is
    // attached to the first key column AND both diff-derived columns of
    // the output, so it survives any downstream projection that keeps a
    // key or a diff result (a marker-embedded guard would be silently
    // pruned away by e.g. `.select(keyCols.head)`).
    // Rows with a NULL in any key column are exempt: non-null-safe join
    // equality never matches them, so the join classifies each such row
    // independently and correctly — only genuine same-key multiplicity
    // corrupts the diff.
    def marker: Column =
      if (!assertUniqueKeys) lit(1L)
      else {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(keyCols.map(col): _*)
        val keyNotNull = keyCols.map(c => col(c).isNotNull).reduce(_ && _)
        when(keyNotNull, count(lit(1)).over(w)).otherwise(lit(1L))
      }
    val o = oldDf
      .select((keyCols ++ compareCols).map(col): _*)
      .withColumn("__in_old", marker)
    val n = newDf
      .select(keyCols.map(col) ++
        compareCols.map(c => col(c).as(s"__new_$c")): _*)
      .withColumn("__in_new", marker)
    val joined = o.join(n, keyCols, "full_outer")
    val diffs: Seq[(String, Column)] = compareCols.map { c =>
      c -> !(col(c) <=> col(s"__new_$c"))
    }
    val anyChanged = diffs.map(_._2).reduce(_ || _)
    val dup = coalesce(col("__in_old"), lit(0L)) > 1L ||
      coalesce(col("__in_new"), lit(0L)) > 1L
    def dupError: Column = raise_error(concat(
      lit("SnapshotDiff: duplicate key ("),
      concat_ws(",", keyCols.map(c => col(c).cast("string")): _*),
      lit(") old_n="), coalesce(col("__in_old"), lit(0L)).cast("string"),
      lit(" new_n="), coalesce(col("__in_new"), lit(0L)).cast("string")))
    val changeTypePlain =
      when(col("__in_old").isNull, lit("added"))
        .when(col("__in_new").isNull, lit("removed"))
        .when(anyChanged, lit("changed"))
        .otherwise(lit("unchanged"))
    // the guard rides EVERY diff-derived output column — change_type,
    // changed_cols, and the first key column — so column pruning cannot
    // silently disarm it: any projection that still reads something the
    // duplicate keys could have corrupted keeps a guarded column alive
    val changeType =
      if (!assertUniqueKeys) changeTypePlain
      else when(dup, dupError.cast("string")).otherwise(changeTypePlain)
    val changedColsPlain =
      when(col("__in_old").isNotNull && col("__in_new").isNotNull,
        concat_ws(",", diffs.map { case (c, d) =>
          when(d, lit(c)).otherwise(lit(null).cast("string"))
        }: _*))
    val changedCols =
      if (!assertUniqueKeys) changedColsPlain
      else when(dup, dupError.cast("string")).otherwise(changedColsPlain)
    val keyOut: Seq[Column] =
      if (!assertUniqueKeys) keyCols.map(col)
      else
        when(dup, dupError.cast(joined.schema(keyCols.head).dataType))
          .otherwise(col(keyCols.head)).as(keyCols.head) +:
          keyCols.tail.map(col)
    joined.select(keyOut ++
      Seq(changeType.as("change_type"), changedCols.as("changed_cols")): _*)
  }

  /** Bounded roll-up of [[diff]]: one row per change_type with its key
    * count — the promotion-gate number ("refresh changed 0.3 %, ship
    * it"). `assertUniqueKeys` passes through to [[diff]] so the
    * promotion gate can fail loudly on a corrupt version table instead
    * of reporting inflated counts. */
  def summary(oldDf: DataFrame, newDf: DataFrame, keyCols: Seq[String],
      compareCols: Seq[String], assertUniqueKeys: Boolean = false): DataFrame =
    diff(oldDf, newDf, keyCols, compareCols, assertUniqueKeys)
      .groupBy("change_type").agg(count(lit(1)).as("n_keys"))
}
