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
  * invariant; pass `assertUniqueKeys = true` to have a corrupt version
  * table fail loudly instead (a per-key window count guard riding the
  * join's own key partitioning — no extra pass over the data).
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
    // Opt-in loud failure on duplicate version keys: the presence marker
    // itself carries a raise_error guarded by a per-key window count, so
    // the check evaluates exactly where the marker does and the window's
    // hash partitioning on keyCols is the same one the join needs.
    def marker(side: String): Column =
      if (!assertUniqueKeys) lit(1)
      else {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(keyCols.map(col): _*)
        when(count(lit(1)).over(w) > 1,
          raise_error(concat(
            lit(s"SnapshotDiff: duplicate key in $side snapshot: ("),
            concat_ws(",", keyCols.map(c => col(c).cast("string")): _*),
            lit(")"))).cast("int"))
          .otherwise(lit(1))
      }
    val o = oldDf
      .select((keyCols ++ compareCols).map(col): _*)
      .withColumn("__in_old", marker("old"))
    val n = newDf
      .select(keyCols.map(col) ++
        compareCols.map(c => col(c).as(s"__new_$c")): _*)
      .withColumn("__in_new", marker("new"))
    val joined = o.join(n, keyCols, "full_outer")
    val diffs: Seq[(String, Column)] = compareCols.map { c =>
      c -> !(col(c) <=> col(s"__new_$c"))
    }
    val anyChanged = diffs.map(_._2).reduce(_ || _)
    val changeType =
      when(col("__in_old").isNull, lit("added"))
        .when(col("__in_new").isNull, lit("removed"))
        .when(anyChanged, lit("changed"))
        .otherwise(lit("unchanged"))
    val changedCols =
      when(col("__in_old").isNotNull && col("__in_new").isNotNull,
        concat_ws(",", diffs.map { case (c, d) =>
          when(d, lit(c)).otherwise(lit(null).cast("string"))
        }: _*))
    joined.select(keyCols.map(col) ++
      Seq(changeType.as("change_type"), changedCols.as("changed_cols")): _*)
  }

  /** Bounded roll-up of [[diff]]: one row per change_type with its key
    * count — the promotion-gate number ("refresh changed 0.3 %, ship
    * it"). */
  def summary(oldDf: DataFrame, newDf: DataFrame, keyCols: Seq[String],
      compareCols: Seq[String]): DataFrame =
    diff(oldDf, newDf, keyCols, compareCols)
      .groupBy("change_type").agg(count(lit(1)).as("n_keys"))
}
