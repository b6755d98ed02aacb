package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table profiling: one tall row per column with row/null/distinct
  * counts and typed min/max — the data-quality screen run before a
  * table enters a pipeline (and the stats a curation run reports on
  * its output).
  *
  * Scale shape: ONE aggregation pass over the table produces every
  * column's stats as a single wide row, then a map-only struct explode
  * reshapes it tall — the table is never scanned per column. The exact
  * `countDistinct` aggregates are the oracle-checkable contract; each
  * distinct aggregate costs an Expand duplication of the scan rows, so
  * the 100 TB form swaps them for `approx_count_distinct` exactly like
  * the A2 summary column (same opt-in pattern).
  */
object Profile {

  def table(
      df: DataFrame,
      numericCols: Seq[String],
      stringCols: Seq[String]): DataFrame = {
    require((numericCols ++ stringCols).nonEmpty, "nothing to profile")
    def statsFor(c: String, numeric: Boolean): Seq[Column] = Seq(
      count(col(c)).as(s"${c}__nn"),
      countDistinct(col(c)).as(s"${c}__nd"),
      (if (numeric) min(col(c)).cast("double") else lit(null).cast("double"))
        .as(s"${c}__minn"),
      (if (numeric) max(col(c)).cast("double") else lit(null).cast("double"))
        .as(s"${c}__maxn"),
      (if (numeric) lit(null).cast("string") else min(col(c)).cast("string"))
        .as(s"${c}__mins"),
      (if (numeric) lit(null).cast("string") else max(col(c)).cast("string"))
        .as(s"${c}__maxs"))
    val aggs = count(lit(1)).as("__n") +:
      (numericCols.map(_ -> true) ++ stringCols.map(_ -> false))
        .flatMap { case (c, num) => statsFor(c, num) }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val rows = (numericCols ++ stringCols).map { c =>
      struct(
        lit(c).as("col_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"${c}__nn")).as("n_nulls"),
        col(s"${c}__nd").as("n_distinct"),
        col(s"${c}__minn").as("min_num"),
        col(s"${c}__maxn").as("max_num"),
        col(s"${c}__mins").as("min_str"),
        col(s"${c}__maxs").as("max_str"))
    }
    wide.select(explode(array(rows: _*)).as("s")).select("s.*")
  }
}
