package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Physical-layout helpers for repeated large joins.
  *
  * At 100 TB the dominant join cost is the shuffle of the fact table;
  * writing both sides bucketed (and sorted) by the join key makes every
  * later equi-join on that key shuffle-free — Catalyst recognizes the
  * matching `HashPartitioning` from the bucket spec and plans a
  * SortMergeJoin with no Exchange. Bucket count should be chosen so one
  * bucket ≈ one task's worth of data at target scale (e.g. 100 TB /
  * 128 MB ≈ 800 k splits → thousands of buckets, not dozens).
  */
object Layouts {

  /** Write `df` as a bucketed (+ sorted) managed table. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCols: Seq[String],
      numBuckets: Int,
      sorted: Boolean = true): Unit = {
    val w = df.write
      .mode("overwrite")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sorted) w.sortBy(bucketCols.head, bucketCols.tail: _*) else w)
      .format("parquet")
      .saveAsTable(table)
  }

  /** True when the executed plan of `df` contains no shuffle exchange —
    * the property bucketed co-located joins buy.
    *
    * Under AQE the root is an `AdaptiveSparkPlanExec`, which is a
    * LeafExecNode — a naive `collect` over the root never descends into
    * the real plan and reports ANY query as shuffle-free. We unwrap
    * adaptive roots and materialized query stages explicitly (a
    * `ShuffleQueryStageExec` IS a shuffle).
    */
  def isShuffleFree(df: DataFrame): Boolean =
    countShuffles(df.queryExecution.executedPlan) == 0

  private def countShuffles(p: org.apache.spark.sql.execution.SparkPlan): Int = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      countShuffles(a.executedPlan)
    case s: org.apache.spark.sql.execution.adaptive.ShuffleQueryStageExec =>
      1 + countShuffles(s.plan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      countShuffles(q.plan)
    case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike =>
      1 + e.children.map(countShuffles).sum
    case other => other.children.map(countShuffles).sum
  }
}
