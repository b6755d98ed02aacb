package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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

  /** Z-value (Morton code) of non-negative integer dimension columns:
    * the low `bits` bits of each dimension, bit-interleaved — bit j of
    * dimension i lands at position `j·n + i`. Rows close in z-value are
    * close in EVERY dimension, which is the whole point: sorting a write
    * by z-value gives each output file a tight min/max envelope in all
    * dimensions at once, so a multi-dimensional filter can skip most
    * files (file-level stats pruning in Delta/Iceberg-style tables,
    * row-group-level pruning in plain parquet) — a single-column sort
    * only ever skips on that one column.
    *
    * Pure codegen'd shift/mask expression chain — no UDF; `n·bits` must
    * fit a long's 63 value bits. Dimensions must already be non-negative
    * ints (bucket ids, day numbers, [[zNormalize]] output).
    */
  def zValue(cols: Seq[Column], bits: Int = 16): Column = {
    val n = cols.size
    require(n >= 1, "zValue needs at least one dimension")
    require(n * bits <= 63, s"$n dims x $bits bits exceeds a long's 63 value bits")
    (0 until bits).flatMap { j =>
      cols.zipWithIndex.map { case (c, i) =>
        shiftleft(shiftright(c.cast("long"), j).bitwiseAND(1L), j * n + i)
      }
    }.reduce[Column](_.bitwiseOR(_))
  }

  /** Map a numeric column with known bounds onto the [0, 2^bits) grid —
    * the per-dimension normalization in front of [[zValue]]. Bounds are
    * caller-supplied (at 100 TB you know them, or compute them once per
    * write); out-of-range values clamp to the edge cells, so stragglers
    * degrade locality instead of breaking the encoding.
    */
  def zNormalize(c: Column, lo: Double, hi: Double, bits: Int = 16): Column = {
    require(hi > lo, "zNormalize needs hi > lo")
    val cells = (1L << bits) - 1
    least(
      greatest(
        floor((c.cast("double") - lit(lo)) / lit(hi - lo) * lit(cells.toDouble)), lit(0L)),
      lit(cells)).cast("long")
  }

  /** Write `df` z-ordered by `dims`: range-partition on the z-value (so
    * files tile the z-curve in disjoint runs) and sort inside each file.
    * `numFiles` should put one file ≈ one scan split at target scale.
    * The z column is internal and not written.
    */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      dims: Seq[Column],
      bits: Int = 16,
      numFiles: Int = 32): Unit = {
    // collision-free internal name: lengthen until it is not a column of
    // `df`, so an input that already owns "__graft_z" is never clobbered
    var z = "__graft_z"
    while (df.columns.contains(z)) z += "_"
    df.withColumn(z, zValue(dims, bits))
      .repartitionByRange(numFiles, col(z))
      .sortWithinPartitions(z)
      .drop(z)
      .write.mode("overwrite").parquet(path)
  }

  /** Small-file compaction — the unglamorous operation that keeps a
    * 100 TB lake scannable: streaming sinks, per-batch ingests and
    * over-parallel writes accumulate directories of kilobyte files whose
    * per-file open/footer overhead eventually dominates scan time (and
    * whose listing crushes the driver). Rewrites `inDir` into
    * `ceil(bytes / targetBytes)` evenly-sized files.
    *
    * `repartition` (round-robin shuffle), not `coalesce`: coalesce would
    * avoid the shuffle but glues ADJACENT partitions, inheriting any
    * size skew into the output files and capping the read's parallelism;
    * compaction runs rarely and off the hot path, so even output beats a
    * saved shuffle. Sizes come from the filesystem (Hadoop FS API — works
    * on HDFS/S3, not just file://).
    *
    * @return the number of output files written.
    */
  def compact(
      spark: SparkSession,
      inDir: String,
      outDir: String,
      targetBytes: Long = 128L << 20): Int = {
    require(targetBytes > 0, "targetBytes must be positive")
    val path = new org.apache.hadoop.fs.Path(inDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.getContentSummary(path).getLength
    val numFiles = math.max(1L, math.ceil(totalBytes.toDouble / targetBytes).toLong)
      .min(Int.MaxValue).toInt
    spark.read.parquet(inDir)
      .repartition(numFiles)
      .write.mode("overwrite").parquet(outDir)
    numFiles
  }

  /** Partition-pruned MERGE (upsert) into a partitioned parquet table —
    * the Delta-less form of `MERGE INTO`: matched keys are replaced,
    * new keys inserted, and ONLY the partitions the update batch
    * touches are read or rewritten.
    *
    * Mechanics: the touched partition values are collected (bounded by
    * the batch, not the table), the target read is filtered to them —
    * partition pruning keeps the scan off every other partition — and
    * the merged result is written with DYNAMIC partition overwrite, so
    * parquet files in untouched partitions are not even re-listed, let
    * alone rewritten. At 100 TB this turns a merge from a full-table
    * rewrite into work proportional to the update's partition
    * footprint, which is the entire point of partitioning the table by
    * an update-locality column (ingest date, tenant, …).
    *
    * Not transactional (parquet has no commit protocol): a crash
    * mid-write can leave touched partitions partially rewritten —
    * production puts a table format (Delta/Iceberg) or a
    * rename-on-success convention on top; the PLAN shape (prune +
    * partial overwrite) is what this operator demonstrates and pins.
    */
  def upsertPartitioned(
      spark: SparkSession,
      dir: String,
      updates: DataFrame,
      keyCols: Seq[String],
      partitionCol: String): Unit = {
    require(keyCols.nonEmpty, "upsert needs at least one key column")
    val touched = updates.select(col(partitionCol)).distinct().collect().map(_.get(0))
    if (touched.isEmpty) return
    val target = spark.read.parquet(dir)
      .filter(col(partitionCol).isin(touched.toIndexedSeq: _*))
    // eagerly materialized BEFORE the write: the overwrite targets the
    // same path the merge reads, so the lineage to those files must be
    // cut or Spark (rightly) refuses the self-overwrite
    val merged = target.join(updates, keyCols, "left_anti")
      .unionByName(updates.select(target.columns.toIndexedSeq.map(col): _*))
      .localCheckpoint()
    merged.write
      .partitionBy(partitionCol)
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .parquet(dir)
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
