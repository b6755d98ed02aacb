package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sketch-based corpus statistics — the sublinear-memory summaries a
  * 100 TB pipeline keeps where exact state would not fit: Count-Min for
  * per-item frequency (heavy hitters), HLL (Apache DataSketches, via
  * Spark's built-in `hll_*` functions) for mergeable distinct counts.
  *
  * Both sketches are MERGEABLE — per-shard sketches union to the global
  * sketch with no loss vs building it in one pass. That is the property
  * that matters operationally: shards/days/sources can be sketched
  * independently and combined later ([[hllShardedDistinct]] proves the
  * identity in SketchesSpec).
  */
object Sketches {

  /** Per-group approximate distinct counts (one HLL sketch per group).
    * `approx_count_distinct` gives the same numbers without the sketch
    * column; this form exists for pipelines that PERSIST the sketch for
    * later unioning (the estimate is taken here, the shape is what
    * counts).
    */
  def hllDistinctByGroup(
      df: DataFrame, groupCol: String, valueCol: String, lgK: Int = 12): DataFrame =
    df.groupBy(groupCol)
      .agg(hll_sketch_estimate(hll_sketch_agg(col(valueCol), lit(lgK)))
        .as("approx_distinct"))

  /** Global distinct count assembled from independent per-shard
    * sketches: shard → sketch, union, estimate. Bit-identical to
    * sketching the whole input in one pass (HLL union is exact over
    * sketches) — so shards can be built days or machines apart.
    */
  def hllShardedDistinct(
      df: DataFrame, shardCol: String, valueCol: String, lgK: Int = 12): DataFrame =
    df.groupBy(shardCol)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("__sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("__sk"), lit(false)))
        .as("approx_distinct"))

  /** Count-Min frequency estimates for `probes`, from one pass over the
    * data. The sketch is a single O(1/eps · ln(1/conf)) aggregate row —
    * collecting IT (not the data) to the driver for probing is the
    * scale-honest move; estimates are upper bounds within eps·N of the
    * truth with probability `confidence` (pinned in SketchesSpec).
    */
  def countMinEstimates(
      df: DataFrame,
      valueCol: String,
      probes: Seq[String],
      eps: Double = 0.001,
      confidence: Double = 0.99,
      seed: Int = 42): DataFrame = {
    val spark = df.sparkSession
    val bytes = df.agg(count_min_sketch(
      col(valueCol), lit(eps), lit(confidence), lit(seed)).as("sk"))
      .head().getAs[Array[Byte]]("sk")
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(bytes))
    import spark.implicits._
    probes.map(p => (p, cms.estimateCount(p))).toDF(valueCol, "est_count")
  }
}
