package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.Curation

/** Scale curve for the DSIR selection path in its production shape: the
  * TARGET corpus stays fixed (a small high-quality sample — label/sample
  * acquisition, not compute, bounds it) while the RAW corpus is
  * replicated `reps` ways. This is the axis that grows at 100 TB, and
  * the design claim under test is that the hashed feature model stays
  * bounded at `buckets` rows (broadcast join) while everything else is
  * map-side n-gram extraction plus two bounded aggregations — so wall
  * time should grow ~linearly in the raw volume and never shuffle the
  * corpus on the feature key.
  *
  * Usage: runMain graft.tools.DsirScaleBench <sfDir> [reps] [trials]
  */
object DsirScaleBench {
  import BenchUtil.{force, time, fmt3}

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args.lift(1).map(_.toInt).getOrElse(10)
    val trials = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def median(body: => Unit): Double =
      BenchUtil.median((1 to trials).map { _ =>
        val t = time(body)
        spark.sharedState.cacheManager.clearCache()
        t
      })

    val docs1 = Tables.documents(spark, sfDir)
    val idSpan = docs1.agg(max(col("doc_id"))).head().getLong(0) + 1
    def replicated(r: Int): DataFrame =
      (0 until r).map(i =>
        docs1.withColumn("doc_id", col("doc_id") + lit(i * idSpan)))
        .reduce(_.unionAll(_))
    // the production geometry: target fixed at the 1x English sample
    val target = docs1.filter(col("lang") === "en")

    // the production deployment shape: the model is fit ONCE on the 1x
    // sample (fit cost does not scale with the scored corpus) and frozen
    val frozen = Curation.importanceModel(docs1, target, buckets = 10000)
      .persist()
    frozen.count()

    val out = scala.collection.mutable.LinkedHashMap[String, Double]()
    Seq(1, reps).foreach { r =>
      val raw = if (r == 1) docs1 else replicated(r)
      val n = raw.count()
      out(s"weights_${r}x") = median(force(
        Curation.importanceWeights(raw, target, buckets = Some(10000))))
      out(s"frozen_score_${r}x") = median(force(
        Curation.scoreImportance(raw, frozen, buckets = 10000)))
      out(s"select_topk_${r}x") = median(force(
        Curation.dsirSelect(raw, target, k = 1000, buckets = Some(10000))))
      out(s"select_threshold_${r}x") = median(force(
        Curation.dsirSelectThreshold(raw, target, k = n / 100,
          buckets = Some(10000))))
      println(s"[dsir-scale] ${r}x: n=$n " +
        s"weights=${fmt3(out(s"weights_${r}x"))}s " +
        s"frozen_score=${fmt3(out(s"frozen_score_${r}x"))}s " +
        s"topk=${fmt3(out(s"select_topk_${r}x"))}s " +
        s"threshold=${fmt3(out(s"select_threshold_${r}x"))}s")
    }
    val growth = out(s"weights_${reps}x") / out("weights_1x")
    println(s"[dsir-scale] weights growth at ${reps}x volume: " +
      s"${fmt3(growth)}x (linear would be ~${reps}x)")
    spark.stop()
  }
}
