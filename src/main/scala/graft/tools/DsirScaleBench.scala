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
    val spark = BenchUtil.scaleSession()

    def median(body: => Unit): Double =
      BenchUtil.medianTrials(spark, trials)(body)

    val docs1 = Tables.documents(spark, sfDir)
    def replicated(r: Int): DataFrame =
      BenchUtil.replicateById(docs1, "doc_id", r)
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
        Curation.scoreImportance(raw, frozen)))
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
