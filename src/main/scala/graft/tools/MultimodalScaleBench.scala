package graft.tools

import org.apache.spark.sql.functions._

import graft.ops.Multimodal

/** Scale curve for the multimodal decode family — the one family whose
  * per-round bench entries are fixture-sized (500 rows, ~0.1 s) and so
  * say nothing about scale. The operators are mapPartitions tiers with
  * no shuffle, no state, and no driver collection, so the scale claim
  * to MEASURE is throughput flatness: rows/s at 1× / 10× / 100× should
  * be ~constant once the fixed session/JIT cost amortizes (the 100 TB
  * regime is the same map over more partitions).
  *
  * The corpus is the seeded media fixture replicated by id-shift
  * (payload bytes duplicated verbatim — decode cost per row is
  * unchanged), repartitioned so the scan parallelism is pinned by the
  * bench, not by the source file count (the ParaDedup round-15 lesson).
  *
  * Usage: runMain graft.tools.MultimodalScaleBench [maxReps] [trials]
  */
object MultimodalScaleBench {
  import BenchUtil.{force, fmt3}

  def main(args: Array[String]): Unit = {
    val maxReps = args.lift(0).map(_.toInt).getOrElse(100)
    val trials = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = BenchUtil.scaleSession()
    import spark.implicits._

    graft.fixtures.Fixtures.ensureMedia(spark)
    val base = spark.read.parquet(graft.fixtures.Fixtures.mediaParquet)
      .select("media_id", "payload")

    val out = scala.collection.mutable.LinkedHashMap[String, Double]()
    Seq(1, math.max(1, maxReps / 10), maxReps).distinct.foreach { reps =>
      val corpus = BenchUtil.replicateExplode(base, "media_id", reps)
        .repartition(64).localCheckpoint()
      val n = corpus.count()
      def measure(name: String)(body: => Unit): Unit = {
        val t = BenchUtil.medianTrials(spark, trials)(body)
        out(s"${name}_${reps}x_sec") = t
        out(s"${name}_${reps}x_rows_per_sec") = n / t
        System.err.println(f"[mm-bench] $name%-12s ${reps}%4dx: " +
          fmt3(t) + s" s  (${fmt3(n / t / 1000)} k rows/s)")
      }
      measure("header_meta")(force(
        Multimodal.decodeImageMeta(spark, corpus).toDF()))
      measure("pixel_stats")(force(
        Multimodal.pixelStats(spark, corpus).toDF()))
      measure("pixel_resize")(force(
        Multimodal.resizePixels(spark, corpus, 8, 8).toDF()
          .drop("resized"))) // force the resample, not the buffer shuffle
      corpus.unpersist()
      ()
    }
    println(out.map { case (k, v) => "\"" + k + "\":" + fmt3(v) }
      .mkString(s"""{"bench":"multimodal_scale","base_rows":${base.count()},""", ",", "}"))
    spark.stop()
  }
}
