package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.fixtures.FixtureGen
import graft.model.Rules
import graft.pipeline.DailyAggregatorJob

/** Scale curve for the machine-day workload (round-8 verdict: "the 100×
  * claims rest on sf0.1 + one machine-day — measure the 10× point").
  *
  * Runs the full pipeline and BOTH W2 sessionization variants at 1× (one
  * machine-day, ~1.12 M rows — the same fixture `Bench` times) and 10×
  * (ten consecutive days of the SAME machine, ~11.2 M rows). One machine
  * is deliberate: it is the worst case for the reference-semantics single
  * window (ONE partition owns every row), i.e. the scenario where the
  * two-phase distributed prefix sum must take over. The 10× file is
  * generated day-by-day (seed 7+day) and appended, keeping generator
  * memory at one day.
  *
  * Prints one JSON line; findings are committed to PLANS.md per round.
  *
  * Usage: runMain graft.tools.ScaleCurveBench [trials] [daysList]
  * e.g. `ScaleCurveBench 1 1,100` for a 1×/100× pair at one trial each.
  */
object ScaleCurveBench {
  import BenchUtil.{force, time, fmt3}

  private val dayMs = 24L * 3600 * 1000

  /** Same cadence/params as Bench's machine_day (seed 7 on day 0). */
  private def ensureDays(path: String, days: Int): java.io.File = {
    val csv = new java.io.File(path)
    if (csv.exists()) return csv
    Option(csv.getParentFile).foreach(_.mkdirs())
    val start = java.time.Instant.parse("2024-10-16T00:00:00Z").toEpochMilli
    val tmp = new java.io.File(csv.getPath + ".tmp")
    val w = new java.io.PrintWriter(tmp, "UTF-8")
    try {
      (0 until days).foreach { d =>
        val g = FixtureGen.generate(
          Seq("DieBonder_01"), start + d * dayMs, start + (d + 1) * dayMs,
          idleGapMs = (0, 0), errorRate = 0.02, seed = 7L + d,
          withEdgeCases = false)
        val lines = if (d == 0) g.csvLines else g.csvLines.drop(1) // header once
        lines.foreach(w.println)
      }
    } finally w.close()
    if (!tmp.renameTo(csv)) throw new java.io.IOException(s"rename failed: $tmp")
    csv
  }

  def main(args: Array[String]): Unit = {
    val trials = args.headOption.map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def median(body: => Unit): Double =
      BenchUtil.median((1 to trials).map { _ =>
        val t = time(body)
        spark.sharedState.cacheManager.clearCache()
        t
      })

    val daysList = args.lift(1)
      .map(_.split(",").map(_.trim.toInt).toSeq).getOrElse(Seq(1, 10))
    val fixtures = daysList.map { d =>
      val path =
        if (d == 1) "/tmp/graft_bench/machine_day.csv"
        else s"/tmp/graft_bench/machine_${d}day.csv"
      s"${d}x" -> ensureDays(path, d)
    }

    val out = scala.collection.mutable.LinkedHashMap[String, Double]()
    fixtures.foreach { case (label, csv) =>
      out(s"pipeline_$label") = median {
        val o = DailyAggregatorJob.run(spark, csv.getPath, Rules.referenceDefaults)
        force(o.enrichedEvents)
        force(o.hourlySummary)
        o.unpersist()
      }
      val clean = DailyAggregatorJob.cleanse(
        DailyAggregatorJob.readRawCsv(spark, csv.getPath))
      val oc = Seq(col("event_timestamp"), col("parameter_name"))
      val marker = col("event_name") === "Cycle_Start"
      out(s"w2_single_window_$label") = median(force(
        graft.ops.CycleDetection.sessionizeByMarker(
          clean, Seq("machine_id"), oc, marker)))
      out(s"w2_two_phase_$label") = median(force(
        graft.ops.CycleDetection.sessionizeByMarkerScalable(
          clean, Seq("machine_id"), oc, marker,
          bucketCol = floor(unix_micros(col("event_timestamp")) / lit(600L * 1000000)))))
      System.err.println(s"[scale] $label done")
    }

    val qs = out.map { case (k, v) => "\"" + k + "\":" + fmt3(v) }
      .mkString("{", ",", "}")
    spark.stop()
    println(s"""{"metric":"scale_curve","trials":$trials,"points":$qs}""")
  }
}
