package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.fixtures.FixtureGen
import graft.pipeline.DailyAggregatorJob

/** The 1000× W2 point (round-9 verdict #8): does the two-phase prefix-sum
  * sessionization really hold at ~2.7 machine-YEARS of one machine's
  * events in ONE key (~1.12 B rows), or does the 1×/10×/100× curve stop
  * extrapolating somewhere past 112 M rows?
  *
  * Why this is a separate tool and not `ScaleCurveBench 1 1000`:
  *   - the 1000-day CSV would be ~72 GB — more than this host's free
  *     disk, and the driver-side single-thread generator would spend
  *     tens of minutes writing it. Instead the SAME generator
  *     (`FixtureGen.generate`, seed 7+day, identical cadence) runs
  *     day-per-task ACROSS the executors, the same cleanse parses the
  *     lines in-flight, and the cleaned events land once as
  *     dictionary-compressed parquet (~25 bytes/row → ~4 GB at 1000×).
  *   - ScaleCurveBench's W2 timings carry the CSV parse in their lineage;
  *     reading cleaned parquet removes it. So this tool measures BOTH the
  *     100× and 1000× points from the same parquet representation — the
  *     100×→1000× growth factor is then apples-to-apples within this
  *     tool, and the 100× overlap point ties the two series together.
  *   - the single-window variant is OFF by default at 1000×: its one
  *     externally-sorted task would spill the better part of 100 GB into
  *     the same constrained disk, and its measured per-decade growth
  *     (8.1× then 18.9×; 149.6 s at 100×) already bounds it at ≥45 min —
  *     the two-phase DEFAULT is the claim under validation. Pass
  *     `single` in the ops arg to force it anyway.
  *
  * Usage: runMain graft.tools.W2YearBench [trials] [daysList] [ops]
  *   e.g. `W2YearBench 1 100,1000 two_phase`
  */
object W2YearBench {
  import BenchUtil.{force, time, fmt3}

  private val dayMs = 24L * 3600 * 1000

  /** Cleaned machine events for `days` consecutive days of ONE machine,
    * generated day-per-task with the exact ScaleCurveBench parameters and
    * stored as parquet (reused across runs if present).
    */
  private def ensureCleanParquet(spark: SparkSession, days: Int): String = {
    val path = s"/tmp/graft_bench/machine_${days}day_clean.parquet"
    // A crashed multi-minute generation leaves a partial parquet dir that
    // a bare exists() would happily benchmark (wrong rows, fast "result").
    // Same tmp+rename discipline as ScaleCurveBench.ensureDays: write to
    // a scratch dir, rename into place only after the job commits.
    if (new java.io.File(path, "_SUCCESS").exists()) return path
    val dst = new java.io.File(path)
    if (dst.exists()) BenchUtil.deleteRecursively(dst)
    val tmp = new java.io.File(path + ".tmp")
    if (tmp.exists()) BenchUtil.deleteRecursively(tmp)
    import spark.implicits._
    val start = java.time.Instant.parse("2024-10-16T00:00:00Z").toEpochMilli
    val cpus = spark.sparkContext.defaultParallelism
    val lines = spark.range(0, days, 1, math.min(days, cpus * 4))
      .as[Long]
      .flatMap { d =>
        FixtureGen.generate(
          Seq("DieBonder_01"), start + d * dayMs, start + (d + 1) * dayMs,
          idleGapMs = (0, 0), errorRate = 0.02, seed = 7L + d,
          withEdgeCases = false).csvLines.drop(1) // header nowhere: schema is explicit
      }
    val raw = spark.read
      .schema(graft.model.Schemas.rawEvents)
      .option("timestampFormat", graft.model.Schemas.inputTimestampFormat)
      .csv(lines)
    DailyAggregatorJob.cleanse(raw).write.mode("overwrite").parquet(tmp.getPath)
    if (!tmp.renameTo(dst))
      throw new java.io.IOException(s"rename failed: $tmp -> $dst")
    path
  }

  def main(args: Array[String]): Unit = {
    val trials = args.headOption.map(_.toInt).getOrElse(1)
    val daysList = args.lift(1)
      .map(_.split(",").map(_.trim.toInt).toSeq).getOrElse(Seq(100, 1000))
    val ops = args.lift(2)
      .map(_.split(",").map(_.trim).toSet).getOrElse(Set("two_phase"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
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

    val out = scala.collection.mutable.LinkedHashMap[String, String]()
    daysList.foreach { d =>
      val path = ensureCleanParquet(spark, d)
      val clean = spark.read.parquet(path)
      out(s"rows_${d}x") = clean.count().toString
      val oc = Seq(col("event_timestamp"), col("parameter_name"))
      val marker = col("event_name") === "Cycle_Start"
      if (ops.contains("two_phase"))
        out(s"w2_two_phase_${d}x") = fmt3(median(force(
          graft.ops.CycleDetection.sessionizeByMarkerScalable(
            clean, Seq("machine_id"), oc, marker,
            bucketCol = floor(unix_micros(col("event_timestamp")) / lit(600L * 1000000))))))
      if (ops.contains("single"))
        out(s"w2_single_window_${d}x") = fmt3(median(force(
          graft.ops.CycleDetection.sessionizeByMarker(
            clean, Seq("machine_id"), oc, marker))))
      System.err.println(s"[w2year] ${d}x done")
    }

    val qs = out.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    spark.stop()
    println(s"""{"metric":"w2_year","trials":$trials,"points":$qs}""")
  }
}
