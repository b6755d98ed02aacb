package graft.tools

import org.apache.spark.sql.SparkSession

import graft.model.Rules

/** Where does a streaming micro-batch's time go? Replays the machine-day
  * through the full stateful pipeline (cleanse → FMGWS summary rows →
  * rule flags → 19-column windowed summary, update mode, noop sink) and
  * prints the ENGINE's own per-batch accounting — `durationMs` (addBatch /
  * getBatch / walCommit / queryPlanning / commitOffsets) and per-operator
  * state-store telemetry (commit time, rows, memory) — instead of one
  * opaque wall-clock number. Knobs under test ride env vars so a sweep is
  * a shell loop, not a rebuild:
  *
  *   STREAM_SHUFFLE_PARTITIONS  state/shuffle partition count (default 32)
  *   STREAM_FILES_PER_TRIGGER   micro-batch size in files (default 2 of 24)
  *   STREAM_STATE_PROVIDER      "rocksdb" to swap the state store
  *   STREAM_CHUNKS              replay granularity (default 24 files/day)
  *   STREAM_MACHINES            key geometry: machines in the corpus (default 1)
  *   STREAM_HOURS               corpus span in hours (default 24; 8 machines
  *                              x 3 h holds rows AND window keys equal to
  *                              the 1-machine day while multiplying FMGWS
  *                              group parallelism 8x)
  *
  * This is the measurement tool behind any stream-perf change: the rule
  * (PLANS.md) is that plan/conf switches cite a measured breakdown, not a
  * hunch.
  */
object StreamProfileBench {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuffle = sys.env.getOrElse("STREAM_SHUFFLE_PARTITIONS", cpus)
    val filesPerTrigger = sys.env.getOrElse("STREAM_FILES_PER_TRIGGER", "2").toInt
    val chunks = sys.env.getOrElse("STREAM_CHUNKS", "24").toInt
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      // recentProgress keeps only the last N updates (default 100); a
      // fine-grained sweep (STREAM_CHUNKS > 100 with 1 file/trigger)
      // would silently truncate the per-batch table this tool exists
      // to print, so size the buffer to the worst-case batch count.
      .config("spark.sql.streaming.numRecentProgressUpdates",
        math.max(100, chunks + 8).toString)
    sys.env.get("STREAM_STATE_PROVIDER").foreach {
      case "rocksdb" => builder.config(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      case "hdfs" => () // the default store, accepted so sweeps can name it
      case other => sys.error(s"unknown STREAM_STATE_PROVIDER: $other")
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val machines = sys.env.getOrElse("STREAM_MACHINES", "1").toInt
    val hours = sys.env.getOrElse("STREAM_HOURS", "24").toInt
    val dir =
      if (machines == 1 && hours == 24) MachineDayFixture.streamDir(chunks)
      else MachineDayFixture.multiStreamDir(machines, hours, chunks)
    val t0 = System.nanoTime()
    val clean = graft.streaming.StreamingPipeline.cleanse(
      graft.streaming.StreamingPipeline.readCsvStream(
        spark, dir.getPath, maxFilesPerTrigger = filesPerTrigger))
    val summary = graft.streaming.StreamingPipeline.hourlySummaryStream(
      clean, Rules.referenceDefaults)
    val q = summary.writeStream.outputMode("update").format("noop").start()
    try q.processAllAvailable() finally q.stop()
    val wall = (System.nanoTime() - t0) / 1e9

    val progs = q.recentProgress.filter(_.numInputRows > 0)
    println(s"== conf: shuffle=$shuffle filesPerTrigger=$filesPerTrigger " +
      s"chunks=$chunks machines=$machines hours=$hours " +
      s"provider=${sys.env.getOrElse("STREAM_STATE_PROVIDER", "hdfs")}")
    println(s"== wall ${String.format(java.util.Locale.ROOT, "%.2f", Double.box(wall))} s, " +
      s"batches ${progs.length}, rows ${progs.map(_.numInputRows).sum}")
    progs.foreach(p => println(p.json))
    spark.stop()
  }
}
