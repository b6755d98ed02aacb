package graft.tools

import graft.fixtures.FixtureGen

/** Shared machine-day fixture builders for the reference-shaped benches:
  * one simulated day of one machine at the generator's real cadence
  * (~617 ms/cycle, 8 rows/cycle ≈ 1.12 M rows — `generate_data.py:48-52`),
  * as a single CSV and as a 24-chunk streaming replay directory. Files are
  * built once under /tmp and reused across runs; generation is excluded
  * from every timing by construction (callers time only the reads).
  */
object MachineDayFixture {

  /** The one-day CSV (write-then-rename so a crashed run can't leave a
    * truncated file a later run would silently benchmark). */
  def csv(): java.io.File = {
    val csv = new java.io.File("/tmp/graft_bench/machine_day.csv")
    if (!csv.exists()) {
      val start = java.time.Instant.parse("2024-10-16T00:00:00Z").toEpochMilli
      val g = FixtureGen.generate(
        Seq("DieBonder_01"), start, start + 24L * 3600 * 1000,
        idleGapMs = (0, 0), errorRate = 0.02, seed = 7L, withEdgeCases = false)
      val tmp = new java.io.File(csv.getPath + ".tmp")
      FixtureGen.writeCsv(tmp.getPath, g.csvLines)
      if (!tmp.renameTo(csv)) throw new java.io.IOException(s"rename failed: $tmp")
    }
    csv
  }

  /** Multi-machine variant for key-geometry streaming experiments: N
    * machines over `hours` hours, globally time-ordered, split into
    * `chunks` replay files. With `machines = 8, hours = 3` the corpus
    * holds the single-machine day's row count (~1.12 M) AND its window-
    * state key count (8 machines × 3 hourly windows = 1 × 24) constant
    * while multiplying the per-batch FMGWS group parallelism 8× — the
    * controlled comparison behind the "state partitions scale with
    * active keys" deployment rule.
    *
    * The generator emits machine-by-machine, so the merged stream is
    * re-sorted by the fixed-width ISO timestamp prefix (lexicographic ==
    * chronological; Scala's sortBy is stable, so same-millisecond rows
    * keep their per-machine emit order — the tie contract the stateful
    * path relies on).
    */
  def multiStreamDir(machines: Int, hours: Int, chunks: Int = 24): java.io.File = {
    val dir = new java.io.File(
      s"/tmp/graft_bench/machine_multi_${machines}x${hours}h_stream_$chunks")
    if (!dir.exists()) {
      val start = java.time.Instant.parse("2024-10-16T00:00:00Z").toEpochMilli
      val names = (1 to machines).map(i => f"DieBonder_$i%02d")
      val g = FixtureGen.generate(
        names, start, start + hours.toLong * 3600 * 1000,
        idleGapMs = (0, 0), errorRate = 0.02, seed = 7L, withEdgeCases = false)
      val (header, data) = (g.csvLines.head, g.csvLines.tail)
      writeChunks(dir, header, data.sortBy(_.take(24)), chunks)
    }
    dir
  }

  /** Split `lines` into `chunks` name-ordered CSV files under `dir`, each
    * with `header` prepended; written to a sibling tmp dir and renamed so
    * a crashed run can't leave a partial directory a later run would
    * silently replay.
    */
  private def writeChunks(dir: java.io.File, header: String,
      lines: Seq[String], chunks: Int): Unit = {
    val tmp = new java.io.File(dir.getPath + ".tmp")
    // A leftover tmp dir from an interrupted run may hold part files from
    // older chunk math; clear it so stale parts can't be renamed into the
    // live dir and silently replayed alongside the fresh ones.
    if (tmp.exists()) {
      Option(tmp.listFiles()).getOrElse(Array.empty).foreach(_.delete())
    }
    tmp.mkdirs()
    val per = math.max(1, (lines.length + chunks - 1) / chunks)
    lines.grouped(per).zipWithIndex.foreach { case (block, i) =>
      val w = new java.io.PrintWriter(
        new java.io.File(tmp, f"part_$i%03d.csv"), "UTF-8")
      try { w.println(header); block.foreach(w.println) } finally w.close()
    }
    if (!tmp.renameTo(dir))
      throw new java.io.IOException(s"rename failed: $tmp")
  }

  /** The same day split into `chunks` contiguous time-ordered CSV files
    * for file-stream replay: the generator emits in event-time order and
    * the file source lists paths in name order, so arrival order ==
    * event-time order (the unordered stateful variants' contract).
    */
  def streamDir(chunks: Int = 24): java.io.File = {
    val streamDir = new java.io.File(s"/tmp/graft_bench/machine_day_stream_$chunks")
    if (!streamDir.exists()) {
      val src = scala.io.Source.fromFile(csv())
      val all = try src.getLines().toArray finally src.close()
      writeChunks(streamDir, all.head, all.tail.toSeq, chunks)
    }
    streamDir
  }
}
