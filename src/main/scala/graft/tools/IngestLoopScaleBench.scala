package graft.tools

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.TextDedup
import graft.streaming.DedupStream

/** The growing-corpus loop at scale: seed a ~1M-doc index, then run N
  * `DedupStream.ingestTick`s whose batches mix fresh content (every
  * token suffixed `_t<i>`, disjoint md5 and shingle vocabulary), exact
  * dups of the SEED (10%), and exact dups of the PREVIOUS tick's fresh
  * docs (5% — only droppable if the loop's index appends really work).
  * Prints per-tick wall time and survivor counts as the index
  * accumulates docs and slices, then compacts and runs one more tick —
  * the flat-or-not shape of the tick series is the 100 TB claim this
  * loop makes: per-tick cost = batch work + index scan, never corpus².
  *
  * Usage: runMain graft.tools.IngestLoopScaleBench <sfDir> [reps] [ticks]
  */
object IngestLoopScaleBench {
  import BenchUtil.fmt3

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args.lift(1).map(_.toInt).getOrElse(200)
    val ticks = args.lift(2).map(_.toInt).getOrElse(16)
    val spark = BenchUtil.scaleSession()

    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val corpusDir = graft.core.TmpDirs.scoped("loop_corpus")
    BenchUtil.replicateExplode(docs, "doc_id", reps)
      .write.mode("overwrite").parquet(corpusDir)
    val corpus = spark.read.parquet(corpusDir)
    val nCorpus = corpus.count()

    val idx = graft.core.TmpDirs.scoped("loop_idx")
    val out = graft.core.TmpDirs.scoped("loop_out")
    val tBuild = BenchUtil.time(TextDedup.writeIncrementalIndex(corpus, idx))
    System.err.println(
      s"[loop-bench] seed corpus n=$nCorpus, index build ${fmt3(tBuild)} s")

    def fresh(i: Int) = docs
      .withColumn("text", concat_ws(" ",
        transform(split(col("text"), " "), w => concat(w, lit(s"_t$i")))))
      .withColumn("doc_id", col("doc_id") + lit(20000000L + i * 100000L))
    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    val counts = scala.collection.mutable.LinkedHashMap[String, Long]()
    var survivors = 0L
    (0 until ticks).foreach { i =>
      val seedDups = docs.filter(col("doc_id") % 10 === 0)
        .withColumn("doc_id", col("doc_id") + lit(30000000L + i * 100000L))
      val prevDups =
        if (i == 0) fresh(0).limit(0)
        else fresh(i - 1).filter(col("doc_id") % 20 === 0)
          .withColumn("doc_id", col("doc_id") + lit(40000000L + i * 100000L))
      val batch = fresh(i).unionByName(seedDups).unionByName(prevDups)
        .localCheckpoint()
      val t0 = System.nanoTime()
      val n = DedupStream.ingestTick(spark, batch, idx, out, s"b$i")
      val dt = (System.nanoTime() - t0) / 1e9
      results(s"tick_$i") = dt
      counts(s"survivors_$i") = n
      survivors += n
      System.err.println(f"[loop-bench] tick $i%2d: ${fmt3(dt)} s, $n survivors")
    }

    val dst = graft.core.TmpDirs.scoped("loop_idx_compacted")
    results("compact") =
      BenchUtil.time(TextDedup.compactIncrementalIndex(spark, idx, dst))
    val lastBatch = fresh(ticks).unionByName(
      fresh(ticks - 1).filter(col("doc_id") % 20 === 0)
        .withColumn("doc_id", col("doc_id") + lit(50000000L)))
      .localCheckpoint()
    val tC = System.nanoTime()
    val nC = DedupStream.ingestTick(spark, lastBatch, dst, out, s"b$ticks")
    results("tick_after_compact") = (System.nanoTime() - tC) / 1e9
    counts("survivors_after_compact") = nC
    System.err.println(
      s"[loop-bench] compact ${fmt3(results("compact"))} s, " +
      s"post-compact tick ${fmt3(results("tick_after_compact"))} s, $nC survivors")

    // round-15 segment: cross the in-loop auto-compaction trigger. Tick
    // counts in this harness only reach O(10) slices, where the
    // slice-count tax (partition discovery + one footer per slice file
    // per table) is invisible under the fixed per-tick job tax — so
    // first ACCUMULATE slice count the cheap way (direct index appends
    // of tiny disjoint batches, the worst-case layout a long-running
    // small-batch stream produces), measure a tick on the bloated
    // index, then let the FIRST auto tick compact-and-swap in place
    // (DedupStream.compactIfNeeded — rename-based, replay-safe) and
    // watch the per-tick serving time reset.
    (0 until 60).foreach { j =>
      TextDedup.appendIncrementalIndex(
        docs.limit(20)
          .withColumn("text", concat_ws(" ",
            transform(split(col("text"), " "), w => concat(w, lit(s"_s$j")))))
          .withColumn("doc_id", col("doc_id") + lit(60000000L + j * 1000L)),
        idx, s"s$j")
    }
    System.err.println(s"[loop-bench] bloated index to slices=" +
      graft.core.FsPaths.countChildren(spark, s"$idx/hashes", "batch="))
    // one tick ON the bloated index (no compaction) = the creep number
    val bloatBatch = fresh(ticks + 100).localCheckpoint()
    val tB = System.nanoTime()
    counts("survivors_bloated") =
      DedupStream.ingestTick(spark, bloatBatch, idx, out, s"b${ticks + 100}")
    results("tick_bloated") = (System.nanoTime() - tB) / 1e9
    System.err.println(
      s"[loop-bench] bloated tick ${fmt3(results("tick_bloated"))} s")
    val maxSlices = math.max(2, ticks / 2)
    (ticks + 1 to ticks + 3).foreach { i =>
      val batch = fresh(i).localCheckpoint()
      val tc = System.nanoTime()
      val compacted = DedupStream.compactIfNeeded(spark, idx, maxSlices, s"b$i")
      val dtc = (System.nanoTime() - tc) / 1e9
      val t0 = System.nanoTime()
      val n = DedupStream.ingestTick(spark, batch, idx, out, s"b$i")
      val dt = (System.nanoTime() - t0) / 1e9
      results(s"auto_tick_$i") = dt
      if (compacted) results(s"auto_compact_$i") = dtc
      counts(s"auto_survivors_$i") = n
      System.err.println(f"[loop-bench] auto tick $i%2d: ${fmt3(dt)} s" +
        (if (compacted) s" (in-loop compact ${fmt3(dtc)} s)" else "") +
        s", $n survivors, slices=" +
        graft.core.FsPaths.countChildren(spark, s"$idx/hashes", "batch="))
    }

    val qs = (results.map { case (k, v) => "\"" + k + "\":" + fmt3(v) } ++
      counts.map { case (k, v) => "\"" + k + s"""\":$v""" })
      .mkString("{", ",", "}")
    println(s"""{"bench":"ingest_loop_scale","corpus_n":$nCorpus,""" +
      s""""reps":$reps,"ticks":$ticks,"index_build_sec":${fmt3(tBuild)},""" +
      s""""total_survivors":${survivors},"series":$qs}""")
    spark.stop()
  }
}
