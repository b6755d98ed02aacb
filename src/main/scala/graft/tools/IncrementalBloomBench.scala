package graft.tools

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.TextDedup

/** Measures the Bloom-prefilter crossover for incremental ingest dedup
  * (`TextDedup.incrementalSurvivors(bloomBits = ...)`): at what corpus
  * size does prefiltering the batch against a driver-held bit table beat
  * the plain hash anti-join?
  *
  * Setup mirrors a production ingest tick: a mostly-NEW batch with a 10%
  * exact-duplicate slice, against corpora grown by id-shifted
  * replication. The batch-side filter prunes the anti-join's CORPUS side
  * (its dominant cost) to ~|dups| + fpp·|corpus|, so the win should GROW
  * with the corpus; this bench walks the corpus axis to find where it
  * first beats the plain anti-join.
  *
  * Usage: runMain graft.tools.IncrementalBloomBench <sfDir> [trials] [reps...]
  */
object IncrementalBloomBench {
  import BenchUtil.{force, fmt3}

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val trials = args.lift(1).map(_.toInt).getOrElse(3)
    val repsList = if (args.length > 2) args.drop(2).map(_.toInt).toSeq
      else Seq(1, 20, 200)
    val spark = BenchUtil.scaleSession()

    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    // the batch: 90% genuinely new content — every TOKEN suffixed, so
    // the md5 and the entire shingle vocabulary are disjoint from the
    // corpus (a prefix-only change would leave the batch a near-dup of
    // its corpus twin and the measurement would time the near-dup
    // layer, not the exact layer the Bloom accelerates) — plus a 10%
    // exact-duplicate slice; checkpointed so batch construction stays
    // out of the measured times
    val batch = docs.filter(col("doc_id") % 10 =!= 0)
      .withColumn("text",
        concat_ws(" ", transform(split(col("text"), " "),
          w => concat(w, lit("_n")))))
      .unionByName(docs.filter(col("doc_id") % 10 === 0))
      .withColumn("doc_id", col("doc_id") + lit(10000000L))
      .localCheckpoint()

    val out = scala.collection.mutable.LinkedHashMap[String, Double]()
    val counts = scala.collection.mutable.LinkedHashMap[String, Long]()
    repsList.foreach { r =>
      // corpus materialized to parquet: every trial re-reads a real scan
      // (an in-memory lineage would re-run the replication instead)
      val dir = graft.core.TmpDirs.scoped(s"bloom_corpus_$r")
      BenchUtil.replicateExplode(docs, "doc_id", r)
        .write.mode("overwrite").parquet(dir)
      val corpus = spark.read.parquet(dir)
      val n = corpus.count()
      counts(s"corpus_${r}x") = n
      def run(bloom: Option[Int]): Double =
        BenchUtil.medianTrials(spark, trials)(force(
          TextDedup.incrementalSurvivors(batch, corpus, bloomBits = bloom)))
      out(s"plain_${r}x") = run(None)
      // sized for the BATCH build side: 128 Ki bits = 16 KiB for ~5.5k
      // batch hashes (~0.5% fpp) — corpus size does not size the filter
      out(s"bloom_${r}x") = run(Some(1 << 17))
      // the deployment shape: corpus index built ONCE (timed separately),
      // each tick reads it — the per-tick number to compare with plain
      val idxDir = graft.core.TmpDirs.scoped(s"bloom_idx_$r")
      out(s"index_build_${r}x") = BenchUtil.time(
        TextDedup.writeIncrementalIndex(corpus, idxDir))
      out(s"indexed_tick_${r}x") = BenchUtil.medianTrials(spark, trials)(force(
        TextDedup.incrementalSurvivorsIndexed(spark, batch, idxDir)))
      System.err.println(s"[bloom-bench] ${r}x (n=$n) done: " +
        s"plain=${fmt3(out(s"plain_${r}x"))} bloom=${fmt3(out(s"bloom_${r}x"))} " +
        s"idx_build=${fmt3(out(s"index_build_${r}x"))} " +
        s"idx_tick=${fmt3(out(s"indexed_tick_${r}x"))}")
    }

    val qs = (out.map { case (k, v) => "\"" + k + "\":" + fmt3(v) } ++
      counts.map { case (k, v) => "\"" + k + s"""\":$v""" })
      .mkString("{", ",", "}")
    spark.stop()
    println(s"""{"metric":"bloom_crossover","trials":$trials,"points":$qs}""")
  }
}
