package graft.tools

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.TextDedup

/** The 10M-document pin for the exact-first dedup pipeline on the
  * realistic web-dup profile: a Zipf-duplicated corpus (head document
  * ~target/H_n copies, long unique tail — [[BenchUtil.replicateZipf]]).
  * What this proves at a scale the sandbox still holds:
  *   - `exactGroups` stays one map-side-combined shuffle even when one
  *     md5 group holds a million rows (count/min partial aggregation
  *     collapses the head before the exchange — no skew cliff);
  *   - the composed `dedupPipeline` (exact-first, then near-dup among
  *     exact-unique survivors) pays the corpus size ONLY in that one
  *     exact pass — the near-dup stage sees the ~n_base unique texts
  *     regardless of duplication depth.
  *
  * Usage: runMain graft.tools.ZipfDedupBench <sfDir> [targetRows] [trials]
  */
object ZipfDedupBench {
  import BenchUtil.{force, fmt3}

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val target = args.lift(1).map(_.toLong).getOrElse(10000000L)
    val trials = args.lift(2).map(_.toInt).getOrElse(1)
    val spark = BenchUtil.scaleSession()

    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val dir = graft.core.TmpDirs.scoped("zipf_corpus")
    BenchUtil.replicateZipf(docs, "doc_id", target)
      .write.mode("overwrite").parquet(dir)
    val corpus = spark.read.parquet(dir)
    val n = corpus.count()
    val headGroup = corpus.groupBy(md5(col("text"))).count()
      .agg(max("count")).head().getLong(0)
    System.err.println(s"[zipf-dedup] corpus n=$n headGroup=$headGroup")

    val tExact = BenchUtil.medianTrials(spark, trials)(force(
      TextDedup.exactGroups(corpus)))
    System.err.println(s"[zipf-dedup] exactGroups ${fmt3(tExact)} s")
    val tPipeline = BenchUtil.medianTrials(spark, trials)(force(
      TextDedup.dedupPipeline(corpus, k = 2, tau = 0.8).keepers))
    System.err.println(s"[zipf-dedup] pipeline ${fmt3(tPipeline)} s")
    val keepers = TextDedup.dedupPipeline(corpus, k = 2, tau = 0.8)
      .keepers.count()

    spark.stop()
    println(s"""{"metric":"zipf_dedup","target":$target,"n":$n,""" +
      s""""head_group":$headGroup,"exact_s":${fmt3(tExact)},""" +
      s""""pipeline_s":${fmt3(tPipeline)},"keepers":$keepers}""")
  }
}
