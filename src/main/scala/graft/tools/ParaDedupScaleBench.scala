package graft.tools

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.TextDedup

/** Scale probe for [[TextDedup.dedupParagraphs]] on the worst realistic
  * layout: a replicated corpus where EVERY paragraph is duplicated
  * r-fold across documents (boilerplate everywhere), so the keep-first
  * aggregate's groups all carry r rows and the rewrite touches every
  * document. What this pins:
  *   - the packed-key min stays one map-side-combined HashAggregate —
  *     no skew cliff when a paragraph hash holds the whole replication
  *     factor (the partial pass collapses it per partition);
  *   - the text column shuffles exactly once (the final doc-keyed
  *     join), so wall time tracks corpus size, not paragraph-row count.
  *
  * Usage: runMain graft.tools.ParaDedupScaleBench <sfDir> [reps] [trials]
  */
object ParaDedupScaleBench {
  import BenchUtil.{force, fmt3}

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args.lift(1).map(_.toInt).getOrElse(20)
    val trials = args.lift(2).map(_.toInt).getOrElse(1)
    val spark = BenchUtil.scaleSession()

    // the SAME chunk builder as the ext_dedup_paragraphs catalog entry —
    // shared definition, so the probe can't drift from the query it pins
    val chunked = graft.queries.ExtQueries.chunkedDocs(
      Tables.documents(spark, sfDir).select("doc_id", "text"))
    val dir = graft.core.TmpDirs.scoped("para_corpus")
    // explode form: a 2000-branch union chokes the analyzer at the 10M
    // point long before any data moves (same guard as ZipfDedupBench);
    // repartition before the write so the measured read starts from the
    // same even 128-file layout at every rep count — replicateExplode
    // otherwise emits as few files as the SOURCE had tasks, and a
    // 2-file 10M-row corpus would confound the measurement with read
    // parallelism
    (if (reps > 64) BenchUtil.replicateExplode(chunked, "doc_id", reps)
     else BenchUtil.replicateById(chunked, "doc_id", reps))
      .repartition(128)
      .write.mode("overwrite").parquet(dir)
    val corpus = spark.read.parquet(dir)
    val n = corpus.count()
    System.err.println(s"[para-dedup] corpus n=$n reps=$reps")

    val t = BenchUtil.medianTrials(spark, trials)(force(
      TextDedup.dedupParagraphs(corpus)))
    val out = TextDedup.dedupParagraphs(corpus)
      .agg(count(lit(1)).as("docs"), sum("n_kept").as("kept"),
        sum("n_dropped").as("dropped")).head()
    System.err.println(s"[para-dedup] dedupParagraphs ${fmt3(t)} s " +
      s"survivingDocs=${out.getLong(0)} kept=${out.getLong(1)} " +
      s"dropped=${out.getLong(2)}")
    spark.stop()
  }
}
