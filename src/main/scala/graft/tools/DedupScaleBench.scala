package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.TextDedup

/** Scale stress for the dedup family on its adversarial input: a corpus
  * where EVERY document is duplicated `reps` ways (the documents table
  * unioned `reps` times with shifted ids, text unchanged). Replication is
  * the worst case for candidate generation — every shingle's df grows
  * `reps`×, every LSH band bucket gets `reps`× members, and every dup
  * group contributes C(reps,2) output pairs — so this measures whether
  * the bucketed designs degrade with duplication factor or stay bounded
  * by bucket geometry. (Pair LISTING output is inherently quadratic in
  * the duplication factor; the scale path for full dedup is `clusters`,
  * which is linear in group size. Both are measured.)
  *
  * Usage: runMain graft.tools.DedupScaleBench <sfDir> [reps] [trials]
  */
object DedupScaleBench {
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

    val out = scala.collection.mutable.LinkedHashMap[String, Double]()
    val counts = scala.collection.mutable.LinkedHashMap[String, Long]()
    Seq("1x" -> docs1, s"${reps}x" -> replicated(reps)).foreach { case (label, docs) =>
      out(s"exact_$label") = median(force(TextDedup.exactGroups(docs)))
      // default df cap ON: this is the production/scale configuration
      // (the oracle-identity catalog variant disables it)
      out(s"jaccard_$label") = median(force(
        TextDedup.jaccardPairs(docs, k = 2, tau = 0.8)))
      out(s"minhash_$label") = median(force(
        TextDedup.minHashPairs(docs, k = 2, numHashes = 128,
          rowsPerBand = 4, tau = 0.8)))
      out(s"clusters_$label") = median(force(
        TextDedup.clusters(TextDedup.jaccardPairs(docs, k = 2, tau = 0.8))))
      // the composed production ordering: exact-first then LSH among the
      // exact-unique survivors — this is the path whose time should stay
      // ~FLAT under replication (the near-dup stage sees only unique
      // content; only the one-shuffle exact stage grows with reps)
      out(s"pipeline_$label") = median(force(
        TextDedup.dedupPipeline(docs, k = 2, tau = 0.8).keepers))
      counts(s"jaccard_pairs_$label") =
        TextDedup.jaccardPairs(docs, k = 2, tau = 0.8).count()
      counts(s"minhash_pairs_$label") =
        TextDedup.minHashPairs(docs, k = 2, numHashes = 128,
          rowsPerBand = 4, tau = 0.8).count()
      counts(s"pipeline_keepers_$label") =
        TextDedup.dedupPipeline(docs, k = 2, tau = 0.8).keepers.count()
      System.err.println(s"[dedup-scale] $label done")
    }

    val qs = (out.map { case (k, v) => "\"" + k + "\":" + fmt3(v) } ++
      counts.map { case (k, v) => "\"" + k + s"""\":$v""" })
      .mkString("{", ",", "}")
    spark.stop()
    println(s"""{"metric":"dedup_scale","reps":$reps,"trials":$trials,"points":$qs}""")
  }
}
