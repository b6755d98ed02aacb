package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.TextAnalysis

/** Scale stress for the token-statistics family (termWeights /
  * unigramLogProb / pmiCooccurrence): the corpus replicated `reps` ways.
  * These operators all materialize a token-stream-sized intermediate —
  * the (doc, term, tf) count table or the df-capped presence table — for
  * multi-consumer reuse, and that intermediate is the scale hazard this
  * bench probes: it is comparable in size to the tokenized corpus, so
  * its storage level decides whether storage memory starves the
  * downstream hash aggregates (the failure mode first measured on the
  * DSIR tf table — see PLANS.md round-13).
  *
  * Usage: runMain graft.tools.TextScaleBench <sfDir> [reps] [trials]
  */
object TextScaleBench {
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
    Seq(1, reps).foreach { r =>
      val docs = if (r == 1) docs1 else replicated(r)
      val n = docs.count()
      out(s"bm25_${r}x") = median(force(TextAnalysis.termWeights(docs)))
      out(s"perplexity_${r}x") = median(force(TextAnalysis.unigramLogProb(docs)))
      out(s"pmi_${r}x") = median(force(
        TextAnalysis.pmiCooccurrence(docs, minPairCount = math.max(2L, r / 2L))))
      println(s"[text-scale] ${r}x: n=$n " +
        s"bm25=${fmt3(out(s"bm25_${r}x"))}s " +
        s"perplexity=${fmt3(out(s"perplexity_${r}x"))}s " +
        s"pmi=${fmt3(out(s"pmi_${r}x"))}s")
    }
    println(s"[text-scale] bm25 growth at ${reps}x volume: " +
      fmt3(out(s"bm25_${reps}x") / out("bm25_1x")) + "x")
    spark.stop()
  }
}
