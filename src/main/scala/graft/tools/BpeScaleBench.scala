package graft.tools

import graft.core.Tables
import graft.ops.TextAnalysis

/** Merge-count ladder for BPE training (round-15 verdict task 3): the
  * distributed loop is one cluster job per merge — fine at the fixture's
  * 20 merges, a driver-coordination bottleneck at a production 32 k-merge
  * vocab — so [[TextAnalysis.bpeMerges]] grew a local endgame that
  * collects the vocab-bounded word-frequency table and finishes the
  * merges on the driver with incremental pair counts. This bench measures
  * both paths on the same corpus: the distributed loop at a small merge
  * count (enough to price one merge-round job), the local path up the
  * ladder (100 / 1 000 merges), plus the vocab-collect cost the local
  * path pays once. Findings go to PLANS.md.
  *
  * Usage: runMain graft.tools.BpeScaleBench <sfDir> [distMerges] [ladder] [hopMerges]
  * e.g. `BpeScaleBench /root/testdata/sf0.1 20 100,1000 12`
  * `hopMerges` (default 12) sizes the round-17 mid-train-hop arm;
  * `GRAFT_BPE_HOP_ONLY=1` runs only that arm (the dense distributed
  * control alone is ~10 minutes).
  */
object BpeScaleBench {
  import BenchUtil.{force, time, fmt3}

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val distMerges = args.lift(1).map(_.toInt).getOrElse(20)
    val ladder = args.lift(2).map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(100, 1000))
    val spark = BenchUtil.scaleSession()

    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
      .localCheckpoint()
    // natural-language fixture vocab saturates under 100 merges (every
    // word fully merged) — the DENSE corpus (spaces stripped, each doc
    // one long "word") sustains thousands, which is what the ladder
    // needs to price deep merge chains
    val dense = docs.select(org.apache.spark.sql.functions.col("doc_id"),
      org.apache.spark.sql.functions.regexp_replace(
        org.apache.spark.sql.functions.col("text"), " ", "").as("text"))
      .localCheckpoint()
    val out = scala.collection.mutable.LinkedHashMap[String, Double]()
    val counts = scala.collection.mutable.LinkedHashMap[String, Long]()

    // minPairCount=1 so the ladder is depth-limited by the vocab, not the
    // frequency floor — the point is merge-loop cost, not table content
    def run(tag: String, corpus: org.apache.spark.sql.DataFrame, n: Int,
        maxSyms: Long): Unit = {
      var rows = 0L
      out(tag) = time {
        val m = TextAnalysis.bpeMerges(corpus, numMerges = n,
          minPairCount = 1L, localFinishMaxSyms = maxSyms)
        rows = m.count()
        force(m)
      }
      counts(tag) = rows
      println(s"[bpe-scale] $tag: ${fmt3(out(tag))} s, $rows merges emitted")
    }

    // GRAFT_BPE_HOP_ONLY=1 runs just the round-17 hop arm (the older
    // arms' numbers are already in PLANS.md and the dense distributed
    // arm alone is ~10 minutes)
    val hopOnly = sys.env.get("GRAFT_BPE_HOP_ONLY").contains("1")
    if (!hopOnly) {
      run(s"dist_$distMerges", docs, distMerges, 0L)
      ladder.foreach(n => run(s"local_$n", docs, n, Long.MaxValue))
      run(s"dist_dense_$distMerges", dense, distMerges, 0L)
      ladder.foreach(n => run(s"local_dense_$n", dense, n, Long.MaxValue))
    }

    // round-17 arm (verdict-16 task 5): a corpus entering JUST ABOVE the
    // gate starts distributed and hops to the driver loop at the first
    // checkpoint (merges strictly shrink the symbol mass) — priced
    // head-to-head against the pure distributed loop at the same merge
    // count, on the natural corpus and the adversarial dense one. Entry
    // mass mirrors the trainer's gate exactly: total characters over the
    // DISTINCT words of the space-split corpus.
    locally {
      import org.apache.spark.sql.functions._
      val hopMerges = args.lift(3).map(_.toInt).getOrElse(12)
      def entryMass(corpus: org.apache.spark.sql.DataFrame): Long = corpus
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) > 0).select(col("w")).distinct()
        .agg(coalesce(sum(length(col("w"))), lit(0L)).cast("long"))
        .head().getLong(0)
      Seq("" -> docs, "dense_" -> dense).foreach { case (tag, corpus) =>
        val mass = entryMass(corpus)
        run(s"hop_$tag$hopMerges", corpus, hopMerges, mass - 1)
        run(s"distonly_$tag$hopMerges", corpus, hopMerges, 0L)
        println(s"[bpe-scale] hop arm ($tag): entry mass $mass vs gate ${mass - 1}; " +
          s"hop ${fmt3(out(s"hop_$tag$hopMerges"))} s vs pure distributed " +
          fmt3(out(s"distonly_$tag$hopMerges")) + s" s at $hopMerges merges")
      }
    }

    // ENCODE at depth: the Column-chain tier's plan grows one layer per
    // merge (analyzer bill ∝ vocab size), the mapPartitions fast tier
    // replays the same passes as JVM loops. Chain measured at 100
    // merges; fast at 100 and the full ladder top.
    if (!hopOnly) {
      val top = ladder.max
      val mergesDeep = TextAnalysis.bpeMerges(dense, numMerges = top,
        minPairCount = 1L).localCheckpoint()
      val m100 = mergesDeep.filter(
        org.apache.spark.sql.functions.col("rank") <= 100).localCheckpoint()
      out("encode_chain_100") = time(force(
        TextAnalysis.bpeEncode(dense, m100, maxChainMerges = Int.MaxValue)))
      println(s"[bpe-scale] encode_chain_100: ${fmt3(out("encode_chain_100"))} s")
      out("encode_fast_100") = time(force(TextAnalysis.bpeEncode(dense, m100)))
      println(s"[bpe-scale] encode_fast_100: ${fmt3(out("encode_fast_100"))} s")
      out(s"encode_fast_$top") = time(force(TextAnalysis.bpeEncode(dense, mergesDeep)))
      println(s"[bpe-scale] encode_fast_$top: ${fmt3(out(s"encode_fast_$top"))} s")
      val perDistMerge = out(s"dist_$distMerges") /
        math.max(1L, counts(s"dist_$distMerges"))
      println(s"[bpe-scale] distributed per-merge cost ${fmt3(perDistMerge)} s " +
        s"-> a 32k vocab extrapolates to ${fmt3(perDistMerge * 32768)} s; " +
        s"local dense path did ${counts(s"local_dense_$top")} merges in " +
        fmt3(out(s"local_dense_$top")) + " s total")
    }
    val qs = (out.map { case (k, v) => "\"" + k + "\":" + fmt3(v) } ++
      counts.map { case (k, v) => "\"" + k + "_merges\":" + v }).mkString(",")
    println(s"""{"metric":"bpe_scale","sf_dir":"$sfDir",$qs}""")
    spark.stop()
  }
}
