package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.{Curation, Graph, Similarity, TextDedup}

/** Scale curves for the two expensive families ScaleCurveBench (machine
  * day) and DedupScaleBench (dedup) don't cover — the ANN QUERY path and
  * the curation pipeline — at 1× and 10× of sf0.1, i.e. sf1 volume
  * (round-15 verdict task 7: "two measured decades for every expensive
  * family").
  *
  * ANN: a persisted IVF and IVFPQ index is built at each scale with a
  * FIXED centroid stride, so list COUNT grows with the corpus and
  * per-list size stays ~constant — the production scaling knob — and a
  * fixed 200-query batch is served via `ivfTopKIndexed` /
  * `ivfPqTopKIndexed` (nProbe=2). Under this regime the per-query scan
  * is ~nProbe lists of constant size: the serving cost should stay
  * ~FLAT across the decade (the index build is reported separately —
  * it is the linear part).
  *
  * Curation: the corpus is replicated the DedupScaleBench way (exact
  * dups, the documented dup-heavy trap), so the measured configuration
  * is the scale-correct recipe — `TextDedup.dedupPipeline` first, then
  * `Curation.curateDeduped` on the survivors. The direct
  * `Curation.curate` (quality gate → banded near-dup, default df cap)
  * is also timed for the cost curve of the single-stage form.
  *
  * Usage: runMain graft.tools.FamilyScaleBench <sfDir> [reps] [trials]
  */
object FamilyScaleBench {
  import BenchUtil.{force, time, fmt3}

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(10)
    val trials = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = BenchUtil.scaleSession()

    def median(body: => Unit): Double =
      BenchUtil.medianTrials(spark, trials)(body)

    val out = scala.collection.mutable.LinkedHashMap[String, Double]()
    val counts = scala.collection.mutable.LinkedHashMap[String, Long]()

    // ---- ANN query path ------------------------------------------------
    val emb1 = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val queries = emb1.limit(200).localCheckpoint()
    Seq("1x" -> emb1, s"${reps}x" -> BenchUtil.replicateExplode(emb1, "vec_id", reps))
      .foreach { case (label, emb) =>
        // materialize the corpus as parquet, like a real serving corpus
        val corpusDir = graft.core.TmpDirs.scoped(s"famscale_emb_$label")
        emb.write.mode("overwrite").parquet(corpusDir)
        val corpus = spark.read.parquet(corpusDir)
        counts(s"ann_n_$label") = corpus.count()
        val idx = graft.core.TmpDirs.scoped(s"famscale_ivf_$label")
        out(s"ann_ivf_build_$label") =
          time(Similarity.writeIvfIndex(corpus, idx, centroidStride = 100L))
        counts(s"ann_lists_$label") =
          spark.read.parquet(s"$idx/centroids").count()
        out(s"ann_ivf_query_$label") = median(force(
          Similarity.ivfTopKIndexed(spark, idx, queries, k = 10, nProbe = 2)))
        val pqIdx = graft.core.TmpDirs.scoped(s"famscale_ivfpq_$label")
        out(s"ann_ivfpq_build_$label") = time(Similarity.writeIvfPqIndex(
          corpus, pqIdx, centroidStride = 100L, m = 8, ks = 16, maxIter = 3))
        out(s"ann_ivfpq_query_$label") = median(force(
          Similarity.ivfPqTopKIndexed(spark, pqIdx, queries, k = 10, nProbe = 2)))
        System.err.println(s"[fam-scale] ann $label: n=${counts(s"ann_n_$label")} " +
          s"lists=${counts(s"ann_lists_$label")} " +
          s"ivf_q=${fmt3(out(s"ann_ivf_query_$label"))}s " +
          s"ivfpq_q=${fmt3(out(s"ann_ivfpq_query_$label"))}s")
      }

    // ---- curation pipeline ---------------------------------------------
    val docs1 = Tables.documents(spark, sfDir).select("doc_id", "text")
    Seq("1x" -> docs1, s"${reps}x" -> BenchUtil.replicateById(docs1, "doc_id", reps))
      .foreach { case (label, docs) =>
        counts(s"cur_n_$label") = docs.count()
        // scale-correct recipe on a dup-heavy corpus: exact-first dedup,
        // near-dup among survivors, then gate + split
        out(s"cur_pipeline_$label") = median {
          val d = TextDedup.dedupPipeline(docs, k = 2, tau = 0.8)
          force(Curation.curateDeduped(
            Curation.qualityGate(d.keepers, minWords = 20, minQuality = 0.3),
            d.nearDupPairs))
        }
        // single-stage form with the production df cap, for the curve of
        // the path the catalog query exercises (oracle variant disables
        // the cap; here the cap is ON — the scale configuration)
        out(s"cur_direct_$label") = median(force(Curation.curate(docs)))
        System.err.println(s"[fam-scale] curation $label: " +
          s"n=${counts(s"cur_n_$label")} " +
          s"pipeline=${fmt3(out(s"cur_pipeline_$label"))}s " +
          s"direct=${fmt3(out(s"cur_direct_$label"))}s")
      }

    // ---- incremental dedup (growing-corpus serving cost) ----------------
    // a FIXED ~1000-doc near-dup batch against a 1× vs 10× corpus, both
    // forms: the DataFrame form re-shingles the corpus per call (cost
    // tracks the corpus — documented, the non-loop shape), the INDEXED
    // form reads the precomputed shingle slices (the ingest loop's path —
    // cost should track the BATCH and stay ~flat over the corpus decade;
    // the index build is the linear part, reported separately).
    val incrBatch = docs1.limit(1000)
      .select((col("doc_id") + lit(10000000L)).as("doc_id"),
        concat(col("text"), lit(" zz qq")).as("text"))
      .localCheckpoint()
    Seq("1x" -> docs1, s"${reps}x" -> BenchUtil.replicateById(docs1, "doc_id", reps))
      .foreach { case (label, docs) =>
        val corpusDir = graft.core.TmpDirs.scoped(s"famscale_docs_$label")
        docs.write.mode("overwrite").parquet(corpusDir)
        val corpus = spark.read.parquet(corpusDir)
        counts(s"dedup_n_$label") = corpus.count()
        out(s"dedup_incr_df_$label") = median(force(
          TextDedup.incrementalSurvivors(incrBatch, corpus, k = 2, tau = 0.8)))
        val idxDir = graft.core.TmpDirs.scoped(s"famscale_idx_$label")
        out(s"dedup_incr_index_build_$label") =
          time(TextDedup.writeIncrementalIndex(corpus, idxDir, k = 2))
        out(s"dedup_incr_indexed_$label") = median(force(
          TextDedup.incrementalSurvivorsIndexed(spark, incrBatch, idxDir,
            tau = 0.8)))
        // corpus n-gram statistics: bounded output, one shuffle — the
        // decade is pure aggregate volume
        out(s"text_top_ngrams_$label") = median {
          val sh = TextDedup.shingles(corpus, 2)
          force(sh.groupBy("shingle").agg(countDistinct("doc_id").as("doc_freq"))
            .orderBy(desc("doc_freq"), asc("shingle")).limit(20))
        }
        System.err.println(s"[fam-scale] dedup/text $label: " +
          s"n=${counts(s"dedup_n_$label")} " +
          s"incr_df=${fmt3(out(s"dedup_incr_df_$label"))}s " +
          s"incr_indexed=${fmt3(out(s"dedup_incr_indexed_$label"))}s " +
          s"top_ngrams=${fmt3(out(s"text_top_ngrams_$label"))}s")
      }

    // ---- graph: textrank + kcore over a SALTED decade --------------------
    // plain replication duplicates texts, leaving the bigram graph's
    // node/edge SET unchanged (only weights grow) — salting every word
    // with its replica index grows nodes AND edges ~10×, the honest
    // graph decade for iterative algorithms
    val docSpan = docs1.agg(max(col("doc_id"))).head().getLong(0) + 1
    def salted(r: Int): DataFrame =
      if (r <= 1) docs1
      else docs1.withColumn("__rep", explode(sequence(lit(0), lit(r - 1))))
        .select(
          (col("doc_id") + col("__rep").cast("long") * lit(docSpan)).as("doc_id"),
          when(col("__rep") === 0, col("text"))
            .otherwise(array_join(transform(split(col("text"), " "),
              w => concat(w, lit("_"), col("__rep").cast("string"))), " "))
            .as("text"))
    def bigramEdges(docs: DataFrame): DataFrame = docs
      .select(split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(ws) - 2), i -> struct(ws[i] AS src, ws[i + 1] AS dst))"))
        .as("b"))
      .select(col("b.src").as("src"), col("b.dst").as("dst"))
      .filter(length(col("src")) > 0 && length(col("dst")) > 0)
    Seq("1x" -> salted(1), s"${reps}x" -> salted(reps))
      .foreach { case (label, docs) =>
        val edgesDir = graft.core.TmpDirs.scoped(s"famscale_edges_$label")
        bigramEdges(docs).write.mode("overwrite").parquet(edgesDir)
        val edges = spark.read.parquet(edgesDir)
        counts(s"graph_edges_$label") = edges.count()
        out(s"graph_textrank_$label") = median {
          val pairs = edges.groupBy("src", "dst")
            .agg(count(lit(1)).cast("double").as("weight"))
          force(Graph.pageRank(pairs, iters = 10, damping = 0.85)
            .orderBy(desc("r"), asc("node")).limit(20))
        }
        out(s"graph_kcore_$label") = median(force(Graph.kCore(edges, k = 20)))
        System.err.println(s"[fam-scale] graph $label: " +
          s"edges=${counts(s"graph_edges_$label")} " +
          s"textrank=${fmt3(out(s"graph_textrank_$label"))}s " +
          s"kcore=${fmt3(out(s"graph_kcore_$label"))}s")
      }

    def exp10(family: String): Double =
      math.log10(out(s"${family}_${reps}x") / out(s"${family}_1x")) /
        math.log10(reps.toDouble)
    Seq("ann_ivf_query", "ann_ivfpq_query", "cur_pipeline", "cur_direct",
      "dedup_incr_df", "dedup_incr_indexed", "text_top_ngrams",
      "graph_textrank", "graph_kcore")
      .foreach { f =>
        out(s"${f}_exponent") = exp10(f)
        System.err.println(s"[fam-scale] $f scaling exponent over one decade: " +
          fmt3(exp10(f)))
      }

    val qs = (out.map { case (k, v) => "\"" + k + "\":" + fmt3(v) } ++
      counts.map { case (k, v) => "\"" + k + s"""\":$v""" }).mkString(",")
    println(s"""{"bench":"family_scale","sf_dir":"$sfDir","reps":$reps,$qs}""")
    spark.stop()
  }
}
