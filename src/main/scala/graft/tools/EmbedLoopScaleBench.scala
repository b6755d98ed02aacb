package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.Similarity
import graft.streaming.EmbedIngest

/** The embedding ingest loop at scale: seed a replicated vector corpus
  * into an IVF index, then run N `EmbedIngest.ingestTick`s and watch
  * the per-tick series for flatness. Fresh content per tick is the
  * corpus CYCLICALLY SHIFTED by a tick-dependent offset (a coordinate
  * permutation — preserves norms, scrambles directions, so cross-tick
  * cosines look random ~0±0.12 while exact copies stay cosine 1);
  * each tick also carries 10% exact dups of the SEED and 5% exact dups
  * of the PREVIOUS tick's fresh vectors (droppable only if the index
  * append really grew the corpus).
  *
  * Usage: runMain graft.tools.EmbedLoopScaleBench <sfDir> [reps] [ticks] [stride]
  */
object EmbedLoopScaleBench {
  import BenchUtil.fmt3

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args.lift(1).map(_.toInt).getOrElse(50)
    val ticks = args.lift(2).map(_.toInt).getOrElse(12)
    val stride = args.lift(3).map(_.toLong).getOrElse(500L)
    val spark = BenchUtil.scaleSession()

    val emb = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val corpusDir = graft.core.TmpDirs.scoped("eloop_corpus")
    // pin the corpus layout (the ParaDedupScaleBench round-15 lesson):
    // replicateExplode emits as few parquet files as the SOURCE had
    // tasks, and a 1M-row corpus in 1-2 files starves every downstream
    // scan of parallelism — the bench would measure the fixture's file
    // count, not the operator
    BenchUtil.replicateExplode(emb, "vec_id", reps)
      .repartition(128)
      .write.mode("overwrite").parquet(corpusDir)
    val corpus = spark.read.parquet(corpusDir)
    val nCorpus = corpus.count()

    val idx = graft.core.TmpDirs.scoped("eloop_idx")
    val out = graft.core.TmpDirs.scoped("eloop_out")
    val tBuild = BenchUtil.time(Similarity.writeIvfIndex(corpus, idx, stride))
    val nLists = spark.read.parquet(s"$idx/centroids").count()
    System.err.println(s"[eloop-bench] seed n=$nCorpus, $nLists lists, " +
      s"index build ${fmt3(tBuild)} s")

    // cyclic coordinate shift by (7i+1) mod dim — a per-tick permutation
    def fresh(i: Int): DataFrame = {
      val k = (7 * i + 1) % dim
      emb.select((col("vec_id") + lit(20000000L + i * 100000L)).as("vec_id"),
        concat(slice(col("embedding"), k + 1, dim - k),
          slice(col("embedding"), 1, k)).as("embedding"))
    }
    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    val counts = scala.collection.mutable.LinkedHashMap[String, Long]()
    (0 until ticks).foreach { i =>
      val seedDups = emb.filter(col("vec_id") % 10 === 0)
        .select((col("vec_id") + lit(30000000L + i * 100000L)).as("vec_id"),
          col("embedding"))
      val prevDups =
        if (i == 0) fresh(0).limit(0)
        else fresh(i - 1).filter(col("vec_id") % 20 === 0)
          .withColumn("vec_id", col("vec_id") + lit(25000000L))
      val batch = fresh(i).unionByName(seedDups).unionByName(prevDups)
        .localCheckpoint()
      val t0 = System.nanoTime()
      val n = EmbedIngest.ingestTick(spark, batch, idx, out, s"b$i",
        tau = 0.8, nProbe = 2, centroidStride = stride)
      val dt = (System.nanoTime() - t0) / 1e9
      results(s"tick_$i") = dt
      counts(s"survivors_$i") = n
      System.err.println(f"[eloop-bench] tick $i%2d: ${fmt3(dt)} s, $n survivors")
    }

    // round-15 segment: bloat the slice count with tiny direct appends
    // (the long-running small-batch worst case), measure a tick on the
    // bloated index, then cross the in-loop maxSlices trigger
    // (EmbedIngest.compactIfNeeded) and watch the serving time reset.
    (0 until 60).foreach { j =>
      Similarity.appendIvfIndex(spark, fresh(1000 + j).limit(20), idx, s"s$j")
    }
    System.err.println(s"[eloop-bench] bloated index to slices=" +
      graft.core.FsPaths.countChildren(spark, s"$idx/lists", "batch="))
    val bloatBatch = fresh(ticks + 100).localCheckpoint()
    val tB = System.nanoTime()
    counts("survivors_bloated") = EmbedIngest.ingestTick(spark, bloatBatch,
      idx, out, s"b${ticks + 100}", tau = 0.8, nProbe = 2, centroidStride = stride)
    results("tick_bloated") = (System.nanoTime() - tB) / 1e9
    System.err.println(
      s"[eloop-bench] bloated tick ${fmt3(results("tick_bloated"))} s")
    (ticks + 1 to ticks + 3).foreach { i =>
      val batch = fresh(i).localCheckpoint()
      val tc = System.nanoTime()
      val compacted = EmbedIngest.compactIfNeeded(
        spark, idx, maxSlices = math.max(2, ticks / 2), currentTag = s"b$i")
      val dtc = (System.nanoTime() - tc) / 1e9
      val t0 = System.nanoTime()
      val n = EmbedIngest.ingestTick(spark, batch, idx, out, s"b$i",
        tau = 0.8, nProbe = 2, centroidStride = stride)
      val dt = (System.nanoTime() - t0) / 1e9
      results(s"auto_tick_$i") = dt
      if (compacted) results(s"auto_compact_$i") = dtc
      counts(s"auto_survivors_$i") = n
      System.err.println(f"[eloop-bench] auto tick $i%2d: ${fmt3(dt)} s" +
        (if (compacted) s" (in-loop compact ${fmt3(dtc)} s)" else "") +
        s", $n survivors, slices=" +
        graft.core.FsPaths.countChildren(spark, s"$idx/lists", "batch="))
    }

    // round-16 segment (verdict task 5): drift the ladder mid-run at
    // THIS seed scale and watch the rebuild fire, reset the serving
    // cost, and recover recall. Enabled by arg 5 = "drift". Drifted
    // batches carry a strong shared component on axis 0 (the
    // R15DriftProbe recipe) that the frozen quantizer never trained on,
    // so appended mass piles into hot lists; recall is measured on 200
    // held-out drifted queries against the brute-force exact top-10
    // over the index's CURRENT contents.
    if (args.lift(4).contains("drift")) {
      // per-tick fresh directions (cyclic shift, like the main ladder)
      // PLUS the shared axis-0 drift component; ticks ingest at
      // tau=0.99 (the R15DriftProbe recipe) because the 4.0 component
      // makes ALL drifted vectors mutually ~0.94-cosine — at 0.8 every
      // batch would collapse to one survivor and nothing would append
      def drifted(i: Int): DataFrame = {
        val k = (7 * i + 3) % dim
        emb.select((col("vec_id") + lit(50000000L + i.toLong * 100000L)).as("vec_id"),
          transform(
            concat(slice(col("embedding"), k + 1, dim - k),
              slice(col("embedding"), 1, k)),
            (x, j) => when(j === 0, lit(4.0f)).otherwise(x)).as("embedding"))
      }
      // Queries: small perturbations of tick-0's drifted vectors, so each
      // query has a GENUINE nearest neighbor (its source, cosine ~1 with
      // a ~0.05 margin over everything else) — recall@1 is well-posed.
      // recall@k>1 is NOT on this geometry: all drifted vectors sit at
      // ~0.94 cosine of each other (near-ties), so pre-rebuild "high
      // recall" would only measure that the hot list IS a full scan.
      // The drift failure mode here is the probe BILL (rows scanned per
      // query), exactly as R15DriftProbe measured on uniform-direction
      // corpora.
      val queries = drifted(0).limit(200)
        .select((col("vec_id") + lit(900000000L)).as("vec_id"),
          transform(col("embedding"),
            (x, j) => when(j === 1, x * lit(1.05f)).otherwise(x))
            .as("embedding"))
        .localCheckpoint()
      val sourceIds = drifted(0).limit(200)
        .select((col("vec_id") + lit(900000000L)).as("q_id"),
          col("vec_id").as("n_id")).localCheckpoint()
      def recall1(): Double =
        Similarity.ivfTopKIndexed(spark, idx, queries, k = 1, nProbe = 2)
          .select("q_id", "n_id")
          .join(sourceIds, Seq("q_id", "n_id"), "left_semi").count().toDouble /
          200.0
      // rows an nProbe=2 probe actually scans, averaged over the queries
      // — the serving bill hot-list drift inflates
      def probeBill(): Double = {
        val sizes = spark.read.parquet(s"$idx/lists")
          .groupBy("list_id").agg(count(lit(1)).as("sz"))
        Similarity.ivfProbeCells(spark, idx, queries, nProbe = 2)
          .join(sizes, "list_id")
          .agg(coalesce(sum(col("sz")), lit(0L))).head().getLong(0) / 200.0
      }
      def hotShare(): Double = {
        val r = Similarity.ivfListStats(spark, idx)
          .filter(col("batch") =!= "base")
          .groupBy("list_id").agg(sum("n").as("n"))
          .agg(coalesce(sum(col("n")), lit(0L)), coalesce(max(col("n")), lit(0L)))
          .head()
        if (r.getLong(0) == 0L) 0.0 else r.getLong(1).toDouble / r.getLong(0)
      }
      (0 until 3).foreach { i =>
        val batch = drifted(i).localCheckpoint()
        val t0 = System.nanoTime()
        val n = EmbedIngest.ingestTick(spark, batch, idx, out, s"d$i",
          tau = 0.99, nProbe = 2, centroidStride = stride)
        results(s"drift_tick_$i") = (System.nanoTime() - t0) / 1e9
        counts(s"drift_survivors_$i") = n
        System.err.println(f"[eloop-bench] drift tick $i%2d: " +
          fmt3(results(s"drift_tick_$i")) + s" s, $n survivors")
      }
      results("drift_hot_share_before") = hotShare()
      results("drift_recall1_before") = recall1()
      results("drift_probe_rows_before") = probeBill()
      System.err.println(s"[eloop-bench] pre-rebuild hotShare=" +
        fmt3(results("drift_hot_share_before")) + " recall@1=" +
        fmt3(results("drift_recall1_before")) + " probe_rows/query=" +
        fmt3(results("drift_probe_rows_before")))
      // arg 6 overrides the REBUILD's centroid stride (the lever the 1 M
      // run identified: stride == expected rows/list, so a drift
      // response that wants smaller drifted lists rebuilds at a smaller
      // stride than the ingest path trained with); arg 6 = "auto" lets
      // the loop DERIVE it from the measured bill
      // (EmbedIngest.deriveRebuildStride — round-16 verdict task 3)
      val autoStride = args.lift(5).contains("auto")
      val rebuildStride =
        if (autoStride) {
          // derive ONCE here, untimed, and hand the result to the timed
          // rebuild as an explicit stride: letting rebuildIfDrifted's
          // own autoStride path re-run the stats aggregation INSIDE the
          // drift_rebuild_sec window would bias the head-to-head
          // rebuild-cost comparison against the manual-stride arms. The
          // derivation's own cost is recorded separately.
          val t0 = System.nanoTime()
          val d = EmbedIngest.deriveRebuildStrideInfo(spark, idx, stride, "d3")
          results("drift_stride_derive_sec") = (System.nanoTime() - t0) / 1e9
          results("drift_auto_stride") = d.stride.toDouble
          results("drift_measured_bill") = d.measuredBill
          counts("drift_stride_saturated") = if (d.saturated) 1L else 0L
          // the per-rebuild telemetry marker (round-17 verdict task 3) —
          // same line rebuildIfDrifted's own autoStride path emits
          System.err.println(s"[eloop-bench] ${d.telemetryJson}")
          d.stride
        } else args.lift(5).map(_.toLong).getOrElse(stride)
      val tR = System.nanoTime()
      val fired = EmbedIngest.rebuildIfDrifted(spark, idx,
        hotShareThreshold = 0.05, centroidStride = rebuildStride,
        currentTag = "d3", minRows = 1000L)
      results("drift_rebuild_sec") = (System.nanoTime() - tR) / 1e9
      counts("drift_rebuild_fired") = if (fired) 1L else 0L
      results("drift_recall1_after") = recall1()
      results("drift_probe_rows_after") = probeBill()
      System.err.println(s"[eloop-bench] rebuild fired=$fired in " +
        fmt3(results("drift_rebuild_sec")) + " s, recall@1=" +
        fmt3(results("drift_recall1_after")) + " probe_rows/query=" +
        fmt3(results("drift_probe_rows_after")))
      if (autoStride) {
        // the verdict-16 bar: the self-tuned rebuild's bill lands within
        // 2x of the DESIGN target (nProbe x design rows/list) with no
        // hand-picked stride
        val target = 2.0 * stride
        results("drift_bill_target") = target
        System.err.println("[eloop-bench] auto-stride bill " +
          fmt3(results("drift_probe_rows_after")) +
          s" vs design target ${fmt3(target)} rows/query" +
          s" (ratio ${fmt3(results("drift_probe_rows_after") / target)})")
      }
      (3 until 6).foreach { i =>
        val batch = drifted(i).localCheckpoint()
        val t0 = System.nanoTime()
        val n = EmbedIngest.ingestTick(spark, batch, idx, out, s"d$i",
          tau = 0.99, nProbe = 2, centroidStride = stride)
        results(s"drift_tick_$i") = (System.nanoTime() - t0) / 1e9
        counts(s"drift_survivors_$i") = n
        System.err.println(f"[eloop-bench] post-rebuild drift tick $i%2d: " +
          fmt3(results(s"drift_tick_$i")) + s" s, $n survivors")
      }
    }

    val qs = (results.map { case (k, v) => "\"" + k + "\":" + fmt3(v) } ++
      counts.map { case (k, v) => "\"" + k + s"""\":$v""" })
      .mkString("{", ",", "}")
    println(s"""{"bench":"embed_loop_scale","corpus_n":$nCorpus,""" +
      s""""n_lists":$nLists,"reps":$reps,"ticks":$ticks,""" +
      s""""index_build_sec":${fmt3(tBuild)},"series":$qs}""")
    spark.stop()
  }
}
