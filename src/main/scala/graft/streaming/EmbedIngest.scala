package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** The embedding-corpus twin of [[DedupStream]]'s growing-corpus loop:
  * each tick semantically deduplicates a batch of vectors and grows a
  * persisted IVF index with the survivors, so later ticks deduplicate
  * against the seed corpus PLUS every earlier batch's survivors — a
  * continuously-growing semantically-deduped embedding corpus whose
  * dedup check is served by the very ANN index being grown.
  *
  * Scale shape: the vs-corpus check is an IVF PROBE (each batch vector
  * scans ~nProbe/nLists of the index through dynamic partition pruning),
  * never batch × corpus brute force — the approximation the probe buys
  * is the standard SemDedup trade: a near-dup in an unprobed list is
  * MISSED (kept), never the reverse, so removals are always a subset of
  * the exact τ-graph removals (pinned in EmbedIngestSpec). Exact
  * duplicates are immune to the approximation: an identical vector ranks
  * the centroids identically, so its twin's list is always probed.
  */
object EmbedIngest {

  /** One tick of the embedding ingest loop (the `foreachBatch` body of
    * [[incrementalIngest]], directly callable for scheduled-batch
    * ingest). Three layers, then the corpus grows:
    *
    *   1. intra-batch semantic dedup: connected components over the
    *      batch's exact cosine ≥ τ pairs, min-id keeper per cluster
    *      (batch-bounded, so the exact pair graph is affordable);
    *   2. vs-corpus: each keeper probes the persisted IVF index
    *      (top-1, `nProbe` lists, own tag excluded for replay safety)
    *      and is dropped when its best probed cosine ≥ τ;
    *   3. survivors are appended to the index as an idempotent
    *      `batch=<tag>` slice ([[Similarity.appendIvfIndex]]) and
    *      written to `outDir/batch=<tag>` — OVERWRITE per tag, so
    *      foreachBatch replays rewrite their own slices.
    *
    * Bootstrap: if `indexDir` has no centroid table yet, the FIRST
    * tick trains the coarse quantizer from its own intra-deduped batch
    * ([[Similarity.writeIvfCentroids]]) — centroids are frozen from
    * then on; monitor [[Similarity.ivfListStats]] for drift and rebuild
    * on cadence.
    *
    * @return number of surviving vectors appended this tick.
    */
  def ingestTick(
      spark: SparkSession,
      batch: DataFrame,
      indexDir: String,
      outDir: String,
      batchTag: String,
      tau: Double = 0.8,
      nProbe: Int = 2,
      centroidStride: Long = 100L,
      idCol: String = "vec_id",
      embCol: String = "embedding"): Long = {
    // (idCol, embedding) projection for the dedup machinery; survivors
    // are re-joined against the ORIGINAL batch before writing, so any
    // metadata columns riding along (text, url, ...) reach the output —
    // same contract as the text loop
    val vecs = batch.select(col(idCol), col(embCol).as("embedding"))
    val keeperIds = Similarity.dedupByEmbedding(vecs, tau, idCol)
      .filter(col("is_keeper") === 1).select(idCol)
    // Hadoop FS, not java.io.File: the index lives wherever parquet does
    // (HDFS/S3 at deployment) — a local-only existence check would
    // silently skip the vs-corpus dedup there
    def exists(p: String): Boolean = {
      val path = new org.apache.hadoop.fs.Path(p)
      path.getFileSystem(spark.sessionState.newHadoopConf()).exists(path)
    }
    if (!exists(s"$indexDir/centroids"))
      Similarity.writeIvfCentroids(
        vecs.join(keeperIds, Seq(idCol)), indexDir, centroidStride, idCol)
    val survivorIds =
      if (!exists(s"$indexDir/lists")) keeperIds
      else {
        val dupIds = Similarity.ivfTopKIndexed(
            spark, indexDir, vecs.join(keeperIds, Seq(idCol)),
            k = 1, nProbe, idCol, excludeBatchTag = Some(batchTag))
          .filter(col("cosine") >= tau)
          .select(col("q_id").as(idCol)).distinct()
        keeperIds.join(dupIds, Seq(idCol), "left_anti")
      }
    // compute the survivor plan ONCE into the output partition; the
    // index append and the count re-read the written files (same
    // job-count economics as DedupStream.ingestTick)
    batch.join(survivorIds, Seq(idCol))
      .write.mode("overwrite").parquet(s"$outDir/batch=$batchTag")
    val written = spark.read.parquet(s"$outDir/batch=$batchTag")
    Similarity.appendIvfIndex(spark,
      written.select(col(idCol), col(embCol).as("embedding")),
      indexDir, batchTag, idCol)
    written.count()
  }

  /** Streaming form: every micro-batch runs [[ingestTick]] against the
    * shared persisted index. No watermark, no stream state — the on-disk
    * index IS the state; checkpointed source offsets + overwrite-per-tag
    * slices make restarts and replays safe (same contract as
    * `DedupStream.incrementalIngest`).
    */
  def incrementalIngest(
      stream: DataFrame,
      indexDir: String,
      outDir: String,
      checkpointDir: String,
      tau: Double = 0.8,
      nProbe: Int = 2,
      centroidStride: Long = 100L,
      idCol: String = "vec_id",
      embCol: String = "embedding",
      maxSlices: Option[Int] = None,
      rebuildHotShare: Option[Double] = None,
      rebuildMinRows: Long = 1000L,
      rebuildStride: Option[Long] = None,
      autoRebuildStride: Boolean = false): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        val tag = s"b$batchId"
        // a crashed attempt's leftovers are dropped at EVERY tick start
        // (cheap delete), independent of whether the rebuild or the
        // compaction below runs this tick — same contract as the text loop
        graft.core.FsPaths.dropCrashedTag(df.sparkSession, indexDir,
          Seq("lists", "codes"), tag)
        // a rebuild resets slices too, so it subsumes this tick's
        // compaction check. rebuildStride decouples the REBUILD's
        // centroid allocation from the ingest path's: stride == expected
        // rows/list, and the measured drift ladders (PLANS.md round-16)
        // show a drift response often wants SMALLER post-rebuild lists
        // than the original build — at 100k, rebuilding at stride 100
        // instead of the ingest's 500 cut the probe bill 12x for 5x
        // rebuild cost at unchanged recall. autoRebuildStride derives
        // that number from the measured bill instead of a hand pick
        // ([[deriveRebuildStride]]); an explicit rebuildStride wins.
        val rebuilt = rebuildHotShare.exists(th =>
          rebuildIfDrifted(df.sparkSession, indexDir, th,
            rebuildStride.getOrElse(centroidStride),
            currentTag = tag, minRows = rebuildMinRows,
            autoStride = autoRebuildStride && rebuildStride.isEmpty))
        if (!rebuilt) maxSlices.foreach(m =>
          compactIfNeeded(df.sparkSession, indexDir, m, currentTag = tag))
        ingestTick(df.sparkSession, df, indexDir, outDir, tag,
          tau, nProbe, centroidStride, idCol, embCol): Unit
      }
      .start()

  /** The in-loop drift response: when the appended (non-`base`) slices'
    * hottest list owns at least `hotShareThreshold` of their rows — the
    * [[Similarity.ivfListStats]] signature of batches drifting away
    * from the frozen quantizer's training distribution, which inflates
    * every probe's scan bill toward the hot list's size (measured ~3×
    * at hotShare 0.64; ladder in PLANS.md) — retrain the quantizer on
    * the index's current contents and swap the re-sliced index in
    * ([[Similarity.rebuildIvfIndex]] through `FsPaths.rebuildAndSwap`,
    * same rename-based crash contract as [[compactIfNeeded]], and the
    * current tag's crashed-attempt slices are dropped so a replayed
    * batch never probes its own vectors). `minRows` stops small-sample
    * noise from triggering rebuilds: a handful of appended vectors can
    * land in one list by chance, not by drift.
    *
    * @return true when a rebuild ran.
    */
  def rebuildIfDrifted(
      spark: SparkSession, indexDir: String, hotShareThreshold: Double,
      centroidStride: Long, currentTag: String,
      minRows: Long = 1000L,
      autoStride: Boolean = false): Boolean = {
    require(hotShareThreshold > 0.0 && hotShareThreshold <= 1.0,
      "hotShareThreshold must be in (0, 1]")
    graft.core.FsPaths.recoverSwap(spark, indexDir)
    // FS-only short-circuit: with no post-training slices (all mass in
    // `base` — right after a rebuild, or a fresh index) there is nothing
    // to measure drift ON; skip the stats job entirely. Judged by slice
    // NAME, not count: compaction folds appended ticks into a single
    // `batch=appended` slice that is still drift evidence (only a
    // rebuild retrains the quantizer and resets mass to base), and the
    // current tag's slices are a crashed replay attempt, not evidence.
    // The stats scan itself is cheap when it runs — list_id/batch are
    // partition columns and no data column is materialized — but a
    // directory listing is cheaper still
    val appendedSlices = graft.core.FsPaths
      .childNames(spark, s"$indexDir/lists", "batch=")
      .filterNot(n => n == "batch=base" || n == s"batch=$currentTag")
    if (appendedSlices.isEmpty) return false
    val appended = Similarity.ivfListStats(spark, indexDir)
      .filter(col("batch") =!= "base" && col("batch") =!= currentTag)
    val byList = appended.groupBy("list_id").agg(sum("n").as("n"))
      .agg(coalesce(sum("n"), lit(0L)).as("total"),
        coalesce(max("n"), lit(0L)).as("hot"))
      .head()
    val total = byList.getAs[Long]("total")
    val hot = byList.getAs[Long]("hot")
    if (total >= minRows && hot.toDouble / total >= hotShareThreshold) {
      val stride =
        if (autoStride) {
          val d = deriveRebuildStrideInfo(spark, indexDir, centroidStride, currentTag)
          // the saturation marker (round-17 verdict task 3): when the
          // derived stride hits the designStride/10 clamp floor the
          // post-rebuild bill can still land over target — without this
          // line the operator looks self-tuned while missing its target.
          // One JSON line per rebuild to the loop's telemetry stream.
          System.err.println(d.telemetryJson)
          d.stride
        } else centroidStride
      graft.core.FsPaths.rebuildAndSwap(spark, indexDir) { dst =>
        Similarity.rebuildIvfIndex(spark, indexDir, dst, stride,
          excludeTag = Some(currentTag))
      }
      true
    } else false
  }

  /** Result of [[deriveRebuildStrideInfo]]: the derived stride plus the
    * numbers that produced it. `saturated = true` means the unclamped
    * derivation wanted a stride BELOW the `designStride/10` clamp floor
    * — the measured bill is more than 10× the design target, so even
    * the floored rebuild will land over target. A deployment loop reads
    * this to tell "tuned" from "clamped": a saturated rebuild warrants
    * a second rebuild after the first settles, or a raised nLists. */
  final case class StrideDerivation(
      measuredBill: Double,
      targetBill: Double,
      stride: Long,
      saturated: Boolean) {
    /** The one-line JSON marker [[rebuildIfDrifted]] emits per rebuild. */
    def telemetryJson: String = {
      def f(x: Double) =
        String.format(java.util.Locale.ROOT, "%.1f", Double.box(x))
      s"""{"event":"rebuild_stride_derived","measured_bill":${f(measuredBill)},""" +
        s""""target_bill":${f(targetBill)},"derived_stride":$stride,""" +
        s""""saturated":$saturated}"""
    }
  }

  /** Derives the rebuild's centroid stride from the MEASURED probe bill
    * instead of a hand pick (round-16 verdict task 3 — the r16 ladder
    * proved the stride lever head-to-head at 100 k: rebuilding at 100
    * instead of the ingest's 500 cut the post-rebuild probe bill 23.5×
    * for 5× rebuild cost, recall untouched, but callers had to KNOW the
    * right number).
    *
    * The bill math ([[Similarity.ivfProbeCells]] is the direct form):
    * a drifted query's primary probed list is, in expectation, the list
    * the appended mass landed in, so the measured per-list bill is the
    * appended-mass-weighted mean TOTAL list size
    * `Σ_L share_appended(L) · rows(L)`. The design target is
    * `designStride` rows per probed list (stride == expected rows/list
    * by construction). The response scales the stride by
    * `target / measured`, clamped to `[designStride/10, designStride]` —
    * never coarser than the design (over-splitting is bounded: 10× the
    * centroid-ranking cost at most), and a bill already at or under
    * target rebuilds at the design stride unchanged. The current tag's
    * crashed-attempt slices are excluded like everywhere else in the
    * replay contract.
    */
  def deriveRebuildStride(
      spark: SparkSession, indexDir: String, designStride: Long,
      currentTag: String): Long =
    deriveRebuildStrideInfo(spark, indexDir, designStride, currentTag).stride

  /** [[deriveRebuildStride]] with the derivation's inputs and the clamp
    * saturation marker attached ([[StrideDerivation]]). */
  def deriveRebuildStrideInfo(
      spark: SparkSession, indexDir: String, designStride: Long,
      currentTag: String): StrideDerivation = {
    val stats = Similarity.ivfListStats(spark, indexDir)
      .filter(col("batch") =!= currentTag)
    val perList = stats.groupBy("list_id").agg(
      sum("n").as("total_n"),
      sum(when(col("batch") =!= "base", col("n")).otherwise(lit(0L))).as("app_n"))
    val bill = perList
      .agg((sum(col("app_n") * col("total_n")) /
        sum(col("app_n"))).as("bill"))
      .head().getAs[Any]("bill") match {
      case null => designStride.toDouble // no appended mass: design holds
      case d: java.lang.Double => d.doubleValue
      case other => other.toString.toDouble
    }
    val scaled = designStride * (designStride.toDouble / math.max(bill, 1.0))
    val floor = designStride / 10
    val raw = math.round(scaled)
    val stride = math.max(1L, math.min(designStride, math.max(floor, raw)))
    // saturated = the unclamped derivation wanted LESS than the floor the
    // clamp enforces (bill > 10x target); compare the UNROUNDED value —
    // rounding `scaled` up to the floor (bills in the (10x, ~11.1x] band)
    // must still report saturation. A floor of 0 (designStride < 10)
    // never saturates — the max(1, _) there is arithmetic, not a clamp
    StrideDerivation(bill, designStride.toDouble, stride,
      saturated = floor > 0 && scaled < floor)
  }

  /** IVF twin of `DedupStream.compactIfNeeded`: when more than
    * `maxSlices` LOOSE tick slices have accumulated under `lists/`,
    * compact them (centroids/codebooks copy frozen; lists/codes
    * re-cluster to one file per list, post-training mass folded into a
    * single `appended` slice so [[rebuildIfDrifted]] keeps its
    * evidence) into a scratch directory and swap it in. "Loose"
    * excludes the permanent floor — `batch=base`, `batch=appended`,
    * and `batch=<currentTag>` — the slices a compaction can never
    * remove; counting the floor (the old total-count form) made any
    * `maxSlices <= 2` fire EVERY tick at steady state and rewrite the
    * whole index even when there was nothing to fold, and gave this
    * parameter a different effective meaning than the text twin's.
    * `maxSlices = 0` means "compact whenever any loose slice exists".
    * Same crash contract: `recoverSwap` heals interrupted swaps first,
    * and `batch=<currentTag>` leftovers of a crashed attempt of THIS
    * tick are dropped rather than folded, so the replayed batch never
    * probes its own vectors.
    *
    * @return true when a compaction ran.
    */
  def compactIfNeeded(
      spark: SparkSession, indexDir: String, maxSlices: Int,
      currentTag: String): Boolean = {
    require(maxSlices >= 0, "maxSlices must be >= 0")
    graft.core.FsPaths.recoverSwap(spark, indexDir)
    // crashed-attempt leftovers of THIS tag: dropped unconditionally
    // (cheap delete) instead of lingering excluded until a compaction
    // fires — same contract as the text twin
    graft.core.FsPaths.dropCrashedTag(
      spark, indexDir, Seq("lists", "codes"), currentTag)
    val floor = Set("batch=base", "batch=appended", s"batch=$currentTag")
    val n = graft.core.FsPaths.childNames(
      spark, s"$indexDir/lists", "batch=").count(!floor.contains(_))
    if (n > maxSlices) {
      graft.core.FsPaths.rebuildAndSwap(spark, indexDir) { dst =>
        Similarity.compactIvfIndex(
          spark, indexDir, dst, excludeTag = Some(currentTag))
      }
      true
    } else false
  }
}
