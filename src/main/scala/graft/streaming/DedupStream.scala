package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.TextDedup

/** Streaming exact deduplication — the ingest-time form of the batch
  * `TextDedup.exactGroups` stage: keep the FIRST arrival of each exact
  * text (same `md5(text)` key as the batch operator) and drop repeats,
  * as documents flow in.
  *
  * State design: `dropDuplicatesWithinWatermark` holds one state row per
  * key seen within the watermark horizon and EVICTS it once the
  * watermark passes — state is bounded by arrival rate × delay, never by
  * corpus size (a plain streaming `dropDuplicates` would grow keys
  * forever — the thing that kills a long-running ingest). The price is
  * the documented re-admission: an exact duplicate arriving with an
  * event time beyond the horizon is a NEW document to this stage; the
  * nightly batch dedup (exactGroups / minHash) is the backstop, exactly
  * as in the reference curation pipelines.
  */
object DedupStream {

  /** Keep the first arrival per exact text within the watermark horizon.
    * Output = the input columns (the hash key is internal).
    */
  def dedupExact(stream: DataFrame, tsCol: String, textCol: String,
      watermarkDelay: String): DataFrame =
    stream
      .withColumn("__text_hash", md5(col(textCol)))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("__text_hash")
      .drop("__text_hash")

  /** Batch twin: first arrival per exact text by (ts, tiebreak) order.
    * The streamed output equals this when every duplicate pair lies
    * inside the horizon AND arrival order matches event-time order (the
    * file-replay contract the specs use). For out-of-order arrival the
    * two legitimately differ in WHICH copy survives — the stream keeps
    * the first-PROCESSED duplicate (arrival order is its only notion of
    * "first"), the batch twin the event-time-least — while the surviving
    * key set is identical either way; exact-duplicate texts make the
    * difference invisible to downstream content anyway. `tieCol`
    * resolves equal timestamps (file order is not a batch concept).
    */
  def dedupExactBatch(df: DataFrame, tsCol: String, textCol: String,
      tieCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(md5(col(textCol)))
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** One tick of the continuously-growing-deduped-corpus loop, as a
    * plain batch function (the `foreachBatch` body of
    * [[incrementalIngest]], and directly callable for scheduled-batch
    * ingest). Three dedup layers, then the corpus grows:
    *
    *   1. intra-batch EXACT: min-id keeper per content hash — a
    *      batch-internal duplicate pair both survives the corpus checks
    *      (neither is in the index yet), so without this layer both
    *      copies would enter the corpus;
    *   2. vs-corpus exact + near (Jaccard ≥ τ):
    *      [[TextDedup.incrementalSurvivorsIndexed]] over the persisted
    *      index — per-tick cost scales with the BATCH, never corpus²;
    *   3. intra-batch NEAR: [[TextDedup.jaccardPairs]] +
    *      [[TextDedup.clusters]] over the (batch-bounded) survivors of
    *      layer 2 — min-id keeper per near-dup cluster.
    *
    * Survivors are then appended to the index
    * ([[TextDedup.appendIncrementalIndex]], one `batch=<tag>` slice per
    * layer table) and written to `outDir/batch=<tag>`. Every write is
    * OVERWRITE into the tag's own partition directory, so replaying a
    * tag (the foreachBatch retry contract) rewrites its slices instead
    * of duplicating them — the whole tick is idempotent per tag.
    *
    * Bootstrap: the index must exist before the first tick — call
    * [[TextDedup.writeIncrementalIndex]] with the seed corpus (or an
    * EMPTY frame carrying the right schema to start from nothing).
    *
    * @return number of surviving documents appended this tick.
    */
  def ingestTick(
      spark: SparkSession,
      batch: DataFrame,
      indexDir: String,
      outDir: String,
      batchTag: String,
      k: Int = 2,
      tau: Double = 0.8,
      maxShingleDf: Long = 1000L,
      idCol: String = "doc_id",
      textCol: String = "text",
      bloomBits: Option[Int] = None,
      maxTokens: Option[Int] = None): Long = {
    import org.apache.spark.sql.expressions.Window
    // maxTokens: the ingest-side length cap (`Curation.lengthCap`,
    // truncate mode) applied AT the operator boundary so the memory
    // guard every per-doc shingle bound assumes cannot be forgotten
    // upstream; audit columns are dropped to keep the output schema =
    // the batch schema (run lengthCap yourself upstream to keep them)
    val guarded = maxTokens match {
      case Some(n) => graft.ops.Curation.lengthCap(batch, n, textCol = textCol)
        .drop("n_tokens_orig", "capped")
      case None => batch
    }
    val wExact = Window.partitionBy(col("__h")).orderBy(col(idCol).asc)
    val intraExact = guarded
      .withColumn("__h", md5(col(textCol)))
      .withColumn("__rn", row_number().over(wExact))
      .filter(col("__rn") === 1)
      .drop("__h", "__rn")
    // r19: the batch is shingled ONCE and the table reused by all three
    // consumers that used to re-shingle independently — the vs-corpus
    // near layer, the intra-batch jaccardPairs, and the index append
    // (shingle rows are per-document, so an id semi-join on the cached
    // table IS the re-shingle of any batch subset). Measured
    // (QueryJobProfile / PLANS.md r14): each tick is fixed-tax-dominated
    // small jobs, and the shingle pipeline (posexplode + window +
    // distinct + persist fill) was paid 3× per tick.
    val (corpusHashes, shOld, dfOld) =
      TextDedup.indexSides(spark, indexDir, idCol, Some(batchTag))
    val exactSurvivors = TextDedup.exactSurvivorsVsHashes(
      intraExact, corpusHashes, textCol, bloomBits, bloomHashes = 5).persist()
    val shNew = TextDedup.shingles(exactSurvivors, k, idCol, textCol).persist()
    try {
      shNew.count() // fill both caches before the multi-consumer fan-out
      val vsCorpus = TextDedup.nearDupSurvivors(exactSurvivors, shNew,
        shOld, dfOld, tau, maxShingleDf, idCol, checkpointDir = None)
      // intra-batch near layer over the survivors' shingles — a cheap
      // cached-table filter, not a re-shingle; the multi-consumer reads
      // inside jaccardPairsOn re-evaluate only that filter
      val shVs = shNew.join(
        vsCorpus.select(col(idCol)), Seq(idCol), "left_semi")
      val intraPairs = TextDedup.eager(
        TextDedup.jaccardPairsOn(shVs, tau, maxShingleDf, idCol), None)
      val losers = TextDedup.clusters(intraPairs)
        .filter(col("cluster_id") =!= col("id"))
        .select(col("id").as(idCol))
      // keepers are consumed four times (index hashes, shingles, df,
      // count): compute the plan ONCE into the output partition, then
      // feed the index appends and the count from the written parquet —
      // the re-reads are batch-bounded files, the count footer-only
      val keepers = vsCorpus.join(losers, Seq(idCol), "left_anti")
      keepers.write.mode("overwrite").parquet(s"$outDir/batch=$batchTag")
      val written = spark.read.parquet(s"$outDir/batch=$batchTag")
      val shKeep = shNew.join(
        written.select(col(idCol)), Seq(idCol), "left_semi")
      TextDedup.appendIndexSlicePrecomputed(
        written, shKeep, indexDir, batchTag, idCol, textCol)
      written.count()
    } finally {
      shNew.unpersist()
      exactSurvivors.unpersist()
      ()
    }
  }

  /** The streaming form of the growing corpus: every micro-batch runs
    * [[ingestTick]] against the shared persisted index, so each batch
    * is deduplicated against the seed corpus PLUS every earlier batch's
    * survivors, and the deduped corpus accumulates under `outDir` as
    * `batch=b<id>` partitions. Tick idempotency (overwrite-per-tag) plus
    * the checkpointed source offsets make restarts safe: a replayed
    * micro-batch has the same batchId, hence the same tag, hence
    * rewrites its own slices.
    *
    * Unlike [[dedupExact]] this form needs NO watermark and holds NO
    * stream state — the index IS the state, on disk and unbounded-safe:
    * per-tick cost is batch work + index scans, never corpus².
    *
    * Composition notes: `maxTokens` bounds pathological documents at
    * the operator boundary (the ingest-side guard
    * `TextDedup.verifyJaccard`'s memory bound relies on — default off
    * for parity with earlier rounds; truncation audit columns need an
    * explicit upstream `Curation.lengthCap`); `maxSlices` bounds
    * slice-count creep by compacting the index in place between ticks
    * ([[compactIfNeeded]]) instead of the manual offline
    * compact-and-swap the index layout otherwise defers to.
    */
  def incrementalIngest(
      stream: DataFrame,
      indexDir: String,
      outDir: String,
      checkpointDir: String,
      k: Int = 2,
      tau: Double = 0.8,
      maxShingleDf: Long = 1000L,
      idCol: String = "doc_id",
      textCol: String = "text",
      bloomBits: Option[Int] = None,
      maxTokens: Option[Int] = None,
      maxSlices: Option[Int] = None): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        val tag = s"b$batchId"
        // a crashed attempt's leftovers are dropped at EVERY tick start
        // (cheap existence check + delete), not only when a compaction
        // happens to run — a loop without maxSlices gets the cleanup too
        graft.core.FsPaths.dropCrashedTag(df.sparkSession, indexDir,
          Seq("hashes", "shingles", "df"), tag)
        maxSlices.foreach(m =>
          compactIfNeeded(df.sparkSession, indexDir, m, currentTag = tag))
        ingestTick(df.sparkSession, df, indexDir, outDir, tag,
          k, tau, maxShingleDf, idCol, textCol, bloomBits, maxTokens): Unit
      }
      .start()

  /** Reset the index's slice-count creep IN the loop: when more than
    * `maxSlices` LOOSE tick slices have accumulated — slices beyond the
    * permanent floor of `batch=base` and `batch=<currentTag>`, which a
    * compaction can never remove (base is the compaction target itself;
    * currentTag is a crashed replay's leftover, dropped not folded) —
    * compact them into a single base slice in a scratch directory and
    * swap it in ([[graft.core.FsPaths.rebuildAndSwap]] — rename-based,
    * so a tick never reads a half-compacted index; every crash window
    * heals via `recoverSwap`, which this method runs first). Counting
    * only removable slices keeps the trigger quiescent at steady state:
    * with the old total-count form, a `maxSlices` at-or-below the floor
    * size fired EVERY tick and rewrote the whole index for nothing.
    * `maxSlices = 0` means "compact whenever any loose slice exists".
    * Runs at the START of a tick, before the tick's own append: any
    * `batch=<currentTag>` slices present then are a crashed attempt's
    * uncommitted leftovers and are DROPPED (the replay rewrites them),
    * never folded into base — folding them would make the replayed
    * batch dedup against itself and silently lose its documents.
    *
    * @return true when a compaction ran.
    */
  def compactIfNeeded(
      spark: SparkSession, indexDir: String, maxSlices: Int,
      currentTag: String): Boolean = {
    require(maxSlices >= 0, "maxSlices must be >= 0")
    graft.core.FsPaths.recoverSwap(spark, indexDir)
    // crashed-attempt leftovers of THIS tag are dropped unconditionally
    // (cheap delete), not merely excluded until a compaction fires —
    // they are uncommitted by the replay contract and everything
    // downstream already ignores them
    graft.core.FsPaths.dropCrashedTag(
      spark, indexDir, Seq("hashes", "shingles", "df"), currentTag)
    val floor = Set("batch=base", s"batch=$currentTag")
    val n = graft.core.FsPaths.childNames(
      spark, s"$indexDir/hashes", "batch=").count(!floor.contains(_))
    if (n > maxSlices) {
      graft.core.FsPaths.rebuildAndSwap(spark, indexDir) { dst =>
        TextDedup.compactIncrementalIndex(
          spark, indexDir, dst, excludeTag = Some(currentTag))
      }
      true
    } else false
  }
}
