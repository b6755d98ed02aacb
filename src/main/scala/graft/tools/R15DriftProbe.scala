package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.Similarity
import graft.streaming.EmbedIngest

/** Round-15 measurement probe for the frozen-centroid drift response:
  * grow an IVF index with batches whose distribution has DRIFTED from
  * the centroid training distribution (a strong shared component on one
  * axis layered over real corpus noise), and measure the recall ladder
  *
  *   recall(frozen centroids, drifted queries)
  *     → rebuildIvfIndex →
  *   recall(retrained centroids, same queries)
  *
  * plus the [[Similarity.ivfListStats]] hot-list share the monitoring
  * hook would alarm on. Run across drift strengths L to pick the spec's
  * pinned floors (memory recipe: measure FIRST, pin with margin).
  */
object R15DriftProbe {
  import BenchUtil.fmt3

  private def recallAt(
      spark: org.apache.spark.sql.SparkSession, idx: String,
      all: DataFrame, queries: DataFrame, k: Int, nProbe: Int): Double = {
    val exact = Similarity.topK(all, queries, k)
      .select("q_id", "n_id")
    val got = Similarity.ivfTopKIndexed(spark, idx, queries, k, nProbe)
      .select("q_id", "n_id")
    val hit = got.join(exact, Seq("q_id", "n_id"), "left_semi").count()
    hit.toDouble / exact.count().toDouble
  }

  def main(args: Array[String]): Unit = {
    val spark = BenchUtil.scaleSession()
    import spark.implicits._
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding").cache()
    val corpus = emb.filter($"vec_id" < 200)

    for (l <- Seq(1.0f, 2.0f, 4.0f)) {
      val idx = graft.core.TmpDirs.scoped(s"driftidx_$l")
      val out = graft.core.TmpDirs.scoped(s"driftout_$l")
      Similarity.writeIvfIndex(corpus, idx, centroidStride = 20L)
      val nLists = spark.read.parquet(s"$idx/centroids").count()
      // drifted batches: shared component L on axis 0 over real corpus
      // coordinates — new mass the frozen quantizer never trained on
      def drifted(lo: Long, hi: Long, offset: Long): DataFrame =
        emb.filter($"vec_id" >= lo && $"vec_id" < hi)
          .select(($"vec_id" + offset).as("vec_id"),
            transform($"embedding", (x, i) =>
              when(i === 0, lit(l)).otherwise(x)).as("embedding"))
      var n = 0L
      for (t <- 0 until 3) {
        n += EmbedIngest.ingestTick(spark,
          drifted(200L + t * 100, 300L + t * 100, 10000L),
          idx, out, s"b$t", tau = 0.99, nProbe = 2)
      }
      val all = corpus.unionByName(
        spark.read.parquet(out).select("vec_id", "embedding"))
      // fresh drifted queries: drift layered over corpus rows that were
      // ingested only in their ORIGINAL form (so the queries themselves
      // are not in the index)
      val queries = drifted(0L, 20L, 20000L)
      // healthy reference: queries FROM the training distribution on the
      // same frozen index — what recall looks like without drift
      val healthyQ = emb.filter($"vec_id" < 20)
        .select(($"vec_id" + 30000L).as("vec_id"), $"embedding")
      val healthy = recallAt(spark, idx, all, healthyQ, k = 10, nProbe = 1)
      val before = recallAt(spark, idx, all, queries, k = 10, nProbe = 1)
      // hot-list share across the drifted slices (the monitor signal)
      val stats = Similarity.ivfListStats(spark, idx)
        .filter($"batch" =!= "base")
      val driftTotal = stats.agg(sum("n")).as[Long].head()
      val hotShare = stats.groupBy("list_id").agg(sum("n").as("n"))
        .agg(max("n")).as[Long].head().toDouble / driftTotal
      // rebuild on current contents at a stride giving a COMPARABLE list
      // count (500 vectors / 55 ≈ the frozen index's ~9 lists) so the
      // before/after recall compares quantizer QUALITY, not list count
      val idx2 = graft.core.TmpDirs.scoped(s"driftidx2_$l")
      Similarity.rebuildIvfIndex(spark, idx, idx2, centroidStride = 55L)
      val nLists2 = spark.read.parquet(s"$idx2/centroids").count()
      // probe COST: average fraction of the index a query's probed
      // lists cover — the number the hot list inflates
      def scanFrac(dir: String, qs: DataFrame, nProbe: Int): Double = {
        val listSizes = spark.read.parquet(s"$dir/lists")
          .groupBy("list_id").agg(count(lit(1)).as("sz"))
        val total = spark.read.parquet(s"$dir/lists").count().toDouble
        val probed = Similarity.ivfProbeCells(spark, dir, qs, nProbe)
        probed.join(listSizes, Seq("list_id"))
          .groupBy("q_id").agg(sum("sz").as("scanned"))
          .agg(avg(col("scanned"))).as[Double].head() / total
      }
      val costBefore = scanFrac(idx, queries, 1)
      val costAfter1 = scanFrac(idx2, queries, 1)
      val costAfter3 = scanFrac(idx2, queries, 3)
      val after1 = recallAt(spark, idx2, all, queries, k = 10, nProbe = 1)
      val after3 = recallAt(spark, idx2, all, queries, k = 10, nProbe = 3)
      println(s"[driftprobe] L=$l survivors=$n lists=$nLists->$nLists2 " +
        s"hotShare=${fmt3(hotShare)} recall_healthy=${fmt3(healthy)} " +
        s"recall_before=${fmt3(before)} cost_before=${fmt3(costBefore)} " +
        s"after: r1=${fmt3(after1)} c1=${fmt3(costAfter1)} " +
        s"r3=${fmt3(after3)} c3=${fmt3(costAfter3)}")
    }
    spark.stop()
  }
}
