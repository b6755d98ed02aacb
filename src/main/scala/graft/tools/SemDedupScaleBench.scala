package graft.tools

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.Similarity

/** Scale curve for the SemDeDup composition under the production scaling
  * rule "grow k with the corpus so cells stay constant-sized": corpus
  * n×, cells k ∝ n, probe fixed. Candidate volume is Σ cell² · probe² ≈
  * (n/k)² · k · probe² = n · (cell size) · probe² — LINEAR in n when the
  * rule holds — so the pin is that wall time and the measured Σ cell²
  * candidate proxy both grow ~n, not n².
  *
  * Replicas are direction-perturbed (a deterministic per-copy nudge on
  * one rotating dimension) so grown corpora spread over the sphere the
  * way real embeddings do instead of stacking identical vectors into
  * degenerate dup groups (which would measure pair-listing, not cell
  * geometry).
  *
  * Usage: runMain graft.tools.SemDedupScaleBench <sfDir> [trials] [scales...]
  */
object SemDedupScaleBench {
  import BenchUtil.{force, fmt3}

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val trials = args.lift(1).map(_.toInt).getOrElse(3)
    val scales = if (args.length > 2) args.drop(2).map(_.toInt).toSeq
      else Seq(1, 4, 16)
    val spark = BenchUtil.scaleSession()

    val emb = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val baseN = emb.count()
    val out = scala.collection.mutable.LinkedHashMap[String, Double]()
    val stats = scala.collection.mutable.LinkedHashMap[String, Long]()
    scales.foreach { r =>
      val span = baseN
      // copy c of vector v: nudge dimension (c % 64) by 0.15·(1 + c % 3)
      // — deterministic, keeps copies near the original direction but
      // distinct, so cells fill with distinct near-ish vectors
      val grown =
        if (r <= 1) emb
        else emb
          .withColumn("__rep", explode(sequence(lit(0L), lit(r - 1L))))
          .withColumn("embedding",
            transform(col("embedding"), (x, i) =>
              when(i === pmod(col("__rep"), lit(64)).cast("int"),
                x + lit(0.15f) * (lit(1.0f) + pmod(col("__rep"), lit(3)).cast("float")))
                .otherwise(x)))
          .withColumn("vec_id", col("vec_id") + col("__rep") * lit(span))
          .drop("__rep")
      val dir = graft.core.TmpDirs.scoped(s"semdedup_scale_$r")
      grown.write.mode("overwrite").parquet(dir)
      val corpus = spark.read.parquet(dir)
      val n = corpus.count()
      val k = math.max(10, (10L * r).toInt) // cells scale with the corpus
      stats(s"n_${r}x") = n
      stats(s"k_${r}x") = k
      out(s"semdedup_${r}x") = BenchUtil.medianTrials(spark, trials)(force(
        Similarity.semDedup(corpus, k = k, tau = 0.45, probe = 2)))
      // candidate-volume proxy: Σ cell² over the top-1 assignment — the
      // quantity the "k grows with n" rule is supposed to hold linear·cell
      val (assigned, _) = Similarity.kmeans(corpus, k, maxIter = 3)
      stats(s"sum_cell_sq_${r}x") = assigned.groupBy("cluster").count()
        .agg(sum(col("count") * col("count"))).head().getLong(0)
      spark.sharedState.cacheManager.clearCache()
      System.err.println(s"[semdedup-scale] ${r}x n=$n k=$k " +
        s"t=${fmt3(out(s"semdedup_${r}x"))} sumCellSq=${stats(s"sum_cell_sq_${r}x")}")
    }

    val qs = (out.map { case (k, v) => "\"" + k + "\":" + fmt3(v) } ++
      stats.map { case (k, v) => "\"" + k + s"""\":$v""" })
      .mkString("{", ",", "}")
    spark.stop()
    println(s"""{"metric":"semdedup_scale","trials":$trials,"points":$qs}""")
  }
}
