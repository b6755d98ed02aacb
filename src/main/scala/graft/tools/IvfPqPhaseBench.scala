package graft.tools

import org.apache.spark.sql.functions.col

import graft.core.Tables
import graft.ops.Similarity

/** Phase-split micro-bench for the IVFPQ composition: the in-catalog
  * `ext_ann_ivf_pq` entry pays the ONE-TIME index build (k-means
  * codebooks + two partitioned writes) on every trial, because the
  * registered query's contract is "from raw embeddings to top-k". A 100
  * TB ANN service amortizes that build across millions of probes, so the
  * number that matters for serving cost is the probe phase alone. This
  * main times the two phases separately (median of `trials` for the
  * probe; the build once — it is the amortized part) and prints one JSON
  * line, so the catalog bench number is self-explaining in PLANS.md.
  *
  * Usage: runMain graft.tools.IvfPqPhaseBench <sfDir> [trials]
  */
object IvfPqPhaseBench {

  private def time(body: => Unit): Double = {
    val t0 = System.nanoTime()
    body
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val trials = if (args.length > 1) args(1).toInt else 5
    val spark = graft.core.GraftSession.local(appName = "graft-ivfpq-phase-bench")
    val emb = Tables.embeddings(spark, sfDir)
    val idx = graft.core.TmpDirs.scoped("ivfpq_phase_bench")

    val buildSec = time {
      Similarity.writeIvfPqIndex(emb, idx, centroidStride = 50L,
        m = 8, ks = 16, maxIter = 3)
    }
    val queries = emb.filter(col("vec_id") < 5)
    val probeSecs = (1 to trials).map { _ =>
      time {
        Similarity.ivfPqTopKIndexed(spark, idx, queries,
          k = 10, nProbe = 3, rerank = 8)
          .write.format("noop").mode("overwrite").save()
      }
    }
    val probeMedian = BenchUtil.median(probeSecs)
    println(
      s"""{"metric":"ivfpq_phase_split","build_sec":${BenchUtil.fmt3(buildSec)},""" +
        s""""probe_median_sec":${BenchUtil.fmt3(probeMedian)},""" +
        s""""probe_trials":[${probeSecs.map(BenchUtil.fmt3).mkString(",")}],""" +
        s""""sf":"$sfDir"}""")
    spark.stop()
  }
}
