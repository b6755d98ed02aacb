package graft.tools

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.TextDedup

/** r19 plan evidence: `explain("formatted")` of the PRE-EAGER internal
  * frames the optimization round changed — the touched dedup queries
  * return localCheckpoint'ed results, so their catalog-level plan is a
  * bare `Scan ExistingRDD` and the meaningful plan lives one level in.
  * The r18 worktree runs a structurally identical probe against the old
  * internals for the `_before` files.
  *
  * Sections (stdout, delimited by `===== <name> =====`):
  *   - jaccard_pairs: the verified-pair plan of `jaccardPairsOn` over
  *     the sf0.1 documents (candidate join + verification);
  *   - shingles_docs: `shingles(documents)` (the spread decision on a
  *     mid-size input);
  *   - shingles_batch: `shingles(~110-doc ingest batch)` (the spread
  *     decision on a small batch);
  *   - span_windows: `spanWindows(documents, 20)`.
  */
object R19PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = BenchUtil.scaleSession()
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set(
      "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
    spark.conf.set(
      "spark.sql.adaptive.coalescePartitions.minPartitionSize", "64KB")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    val batch = docs.filter(col("doc_id") >= 300 && col("doc_id") < 400)
      .unionByName(docs.filter(col("doc_id") < 6)
        .select((col("doc_id") + 20000).as("doc_id"), col("text")))

    def section(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      println(s"\n===== $name =====")
      df.explain("formatted")
    }

    val sh = TextDedup.shingles(docs, 2).persist()
    sh.count(): Unit
    section("jaccard_pairs")(
      TextDedup.jaccardPairsOn(sh, 0.8, Long.MaxValue, "doc_id"))
    sh.unpersist(): Unit
    section("shingles_docs")(TextDedup.shingles(docs, 2))
    section("shingles_batch")(TextDedup.shingles(batch, 2))
    section("span_windows")(TextDedup.spanWindows(docs, 20, "doc_id", "text"))
    spark.stop()
  }
}
