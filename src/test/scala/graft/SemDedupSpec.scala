package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.ops.Similarity

/** K-means + SemDeDup trust chain: the rows-only `ext_semdedup` query is
  * pinned against the oracle-checked exact embedding dedup
  * (`ext_dedup_embed`, same tau), and the k-means loop's determinism and
  * quality are pinned against the corpus' planted ground-truth labels.
  */
class SemDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = Tables.embeddings(spark, dir).cache()

  test("kmeans centroids are bit-identical across repartitionings") {
    // the decimal(38,18)-sum mean is EXACT, hence shuffle-order
    // independent — the property that makes the whole family
    // bit-deterministic at any cluster layout
    def centroids(parts: Int): Map[Long, Seq[Double]] =
      Similarity.kmeans(emb.repartition(parts), k = 10, maxIter = 3)._2
        .as[(Long, Seq[Double])].collect().toMap
    val a = centroids(3)
    val b = centroids(17)
    assert(a.keySet == b.keySet)
    a.foreach { case (id, v) => assert(v == b(id), s"centroid $id drifted") }
  }

  test("kmeans recovers geometric cluster structure when it exists") {
    // the corpus' own `label` column is NOT geometric (intra- and
    // inter-label mean cosine are both ~0 — random directions with
    // planted near-dup PAIRS only), so build a corpus that HAS structure:
    // 10 well-separated centers (the first 10 corpus vectors — random
    // 64-dim directions are near-orthogonal) plus a deterministic
    // per-point perturbation; cosine(point, its center) ≈ 0.99.
    val centers = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("cid"), col("embedding").as("c"))
    val pts = emb.withColumn("cid", pmod(col("vec_id"), lit(10)))
      .join(broadcast(centers), "cid")
      .select(col("vec_id"), col("cid"),
        zip_with(col("c"), col("embedding"),
          (x, y) => x.cast("double") + y.cast("double") * lit(0.15)).as("embedding"))
      .cache()
    val (assigned, _) = Similarity.kmeans(pts, k = 10, maxIter = 5)
    val purity = assigned.join(pts.select("vec_id", "cid"), "vec_id")
      .groupBy("cluster", "cid").count()
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("cluster")
          .orderBy(desc("count"), asc("cid"))))
      .filter(col("rk") === 1)
      .agg(sum("count")).head().getLong(0).toDouble / pts.count()
    pts.unpersist()
    assert(purity >= 0.95, s"kmeans purity $purity vs planted 10-center structure")
  }

  test("semDedup removals are a subset of the exact graph's, probe=3 recall >= 0.9") {
    // measured on this uniform-direction corpus: recall 3/7 at probe=1,
    // 5/7 at probe=2, 7/7 at probe=3 — thin Voronoi margins are the
    // adversarial case for any single-assignment bucketing; see the
    // semDedup scaladoc
    val tau = 0.45
    def removed(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.filter(col("is_keeper") === 0).select(col("vec_id").cast("long"))
        .as[Long].collect().toSet
    val exact = removed(Similarity.dedupByEmbedding(emb, tau))
    val sem = removed(Similarity.semDedup(emb, k = 10, tau = tau, probe = 3))
    assert(exact.nonEmpty, "corpus should contain planted embedding near-dups")
    // cell-restricted pairs ⊆ all pairs ⇒ finer components ⇒ every
    // semDedup removal is justified by a kept exact near-duplicate
    assert(sem.subsetOf(exact), s"phantom removals: ${sem.diff(exact).take(5)}")
    val recall = sem.size.toDouble / exact.size
    assert(recall >= 0.9, s"semdedup recall $recall of ${exact.size} removals")
  }
}
