package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.ops.TextDedup

/** Large-star/small-star connected components vs the pointer-jumping
  * label-propagation loop: identical labelings, measured round counts on a
  * high-diameter chain (the VERDICT r5 stretch benchmark).
  */
class ClustersStarSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def labelMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.select(col("id").cast("long"), col("cluster_id").cast("long"))
      .as[(Long, Long)].collect().toMap

  test("star and jump agree on the diameter-1000 chain; measured round parity") {
    // chain 0-1-2-...-1000: one component, diameter 1000 — the worst case
    // for naive propagation (1000 rounds) and the discriminating case
    // between pointer jumping and star contraction. This is the VERDICT
    // r5 stretch benchmark, and it ADJUDICATES THE HYPOTHESIS NEGATIVELY:
    // star does NOT halve iteration count — both converge in 11 rounds
    // (10 × log₂(1000) progress + 1 stability-detect round), because one
    // large-star halves the chain's diameter exactly as one pointer jump
    // doubles reach. Star's remaining advantage is memory shape (no O(V)
    // label table; state is the contracting edge list), not rounds.
    val chain = spark.range(1000).select(col("id").as("d1"), (col("id") + 1).as("d2"))
    var jumpRounds = -1
    var starRounds = -1
    val jump = labelMap(TextDedup.clusters(chain, maxIter = 50,
      localFinishMaxEdges = -1, roundCounter = r => jumpRounds = r))
    val star = labelMap(TextDedup.clustersStar(chain, maxIter = 50,
      roundCounter = r => starRounds = r))
    assert(jump.size == 1001 && star.size == 1001)
    assert(jump.values.forall(_ == 0L), "every chain vertex labels to the minimum 0")
    assert(star == jump)
    // pin the measured parity (both deterministic): a future regression
    // in either loop's progress-per-round shows up here
    assert(jumpRounds == 11, s"jump rounds moved: $jumpRounds")
    assert(starRounds <= jumpRounds,
      s"star=$starRounds rounds regressed past jump=$jumpRounds on a deep chain")
  }

  test("star matches jump on the multi-component corpus pair graph") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val pairs = TextDedup.jaccardPairs(docs, k = 2, tau = 0.8).persist()
    val jump = labelMap(TextDedup.clusters(pairs, localFinishMaxEdges = -1))
    val star = labelMap(TextDedup.clustersStar(pairs))
    assert(jump.nonEmpty)
    assert(star == jump)
    pairs.unpersist()
  }

  test("star handles null endpoints and self-pairs like clusters") {
    val pairs = Seq[(java.lang.Long, java.lang.Long)](
      (1L, 2L), (2L, 3L), (7L, 7L), (9L, null), (null, 4L), (null, null))
      .toDF("d1", "d2")
    val star = labelMap(TextDedup.clustersStar(pairs))
    val jump = labelMap(TextDedup.clusters(pairs, localFinishMaxEdges = -1))
    assert(star == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 9L, 4L -> 4L))
    assert(star == jump)
  }

  test("star supports reliable checkpointing") {
    val dir = java.nio.file.Files.createTempDirectory("graft-star-ckpt").toString
    val chain = spark.range(64).select(col("id").as("d1"), (col("id") + 1).as("d2"))
    val star = labelMap(TextDedup.clustersStar(chain, checkpointDir = Some(dir)))
    assert(star.size == 65 && star.values.forall(_ == 0L))
  }
}
