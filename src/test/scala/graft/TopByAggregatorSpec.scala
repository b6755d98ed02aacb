package graft

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Similarity

/** The bounded top-p aggregator's ordering contract: total under NaN
  * (zero-norm embeddings), -0.0 ≡ 0.0, identical to the row_number
  * window form at every partitioning, and tolerant of non-long id types
  * at the Similarity call sites.
  */
class TopByAggregatorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("NaN and -0.0 keep the window-form order at any partitioning") {
    val rows = Seq(
      // key 1: a NaN candidate — Spark's desc ordering ranks NaN FIRST,
      // so the kept top-2 must be (NaN, then the best real score)
      (1L, 0.9, 10L), (1L, Double.NaN, 11L), (1L, 0.8, 12L), (1L, 0.7, 13L),
      // key 2: two NaNs — both kept, tie broken to the smaller id
      (2L, Double.NaN, 21L), (2L, Double.NaN, 20L), (2L, 1.0, 22L),
      // key 3: -0.0 vs 0.0 are EQUAL — tie must break by id, not by sign
      (3L, -0.0, 31L), (3L, 0.0, 30L), (3L, -1.0, 32L))
      .toDF("key", "score", "id")
    val topby = udaf(new graft.functions.TopByAggregator(2),
      ExpressionEncoder[(Double, Long)]())
    def kept(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
      df.groupBy("key").agg(topby(col("score"), col("id")).as("top"))
        .select(col("key"), expr("transform(top, x -> x._2)").as("ids"))
        .as[(Long, Seq[Long])].collect().toMap
    // the window form this aggregator replaces (rank by desc score, asc id)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("key").orderBy(desc("score"), asc("id"))
    val windowForm = rows
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      .orderBy("key", "rn")
      .select("key", "id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val expected = Map(
      1L -> Seq(11L, 10L), 2L -> Seq(20L, 21L), 3L -> Seq(30L, 31L))
    assert(windowForm == expected, "window-form baseline moved")
    // partition-order independence: merge order must not change the set
    for (parts <- Seq(1, 3, 7)) {
      assert(kept(rows.repartition(parts)) == expected,
        s"kept set diverged at $parts partitions")
    }
  }

  test("int-typed centroid ids work through the probe path") {
    // the aggregator's input encoder is (Double, Long); the call sites
    // cast c_id, so an int-id centroid table must not fail at runtime
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.9f, 0.1f)), (3L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val centroids = Seq(
      (1, Seq(1.0f, 0.0f)), (2, Seq(0.0f, 1.0f)))
      .toDF("c_id", "c_emb")
      .withColumn("c_id", col("c_id").cast("int"))
    val got = Similarity.ivfTopKWithCentroids(
        emb, centroids, emb.filter(col("vec_id") === 1L), k = 2, nProbe = 1)
      .select("n_id").as[Long].collect().toSet
    // list 1 holds {1, 2}; self-matches are excluded, so the probe
    // returns exactly vector 2 (the point is it RUNS with int c_id)
    assert(got == Set(2L))
  }
}
