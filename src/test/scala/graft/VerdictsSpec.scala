package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Similarity
import graft.queries.Verdicts

/** The ANN verdict rows' failure modes: a returned rank with no exact
  * counterpart must FAIL dom/cos flags, never vanish into a null-
  * skipping min (corpus ≤ k shortfall).
  */
class VerdictsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("annRecall: ranks beyond the exact top-k fail dom_ok, honest results pass") {
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.8f, 0.6f)))
      .toDF("vec_id", "embedding")
    val queries = emb.filter(col("vec_id") === 1L)
    // honest result = the exact top-k itself (self-matches excluded, so
    // a two-vector corpus yields ONE rank per query): passes all flags
    val honest = Similarity.topK(emb, queries, k = 5)
      .select("q_id", "n_id", "rk", "cosine")
    val ok = Verdicts.annRecall(emb, queries, honest, k = 5, minRecall = 0.5)
      .select("n_ret", "dom_ok", "cos_ok").as[(Long, Int, Int)].head()
    assert(ok == ((1L, 1, 1)))
    // a (buggy) result claiming a SECOND rank the exact side doesn't
    // have: the rk=2 row's comparison is null, and it must count as a
    // dom_ok FAILURE, not be skipped by min()
    val phantom = honest.unionByName(
      honest.filter(col("rk") === 1)
        .select(col("q_id"), col("n_id"), lit(2).as("rk"), col("cosine")))
    val bad = Verdicts.annRecall(emb, queries, phantom, k = 5, minRecall = 0.5)
      .select("n_ret", "dom_ok").as[(Long, Int)].head()
    assert(bad._1 == 2L)
    assert(bad._2 == 0, "dom_ok must fail when a rank has no exact twin")
  }
}
