package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** Verdict-row builders: turn a hash-unportable result (xxhash64 sketches,
  * ANN, learned models) into a small frame of ORACLE-CHECKABLE columns —
  * exact counts DuckDB recomputes independently plus 0/1 invariant flags
  * DuckDB asserts are 1 — so the driver's hash gate covers the operator
  * end-to-end instead of recording `no_oracle`. The pattern that graduated
  * `ext_sketch_quantile` in round 13, factored out for the whole rows-only
  * family.
  *
  * Every flag here restates an invariant ALREADY pinned by a ScalaTest
  * spec (DedupSpec / SimilaritySpec / SemDedupSpec / QualityModelSpec
  * recall and identity floors); the verdict rows move that pin into the
  * per-round `CORRECTNESS_r{N}.json` gate, where the driver re-checks it
  * at the verify scale on every round.
  */
object Verdicts {

  /** Per-query verdict for an approximate top-k result against the exact
    * brute-force top-k over the same corpus:
    *
    *   - `n_ret`: rows returned for the query (the oracle pins = k);
    *   - `dom_ok`: at every rank r, the approximate cosine ≤ the exact
    *     rank-r cosine (the exact list dominates any other ranking — a
    *     violation means the "exact" or the ranking is broken);
    *   - `cos_ok`: every reported cosine equals the cosine recomputed
    *     from the raw vectors (catches stale/corrupted index payloads —
    *     the indexed variants round-trip vectors through parquet);
    *   - `recall_ok`: corpus-wide recall@k ≥ `minRecall` (per-query
    *     recall is too noisy on this uniform-direction corpus — measured
    *     per-query spread 0.1–0.7 at sf0.01 while overall holds ≥ 0.38).
    */
  def annRecall(
      emb: DataFrame,
      queries: DataFrame,
      result: DataFrame,
      k: Int,
      minRecall: Double,
      idCol: String = "vec_id"): DataFrame = {
    val s = emb.sparkSession
    val exact = Similarity.topK(emb, queries, k, idCol)
      .select(col("q_id"), col("n_id"), col("rk"), col("cosine").as("ex_cos"))
    val r = result.select(col("q_id"), col("n_id"), col("rk"), col("cosine"))
    val qv = queries.select(col(idCol).as("q_id"), col("embedding").as("q_emb"))
    val nv = emb.select(col(idCol).as("n_id"), col("embedding").as("n_emb"))
    // result ≤ k·|queries| rows: broadcast it against the corpus fetch
    val withTrue = nv.join(broadcast(r.join(broadcast(qv), Seq("q_id"))), Seq("n_id"))
      .withColumn("true_cos", Similarity.cosine(s)(col("q_emb"), col("n_emb")))
      .join(broadcast(exact.select(col("q_id"), col("rk"), col("ex_cos"))),
        Seq("q_id", "rk"), "left")
    val perQuery = withTrue.groupBy("q_id").agg(
      count(lit(1)).as("n_ret"),
      // coalesce(..., 0): a returned rank with NO exact counterpart
      // (exact top-k shorter than the result — corpus <= k, or a broken
      // ranking) must FAIL the flag, not vanish as a null min skips
      min(coalesce((col("cosine") <= col("ex_cos") + lit(1e-9)).cast("int"),
        lit(0))).as("dom_ok"),
      min(coalesce((abs(col("cosine") - col("true_cos")) <= lit(1e-9)).cast("int"),
        lit(0))).as("cos_ok"))
    // corpus-wide recall: exact pairs found by the approximate result
    val hits = r.join(exact.select("q_id", "n_id"), Seq("q_id", "n_id"), "left_semi")
      .agg(count(lit(1)).as("n_hit"))
      .crossJoin(exact.agg(count(lit(1)).as("n_exact")))
      .select((col("n_hit") >= lit(minRecall) * col("n_exact")).cast("int")
        .as("recall_ok"))
    queries.select(col(idCol).as("q_id"))
      .join(perQuery, Seq("q_id"), "left")
      .select(col("q_id"),
        coalesce(col("n_ret"), lit(0L)).as("n_ret"),
        coalesce(col("dom_ok"), lit(1)).as("dom_ok"),
        coalesce(col("cos_ok"), lit(1)).as("cos_ok"))
      .crossJoin(broadcast(hits))
  }

  /** Per-query identity verdict between two top-k results that must be
    * bit-equal (e.g. a persisted index probe vs the in-memory operator):
    * `n_ret` rows in `a` and `n_mismatch` = rows of either side with no
    * (q_id, n_id, rk, ~cosine)-matching row on the other.
    */
  def annIdentity(queries: DataFrame, a: DataFrame, b: DataFrame,
      idCol: String = "vec_id"): DataFrame = {
    val keys = Seq("q_id", "n_id", "rk")
    val aa = a.select(col("q_id"), col("n_id"), col("rk"), col("cosine").as("a_cos"))
    val bb = b.select(col("q_id"), col("n_id"), col("rk"), col("cosine").as("b_cos"))
    val joined = aa.join(bb, keys, "full_outer")
    val mism = joined.groupBy("q_id").agg(
      sum(col("a_cos").isNotNull.cast("long")).as("n_ret"),
      sum((col("a_cos").isNull || col("b_cos").isNull ||
        abs(col("a_cos") - col("b_cos")) > lit(1e-9)).cast("long")).as("n_mismatch"))
    queries.select(col(idCol).as("q_id"))
      .join(mism, Seq("q_id"), "left")
      .select(col("q_id"),
        coalesce(col("n_ret"), lit(0L)).as("n_ret"),
        coalesce(col("n_mismatch"), lit(0L)).as("n_mismatch"))
  }

  /** One-row pair-set comparison: `n_ref` reference pairs (the oracle
    * recomputes this count exactly), `n_missing` = ref pairs absent from
    * `got`, `n_extra` = got pairs absent from ref. Callers derive their
    * flags (equality: both 0; subset+recall: extra 0, missing bounded).
    */
  def pairStats(
      ref: DataFrame, got: DataFrame,
      refCols: (String, String), gotCols: (String, String)): DataFrame = {
    val r = ref.select(col(refCols._1).as("p1"), col(refCols._2).as("p2"))
    val g = got.select(col(gotCols._1).as("p1"), col(gotCols._2).as("p2"))
    r.agg(count(lit(1)).as("n_ref"))
      .crossJoin(r.join(g, Seq("p1", "p2"), "left_anti")
        .agg(count(lit(1)).as("n_missing")))
      .crossJoin(g.join(r, Seq("p1", "p2"), "left_anti")
        .agg(count(lit(1)).as("n_extra")))
  }

  /** Recall flag over [[pairStats]] output: found ≥ `floor` of n_ref. */
  def recallFlag(floor: Double): Column =
    (col("n_ref") - col("n_missing") >= lit(floor) * col("n_ref")).cast("int")
      .as("recall_ok")
}
