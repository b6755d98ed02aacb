package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weighted PageRank over an edge DataFrame — the ranking half of
  * TextRank keyword extraction (Mihalcea & Tarau 2004) when the edges
  * are word co-occurrences, and a general centrality tool for any graph
  * the engine derives (near-dup graphs, transition graphs).
  *
  * Power iteration: r'(v) = (1−d)/N + d·(Σ_in r(u)·w(u,v)/W(u) + D/N)
  * where W(u) is u's total out-weight and D the dangling mass (rank
  * held by nodes with no out-edges, redistributed uniformly — without
  * it rank leaks and Σr drifts from 1).
  *
  * Scale shape, mirroring the connected-components loop: edges are
  * normalized ONCE (one join + one aggregate, then persisted); each
  * iteration is one join on `src` + one aggregate on `dst` over the
  * edge table, with `localCheckpoint` per round capping lineage. Driver
  * state per iteration is two scalars (node count once, dangling mass
  * per round) — the same bounded-driver-action class as the CC
  * convergence checksum. Iterations are FIXED (`iters`), not
  * convergence-tested, so the result is a pure function of the graph —
  * reproducible across engines and what the unrolled-CTE oracle
  * replays.
  */
object Graph {

  /** Personalized PageRank: teleportation lands on `sources` (uniformly
    * across them) instead of on all nodes — rank measures proximity to
    * the seed set, the standard recommendation / related-items scoring.
    * Dangling mass also returns to the sources, preserving Σr = 1.
    * Identical iteration shape to [[pageRank]]; `None` = classic
    * uniform teleport.
    *
    * Seeds are deduplicated (a repeated seed must not dilute the others'
    * 1/|S| share), and every seed must exist in the graph — a missing
    * seed would silently leave Σr below 1, so it fails fast instead.
    */
  def personalizedPageRank(
      edges: DataFrame,
      sources: Seq[Any],
      iters: Int = 10,
      damping: Double = 0.85,
      srcCol: String = "src",
      dstCol: String = "dst",
      weightCol: String = "weight"): DataFrame = {
    val distinctSources = sources.distinct
    require(distinctSources.nonEmpty, "personalized PageRank needs at least one source")
    pageRankImpl(edges, iters, damping, srcCol, dstCol, weightCol, Some(distinctSources))
  }

  def pageRank(
      edges: DataFrame,
      iters: Int = 10,
      damping: Double = 0.85,
      srcCol: String = "src",
      dstCol: String = "dst",
      weightCol: String = "weight"): DataFrame =
    pageRankImpl(edges, iters, damping, srcCol, dstCol, weightCol, None)

  private def pageRankImpl(
      edges: DataFrame,
      iters: Int,
      damping: Double,
      srcCol: String,
      dstCol: String,
      weightCol: String,
      sources: Option[Seq[Any]]): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val e = edges.select(
      col(srcCol).as("src"), col(dstCol).as("dst"),
      col(weightCol).cast("double").as("w"))
      .filter(col("src").isNotNull && col("dst").isNotNull && col("w") > 0)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().persist()
    val nCount = nodes.count() // fills the persist; one bounded scalar
    val outW = e.groupBy("src").agg(sum("w").as("ow")).persist()
    val eNorm = e.join(outW, "src")
      .select(col("src"), col("dst"), (col("w") / col("ow")).as("frac"))
      .persist()
    eNorm.count() // pre-fill before the multi-consumer loop
    val srcNodes = outW.select(col("src").as("node"))
    // teleport distribution t(v): uniform 1/N classically, 1/|S| over
    // the seed set for personalized ranks. Both the (1−d) restart and
    // the dangling mass land on t, so Σr = 1 is preserved either way.
    val teleport = sources match {
      case Some(s) =>
        // bounded driver check (one count over the persisted node set):
        // a seed absent from the graph would receive teleport mass that
        // can never flow anywhere, silently breaking Σr = 1
        val present = nodes.filter(col("node").isin(s: _*)).count()
        require(present == s.size,
          s"personalized PageRank: ${s.size - present} seed(s) not present in the graph")
        when(col("node").isin(s: _*), lit(1.0 / s.size)).otherwise(lit(0.0))
      case None => lit(1.0 / nCount)
    }
    var ranks = nodes.withColumn("r", teleport).localCheckpoint()
    (1 to iters).foreach { _ =>
      // the dangling mass rides along as a broadcast one-row frame
      // instead of a per-round driver collect — each iteration is ONE
      // job (the localCheckpoint materialization), not two
      val dangling = ranks.join(srcNodes, Seq("node"), "left_anti")
        .agg(coalesce(sum("r"), lit(0.0)).as("__dm"))
      val inc = eNorm
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("r") * col("frac")).as("inc"))
      // superseded checkpoints are released by the ContextCleaner when
      // the reference drops (unpersist() is a no-op on localCheckpoint'd
      // data); lit(1 - damping) is the SCALA double 0.150…02 for the
      // default 0.85 — the oracle generators emit the same literal and
      // the same association, so the chain is bit-identical end to end
      ranks = nodes.join(inc, Seq("node"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("node"),
          (teleport * (lit(1 - damping) + lit(damping) * col("__dm")) +
            lit(damping) * coalesce(col("inc"), lit(0.0))).as("r"))
        .localCheckpoint()
    }
    nodes.unpersist()
    outW.unpersist()
    eNorm.unpersist()
    ranks
  }

  /** Canonical undirected simple edges a < b: self-loops and nulls
    * dropped, duplicate/reverse edges collapsed.
    */
  private def simpleEdges(edges: DataFrame, srcCol: String, dstCol: String): DataFrame =
    edges.select(
        least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
      .distinct()

  /** Endpoint degrees of a canonical simple edge list. */
  private def degrees(e: DataFrame): DataFrame =
    e.select(col("a").as("node"))
      .union(e.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))

  /** Per-node triangle counts over the undirected simple graph induced
    * by `edges` (self-loops dropped, duplicate/reverse edges collapsed).
    * Returns `(node, deg, triangles)` for every node, triangles = number
    * of triangles the node participates in.
    *
    * Scale shape — compact-forward / node-iterator++ (Latapy 2008;
    * Suri & Vassilvitskii's MR-friendly orientation): every edge is
    * oriented from its lower-(degree, id) endpoint to the higher one,
    * so each node's OUT-degree is O(√m) regardless of how skewed the
    * in-degree is, and the wedge self-join generates O(m^1.5) candidate
    * rows instead of Σ deg² (a hub with degree 10⁶ would otherwise
    * contribute 10¹² wedges on its own). Each triangle {x,y,z} with
    * rank x<y<z appears exactly once: as the wedge (x→y, x→z) closed by
    * the oriented edge y→z. Three shuffles total (degree aggregate,
    * wedge join on the pivot, closing join on (v,w)) plus the final
    * per-node count — no iteration, no driver state.
    */
  def triangleCounts(
      edges: DataFrame,
      srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    val e = simpleEdges(edges, srcCol, dstCol).persist()
    val deg = degrees(e).persist()
    deg.count() // pre-fill: deg is consumed by the orientation AND the output join
    // orient each edge from the lower (deg, node) endpoint u to the
    // higher one v; carry v's rank for the wedge ordering below
    val oriented = e
      .join(deg.select(col("node").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("db")), "b")
      .select(
        when(col("da") < col("db") ||
             (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("u"), col("b").as("v"), col("db").as("dv")))
        .otherwise(
          struct(col("b").as("u"), col("a").as("v"), col("da").as("dv")))
        .as("o"))
      .select(col("o.u").as("u"), col("o.v").as("v"), col("o.dv").as("dv"))
      .persist()
    oriented.count() // pre-fill: three consumers (two wedge sides + closer)
    // wedges at pivot u with rank(v) < rank(w); the closing edge, if the
    // triangle exists, is oriented v→w by rank transitivity
    val wedges = oriented.select(col("u"), col("v").as("v1"), col("dv").as("d1"))
      .join(oriented.select(col("u"), col("v").as("v2"), col("dv").as("d2")), Seq("u"))
      .filter(col("d1") < col("d2") ||
              (col("d1") === col("d2") && col("v1") < col("v2")))
      .select(col("u"), col("v1").as("v"), col("v2").as("w"))
    val triangles = wedges
      .join(oriented.select(col("u").as("v"), col("v").as("w")), Seq("v", "w"))
    val perNode = triangles
      .select(explode(array(col("u"), col("v"), col("w"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
    // eager localCheckpoint (O(nodes) rows) so the scoped persists can be
    // released before returning — the lazy plan would otherwise recompute
    // the wedge join once per downstream consumer
    val out = deg.join(perNode, Seq("node"), "left")
      .select(col("node"), col("deg"),
        coalesce(col("triangles"), lit(0L)).as("triangles"))
      .localCheckpoint()
    e.unpersist()
    deg.unpersist()
    oriented.unpersist()
    out
  }

  /** k-core: the maximal subgraph in which every node has degree ≥ k,
    * by iterative peeling — drop under-degree nodes, recompute, repeat
    * to the fixpoint. Returns `(node, deg)` of the surviving core with
    * in-core degrees (empty when the graph has no k-core).
    *
    * Scale shape — the CC-loop pattern: each round is one degree
    * aggregate + two semi-joins against the (broadcastable-or-shuffled)
    * survivor set, materialized with `localCheckpoint` to cap lineage;
    * the only driver state is the edge count (ONE bounded scalar per
    * round, doubling as the convergence test — peeling strictly
    * shrinks the edge set or has converged). Rounds are data-bounded:
    * each non-final round removes ≥ 1 edge, and in practice peeling
    * collapses in a handful of cascades; `maxRounds` is a safety
    * valve, not a tuning knob.
    */
  def kCore(
      edges: DataFrame,
      k: Int,
      srcCol: String = "src",
      dstCol: String = "dst",
      maxRounds: Int = 1000): DataFrame = {
    require(k >= 1, "k must be >= 1")
    var e = simpleEdges(edges, srcCol, dstCol).localCheckpoint()
    var nEdges = e.count()
    var prev = -1L
    var rounds = 0
    while (nEdges != prev && nEdges > 0 && rounds < maxRounds) {
      val keep = degrees(e).filter(col("deg") >= k).select("node")
      // the superseded checkpoint's blocks are released by the
      // ContextCleaner once the reference drops (Dataset.unpersist is a
      // no-op on localCheckpoint'd data — it only clears CacheManager
      // entries)
      e = e
        .join(keep.withColumnRenamed("node", "a"), "a")
        .join(keep.withColumnRenamed("node", "b"), "b")
        .select("a", "b")
        .localCheckpoint()
      prev = nEdges
      nEdges = e.count()
      rounds += 1
    }
    // fail fast rather than present a partially-peeled graph as the
    // k-core: a long-path graph peels O(diameter) rounds, and a silent
    // early exit would return nodes with deg < k (the oracle peels to
    // the true fixpoint, so the hash gate would diverge too)
    require(nEdges == prev || nEdges == 0,
      s"k-core peel did not converge within $maxRounds rounds " +
        s"($nEdges edges still shrinking) — raise maxRounds")
    degrees(e)
  }
}
