package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-`p` by (score DESC, id ASC) as a typed `Aggregator` —
  * the map-side-combinable replacement for the `row_number() <= p`
  * window idiom on (key, candidate, score) frames.
  *
  * Why it exists: a rank window must SHUFFLE every scored candidate row
  * (n·k rows for n keys × k candidates) before it can rank within a
  * key, because ranking is not a partial aggregate. This buffer — at
  * most `p` (score, id) pairs, merged by sorted union + truncate — IS
  * one: each map task pre-reduces its slice of a key's candidates to
  * ≤ p pairs, so what crosses the exchange is O(n·p), not O(n·k). At
  * SemDedup/IVF production shapes (k = thousands of cells, p = 2–3
  * probes) that is the difference between shuffling the corpus×cells
  * cross product and shuffling ~the corpus.
  *
  * Determinism: total order (score DESC, id ASC) with unique ids —
  * merge order cannot change the kept set; ties at the boundary break
  * to the smaller id, matching the window form's
  * `orderBy(desc(score), asc(id))` exactly (pinned in SimilaritySpec).
  *
  * The buffer is a sorted Array of packed (score, id) kept small
  * (p ≤ ~dozens); insert is O(p) shift — trivial next to the dot
  * product that produced the score.
  */
class TopByAggregator(p: Int)
    extends Aggregator[(Double, Long), Array[(Double, Long)], Array[(Double, Long)]] {
  require(p > 0, "top-p needs p > 0")

  /** (a before b) in the kept order: higher score first, then smaller id.
    * Total under NaN: `java.lang.Double.compare` ranks NaN greatest —
    * matching Spark's `desc` ordering (NaN first) — so zero-norm
    * embeddings whose cosine is NaN cannot make the kept set
    * partition-order-dependent. `+ 0.0` folds -0.0 into +0.0, matching
    * Spark's -0.0 ≡ 0.0 sort semantics. */
  private def before(a: (Double, Long), b: (Double, Long)): Boolean = {
    val c = java.lang.Double.compare(a._1 + 0.0, b._1 + 0.0)
    c > 0 || (c == 0 && a._2 < b._2)
  }

  override def zero: Array[(Double, Long)] = Array.empty

  override def reduce(
      buf: Array[(Double, Long)], x: (Double, Long)): Array[(Double, Long)] = {
    if (buf.length == p && !before(x, buf(p - 1))) buf
    else {
      // insert into sorted position, drop the overflow
      val out = new Array[(Double, Long)](math.min(buf.length + 1, p))
      var i = 0
      while (i < buf.length && before(buf(i), x)) { if (i < out.length) out(i) = buf(i); i += 1 }
      if (i < out.length) out(i) = x
      var j = i + 1
      while (j < out.length) { out(j) = buf(j - 1); j += 1 }
      out
    }
  }

  override def merge(
      a: Array[(Double, Long)], b: Array[(Double, Long)]): Array[(Double, Long)] = {
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      val out = new Array[(Double, Long)](math.min(a.length + b.length, p))
      var i = 0; var j = 0; var o = 0
      while (o < out.length) {
        if (j >= b.length || (i < a.length && before(a(i), b(j)))) { out(o) = a(i); i += 1 }
        else { out(o) = b(j); j += 1 }
        o += 1
      }
      out
    }
  }

  override def finish(r: Array[(Double, Long)]): Array[(Double, Long)] = r

  override def bufferEncoder: Encoder[Array[(Double, Long)]] =
    ExpressionEncoder[Array[(Double, Long)]]()
  override def outputEncoder: Encoder[Array[(Double, Long)]] =
    ExpressionEncoder[Array[(Double, Long)]]()
}
