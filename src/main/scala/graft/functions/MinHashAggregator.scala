package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass MinHash sketch as a typed `Aggregator`: one grouping pass
  * produces the whole `numHashes`-wide signature with an `Array[Long]`
  * buffer — versus `numHashes` separate `min(xxhash64(...))` column
  * aggregates, this hashes each shingle's bytes once per seed into a
  * primitive buffer with no per-column aggregate state, and the buffer is
  * MERGEABLE (elementwise min), so partial aggregation and any future
  * sketch persistence compose for free.
  *
  * Hash family parity: seed_i = XXH64.hashInt(i, 42) then
  * XXH64.hashUnsafeBytes(shingleBytes, seed_i) — exactly what the column
  * expression `xxhash64(lit(i), shingle)` computes (seed 42, left fold
  * over children), so signatures are bit-identical to the column form
  * (asserted in DedupSpec).
  */
class MinHashAggregator(numHashes: Int)
    extends Aggregator[String, Array[Long], Array[Long]] {

  private val seeds: Array[Long] = Array.tabulate(numHashes)(i => XXH64.hashInt(i, 42L))

  override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)

  override def reduce(buf: Array[Long], shingle: String): Array[Long] = {
    val s = UTF8String.fromString(shingle)
    var i = 0
    while (i < numHashes) {
      val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seeds(i))
      if (h < buf(i)) buf(i) = h
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(reduction: Array[Long]): Array[Long] = reduction

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}
