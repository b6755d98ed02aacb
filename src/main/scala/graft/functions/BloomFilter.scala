package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Distributed Bloom-filter build as a typed `Aggregator`: one pass over
  * the keys produces an `Array[Long]` bit table whose partial buffers
  * MERGE by bitwise OR — so partial aggregation, shard-parallel builds,
  * and sketch persistence compose exactly like [[MinHashAggregator]]'s
  * min-merge. `numBits` must be a multiple of 64.
  *
  * Hash family (Kirsch–Mitzenmacher double hashing, k derived probes
  * from two base hashes): h1 = XXH64(bytes, 42) ≡ the built-in column
  * `xxhash64(key)`; h2 = XXH64(bytes, XXH64.hashInt(1, 42)) ≡
  * `xxhash64(lit(1), key)`, forced odd; bit_i = floorMod(h1 + i·h2, m).
  * Keeping the family expressible with the BUILT-IN xxhash64 column
  * function is what lets the membership probe stay a pure codegen'd
  * Column ([[BloomFilter.mightContain]]) — no UDF on the read path.
  */
class BloomFilterAggregator(numBits: Int, numHashes: Int)
    extends Aggregator[String, Array[Long], Array[Long]] {
  require(numBits % 64 == 0 && numBits > 0, "numBits must be a positive multiple of 64")
  require(numHashes > 0, "numHashes must be positive")

  private val seed2 = XXH64.hashInt(1, 42L)

  override def zero: Array[Long] = new Array[Long](numBits / 64)

  override def reduce(buf: Array[Long], key: String): Array[Long] = {
    // null keys never match an equi-join anyway, so the filter that
    // prefilters one may skip them — and UTF8String.fromString(null)
    // would NPE on a corpus with null text
    if (key == null) return buf
    val s = UTF8String.fromString(key)
    val h1 = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
    val h2 = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seed2) | 1L
    var i = 0
    while (i < numHashes) {
      val bit = java.lang.Math.floorMod(h1 + i * h2, numBits.toLong).toInt
      buf(bit >>> 6) |= 1L << (bit & 63)
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(reduction: Array[Long]): Array[Long] = reduction

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

/** Build/probe helpers around [[BloomFilterAggregator]].
  *
  * The built filter is collected to the driver as one `Array[Long]` —
  * a BOUNDED driver touchpoint of exactly `numBits/8` bytes (2^20 bits
  * = 128 KiB), the same documented pattern as the one-row CMS sketch
  * probe — and then embedded as an array literal in the probe plan:
  * codegen references the literal once per task, so the per-row cost is
  * k integer ops + k array reads, map-only, zero shuffle, inside
  * whole-stage codegen. That is what makes it a useful PREFILTER: a
  * negative answer is definitive (no false negatives), so only the
  * ~fpp fraction of positive rows ever reaches the exact (shuffling)
  * verification join.
  */
object BloomFilter {

  /** One distributed pass over `keys` → the filter's word table. */
  def build(keys: DataFrame, keyCol: Column, numBits: Int, numHashes: Int): Array[Long] = {
    val agg = udaf(new BloomFilterAggregator(numBits, numHashes), Encoders.STRING)
    keys.select(agg(keyCol).as("bloom")).head().getSeq[Long](0).toArray
  }

  /** Pure-Column membership probe against a driver-held filter: true =
    * "maybe present" (up to fpp), false = "definitely absent". Exactly
    * the aggregator's hash family, via the built-in `xxhash64`.
    * Null-key note: `xxhash64` skips null inputs (yields the seed hash,
    * never NULL), so the probe is already total; the outer coalesce
    * guards the contract anyway — a NULL condition here would drop the
    * row from BOTH branches of a maybe/not-maybe split, silently losing
    * it, and the build skips nulls so false is the truthful answer.
    */
  def mightContain(bloom: Array[Long], keyCol: Column, numBits: Int, numHashes: Int): Column = {
    require(bloom.length.toLong * 64 == numBits, "bloom length must match numBits")
    val words = typedlit(bloom)
    val h1 = xxhash64(keyCol)
    val h2 = xxhash64(lit(1), keyCol).bitwiseOR(lit(1L))
    coalesce(
      (0 until numHashes).map { i =>
        val bit = pmod(h1 + lit(i.toLong) * h2, lit(numBits.toLong))
        val word = element_at(words, (bit / 64).cast("int") + 1)
        // getbit's probe position is a Column, which the scala DSL's
        // shiftleft/shiftright overloads can't express
        call_function("getbit", word, (bit % 64).cast("int")) === lit(1)
      }.reduce(_ && _),
      lit(false))
  }
}
