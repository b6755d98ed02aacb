package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed
  * (one machine, one user, one document dominating a partition).
  *
  * AQE's skew-join splitting (enabled in GraftSession) handles sort-merge
  * skew at runtime; [[saltedJoin]] is the explicit form for when the skew
  * is known upfront or AQE can't apply (e.g. aggregations after the
  * join): the big side's key is salted into `saltBuckets` sub-keys, the
  * small side is replicated once per salt value, and the join runs on
  * (key, salt) — the hot key's rows spread over `saltBuckets` tasks.
  * Output is identical to the unsalted join.
  */
object Skew {

  /** Left-side-salted inner equi-join: `big ⋈ small` on `keys`. */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      saltBuckets: Int = 16): DataFrame = {
    val salted = big.withColumn("graft_salt",
      floor(rand(42L) * lit(saltBuckets)).cast("int"))
    val replicated = small.withColumn("graft_salt",
      explode(array((0 until saltBuckets).map(lit): _*)))
    salted.join(replicated, keys :+ "graft_salt")
      .drop("graft_salt")
  }
}
