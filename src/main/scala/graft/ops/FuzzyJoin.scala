package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy entity matching: pairs of values within a bounded edit
  * distance — the blocking+verify core of entity resolution (dedup of
  * names, product titles, addresses).
  *
  * Scale shape: matching runs on the DISTINCT value dictionary, not the
  * row stream (the bpeEncode lesson: run expensive per-value work on
  * the bounded dimension, join occurrences back). Candidates are
  * blocked by a length band — |len(a)−len(b)| ≤ maxDist is a NECESSARY
  * condition for edit distance ≤ maxDist, so the block is lossless —
  * realized as a bin join (each probe explodes to its own and adjacent
  * length buckets; never an inequality nested loop). Verification is
  * the exact `levenshtein` built-in: an INTEGER metric, so cross-engine
  * parity is exact with no float rules. For dictionaries where the
  * length band still leaves too many candidates, the next levers are
  * q-gram count filtering or Pass-Join segment blocking — both compose
  * with this verify step unchanged.
  */
object FuzzyJoin {

  /** Unordered distinct-value pairs `(name_a, name_b, dist)` with
    * `dist ≤ maxDist`, `name_a < name_b`. */
  def dictionaryMatches(
      df: DataFrame,
      nameCol: String,
      maxDist: Int): DataFrame = {
    require(maxDist >= 0, "maxDist must be >= 0")
    val width = maxDist + 1
    val names = df.select(col(nameCol).as("__name"))
      .filter(col("__name").isNotNull).distinct()
      .withColumn("__len", length(col("__name")))
      .withColumn("__b0", floor(col("__len") / width))
    // probe side visits its own and both neighbor buckets, build side
    // keys its home bucket: every in-band pair meets exactly once (the
    // build bucket is unique per name, and the a < b orientation keeps
    // only one of the two probe directions)
    val probe = names
      .withColumn("__bu",
        explode(array(col("__b0") - 1, col("__b0"), col("__b0") + 1)))
      .select(col("__name").as("name_a"), col("__len").as("__la"), col("__bu"))
    val build = names.select(
      col("__name").as("name_b"), col("__len").as("__lb"),
      col("__b0").as("__bu"))
    probe.join(build, Seq("__bu"))
      .filter(col("name_a") < col("name_b") &&
        abs(col("__la") - col("__lb")) <= maxDist)
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= maxDist)
      .select("name_a", "name_b", "dist")
  }
}
