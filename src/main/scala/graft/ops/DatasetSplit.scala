package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic train/val/test splitting for training-data pipelines.
  *
  * The split is a pure function of CONTENT (first 16 bits of md5), not of
  * row order, partitioning, or a random seed — so it is reproducible
  * across runs, engines, and re-shards, and a document always lands in
  * the same split even when the corpus around it changes (the property
  * that keeps eval sets uncontaminated as data grows). Never use
  * `rand()`-based splits for corpus curation: they reshuffle on every
  * recompute.
  */
object DatasetSplit {

  val Granularity = 65536 // 16 bits of md5

  /** Stable bucket in [0, 65536) from a content column. */
  def hashBucket(content: Column): Column =
    conv(substring(md5(content), 1, 4), 16, 10).cast("int")

  /** The salted content coin every content-keyed sampling decision shares
    * (stratified sampling, mixture resampling): [[hashBucket]] of
    * `"salt:" + content`. One definition so the bucketing scheme — and
    * its DuckDB-oracle mirror — can never silently diverge per operator;
    * distinct salts decorrelate different decisions on the same doc.
    */
  def saltedBucket(content: Column, salt: String): Column =
    hashBucket(concat(lit(salt + ":"), content))

  /** Deterministic stratified sampling — the domain-mixing step of corpus
    * assembly: keep a content-keyed fraction of each stratum (language,
    * source domain, …). Like [[assign]], membership is a pure function of
    * content, so the sample is reproducible across engines and re-shards
    * and monotone in the fraction (raising a stratum's weight only ADDS
    * documents — incremental corpus rebuilds stay supersets). The salt
    * decorrelates the sampling hash from the split hash: a doc's sample
    * fate is independent of its train/val/test fate.
    */
  def sampleStratified(
      df: DataFrame,
      strataCol: String,
      fractions: Map[String, Double],
      defaultFraction: Double = 1.0,
      contentCol: String = "text",
      salt: String = "sample",
      bucketCol: String = "sample_bucket"): DataFrame = {
    require((fractions.values ++ Seq(defaultFraction)).forall(f => f >= 0 && f <= 1),
      "fractions must be in [0, 1]")
    // fold in sorted order so the compiled when-chain is deterministic
    val frac = fractions.toSeq.sortBy(_._1).foldRight(lit(defaultFraction): Column) {
      case ((k, f), acc) => when(col(strataCol) === k, lit(f)).otherwise(acc)
    }
    df.withColumn(bucketCol, saltedBucket(col(contentCol), salt))
      .filter(col(bucketCol) < frac * Granularity)
  }

  /** Assign a named split by cumulative weight thresholds (scaled to the
    * bucket granularity, floor-rounded; the last split absorbs the
    * remainder). Weights are (name, fraction) in order.
    */
  def assign(
      df: DataFrame,
      contentCol: String,
      weights: Seq[(String, Double)] = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
      bucketCol: String = "bucket",
      splitCol: String = "split"): DataFrame = {
    require(weights.nonEmpty && math.abs(weights.map(_._2).sum - 1.0) < 1e-9,
      "split weights must sum to 1")
    val thresholds = weights.scanLeft(0.0)(_ + _._2).tail
      .map(w => math.floor(w * Granularity).toLong)
    val b = col(bucketCol)
    val expr = weights.init.zip(thresholds.init).foldRight(lit(weights.last._1)) {
      case (((name, _), t), acc) => when(b < t, lit(name)).otherwise(acc)
    }
    df.withColumn(bucketCol, hashBucket(col(contentCol)))
      .withColumn(splitCol, expr)
  }

  /** Deterministic k-per-group sampling — the count-bounded counterpart
    * of [[sampleStratified]]'s fraction-based keep (use this when every
    * stratum must contribute AT MOST k rows — few-shot eval sets,
    * per-domain probes, balanced debugging slices). Rows are ranked
    * inside each group by the salted content hash (+ id tiebreak) and
    * the first k kept, so membership is a pure function of content:
    * reproducible across engines/re-shards, and a group's sample only
    * changes where documents were actually added or removed.
    *
    * Scale note: one shuffle on the group key; the per-group window
    * sorts each group. For RARE pathological groups holding a large
    * corpus fraction, AQE cannot split a window partition — cap such
    * groups upstream ([[graft.ops.Curation.capPerDomain]] note applies).
    */
  def samplePerGroup(
      df: DataFrame,
      k: Int,
      groupCol: String,
      contentCol: String,
      idCol: String = "doc_id",
      salt: String = "psamp"): DataFrame = {
    require(k > 0, "k must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col("graft_rank_bucket"), col(idCol))
    df.withColumn("graft_rank_bucket", saltedBucket(col(contentCol), salt))
      .withColumn("graft_rk", row_number().over(w))
      .filter(col("graft_rk") <= k)
      .drop("graft_rank_bucket", "graft_rk")
  }

  /** Content-keyed k-fold assignment for cross-validation: fold =
    * salted content coin mod k — every row lands in exactly one fold, a
    * pure function of content (reshard/engine reproducible, like
    * [[assign]]), and folds are disjoint and exhaustive by
    * construction. Fold i's train set is simply `fold =!= i`.
    */
  def kFold(
      df: DataFrame,
      k: Int,
      contentCol: String,
      salt: String = "kfold"): DataFrame = {
    require(k >= 2, "k-fold needs k >= 2")
    df.withColumn("fold",
      pmod(saltedBucket(col(contentCol), salt), lit(k)).cast("int"))
  }

  /** Deterministic weighted sampling (priority sampling, Duffield et
    * al.): each row gets priority = weight / u with u the shared salted
    * content coin mapped to (0, 1]; the k largest priorities are the
    * sample, so heavier rows are proportionally likelier while staying a
    * pure function of content. Raising one row's weight can only raise
    * its priority — it never evicts itself — so weight tuning is
    * monotone per row, like the other sampling ops here.
    *
    * Scale shape: `orderBy(..).limit(k)` plans as TakeOrderedAndProject
    * — per-partition top-k then a k-row merge, never a global sort.
    * Priority is one exact-rounded IEEE division of engine-identical
    * inputs, so the selected SET is reproducible across engines (no
    * libm pow/log in the ranking, unlike textbook A-ES — the
    * exponential-variate formulation would risk cross-engine rank flips
    * at ulp distance).
    */
  def sampleWeighted(
      df: DataFrame,
      k: Int,
      weightCol: String,
      contentCol: String,
      idCol: String = "doc_id",
      salt: String = "wsamp"): DataFrame = {
    require(k > 0, "k must be positive")
    val u = (saltedBucket(col(contentCol), salt) + lit(1)).cast("double") /
      lit(Granularity.toDouble)
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("priority", col(weightCol) / u)
      .orderBy(col("priority").desc, col(idCol).asc)
      .limit(k)
  }
}
