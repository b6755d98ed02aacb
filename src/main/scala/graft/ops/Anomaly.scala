package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-group z-score outlier flagging: standardize each row's value
  * against its group's mean/population-stddev and flag |z| > threshold —
  * the first-line anomaly screen over the reference's event stream (and
  * the quality-outlier gate a training-data pipeline runs on numeric
  * telemetry like lengths or loss values).
  *
  * Numeric determinism: the moments are derived from `round(sum, 2)` and
  * `round(sum(v²), 4)` — both sums sit on the input's decimal grid, so
  * rounding recovers the exact value regardless of summation order, and
  * every downstream quantity (mean = s1/n, var = s2/n − mean²,
  * sd = √var) is a fixed chain of IEEE ops on bit-identical inputs.
  * Welford-style `stddev_pop` would differ across engines in ulps;
  * this formulation cannot.
  *
  * Scale shape: one map-side-combinable aggregate to a tiny per-group
  * stats frame, broadcast back onto the stream — no window over the
  * event volume, no second shuffle. `greatest(var, 0)` guards the
  * catastrophic-cancellation corner (a constant group's variance
  * computing to −1e−18 and poisoning the sqrt).
  */
object Anomaly {

  def zscoreFlags(
      events: DataFrame,
      keys: Seq[String],
      valueCol: String,
      threshold: Double = 3.0): DataFrame = {
    val kc = keys.map(col)
    val stats = events.groupBy(kc: _*).agg(
      count(lit(1)).as("n"),
      round(sum(col(valueCol)), 2).as("__s1"),
      round(sum(col(valueCol) * col(valueCol)), 4).as("__s2"))
      .withColumn("mean_v", col("__s1") / col("n"))
      .withColumn("sd_v",
        sqrt(greatest(col("__s2") / col("n") - col("mean_v") * col("mean_v"), lit(0.0))))
      .drop("__s1", "__s2")
    val z = (col(valueCol) - col("mean_v")) / col("sd_v")
    // sd = 0 (constant group) leaves z undefined (NaN) and flags nothing
    // — guarded explicitly because Spark orders NaN ABOVE every value,
    // so a bare abs(z) > threshold would flag the whole constant group
    events.join(broadcast(stats), keys)
      .withColumn("z", round(z, 6))
      .withColumn("is_outlier",
        (col("sd_v") > 0 && abs(z) > threshold).cast("int"))
  }
}
