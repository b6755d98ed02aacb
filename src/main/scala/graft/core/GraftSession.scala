package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session factory for the engine.
  *
  * Mirrors the reference's session config (`src/daily_aggregator.py:125-129`:
  * UTC session timezone) and adds the settings a 100 TB deployment needs from
  * day one: AQE (runtime re-planning, skew-join splitting, partition
  * coalescing) and a shuffle-partition count sized to the local test harness
  * (on a real cluster this is `2-3 x total cores` and AQE coalesces down).
  */
object GraftSession {

  def local(cores: Int = 32, appName: String = "graft"): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.session.timeZone", "UTC")
      // Reference parity: PySpark 3.5 pre-ANSI semantics — failed casts
      // and to_timestamp parses yield NULL (the cleanse stage depends on
      // it); Spark 4 flipped the default to true.
      .config("spark.sql.ansi.enabled", "false")
      // The corpus events table stores TIMESTAMP(NANOS) parquet, which
      // Spark has no native type for; read the raw int64 and floor to
      // microseconds in Tables.events (matching DuckDB's ns→µs truncation).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}

/** Loaders for the driver-supplied parquet corpus (TESTDATA.md).
  *
  * All reads are plain `spark.read.parquet` so Catalyst gets native
  * filter pushdown and column pruning against the parquet footers — at
  * 100 TB the scan is the dominant cost and must prune both columns and
  * row groups.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS): with
    * `spark.sql.legacy.parquet.nanosAsLong=true` it scans as int64 nanos;
    * floor-divide to micros (exactly DuckDB's truncation) and restore
    * TimestampType.
    */
  private def fixNanos(df: DataFrame, c: String): DataFrame =
    if (df.schema(c).dataType == org.apache.spark.sql.types.LongType)
      df.withColumn(c, org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr(s"$c div 1000")))
    else df

  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def events(s: SparkSession, d: String): DataFrame     = fixNanos(load(s, d, "events"), "ts")
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
