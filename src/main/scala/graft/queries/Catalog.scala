package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared query of the engine's surface.
  *
  * @param name   stable key; prefixed with the SURVEY §2 row(s) it covers
  *               (e.g. `w2_sessionize`) so coverage is auditable.
  * @param run    the Spark-native implementation, over the driver corpus dir.
  * @param oracle equivalent ANSI SQL for DuckDB over the same tables
  *               (None => driver records a weaker rows-only check; used for
  *               ops whose hash functions are not portable to DuckDB).
  *
  * Numeric-parity rules used throughout the catalog (both sides MUST follow
  * them, or the driver's hash compare breaks on floating-point ulps):
  *   - timestamps/dates are emitted as formatted strings, never raw
  *     (`date_format(.., "yyyy-MM-dd HH:mm:ss.SSSSSS")` ↔ duckdb `strftime`);
  *   - durations are integer microseconds (`unix_micros` ↔ `epoch_us`);
  *   - sums of k-decimal data are rounded at exactly k decimals, where the
  *     exact value lies ON the rounding grid and summation-order noise
  *     (~1e-9) cannot reach a rounding boundary;
  *   - averages are expressed `round(sum, k) / count` so both engines divide
  *     bit-identical doubles and produce bit-identical results;
  *   - noisy derived sums that have no safe grid are emitted raw — the
  *     driver's 2/3-dp canonicalization absorbs ulp noise;
  *   - DuckDB type alignment: `CAST(.. AS BIGINT)` on window/conditional
  *     sums (duckdb widens to HUGEINT), `CAST(hour(..) AS INT)` (duckdb
  *     returns BIGINT), so parquet schemas match.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** The ONE copy of the timestamp-rendering parity pair (rule 1 in [[Q]]'s
  * numeric-parity list): microsecond wall-clock strings on both engines.
  * Each query object aliases these; editing a stray local copy can no
  * longer desynchronize one file's queries from the rule.
  */
private[queries] object Fmt {
  val tsSpark = "yyyy-MM-dd HH:mm:ss.SSSSSS"
  val tsDuck  = "%Y-%m-%d %H:%M:%S.%f"
}

object Catalog {
  def all: Seq[Q] =
    CoreQueries.all ++ AnalyticsQueries.all ++ OlapQueries.all ++
      ExtQueries.all ++ PipelineQueries.all
}
