package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention: bucket entities by the period of their FIRST event
  * (the cohort), then measure what fraction of each cohort is still
  * active 1, 2, … periods later — the standard growth-analytics matrix
  * over the reference's event-stream shape.
  *
  * Scale shape: ONE exchange of the event volume, on the entity key, for
  * a single fused aggregate computing both the cohort (`min(ts)`) and
  * the active-week set (`collect_set(week)`) — both map-side combinable,
  * and the set is bounded by weeks-since-signup, not by the entity's
  * event count. Everything downstream (offset explode, matrix counts,
  * broadcast of the tiny per-cohort sizes) runs on ≈ entities ×
  * active-weeks rows, never on events. Periods are `date_trunc("week")`
  * buckets; the offset between two week starts is computed on DATES
  * (`datediff / 7`), which stays exact even when a session timezone with
  * DST transitions makes the physical gap 7d±1h — an epoch-microsecond
  * division would truncate to an off-by-one week there.
  */
object Cohort {

  /** `(cohort_week, week_offset, n_active, cohort_size, retention)` —
    * one row per cohort × offset with at least one active entity.
    * `retention` = n_active / cohort_size (week 0 is 1.0 by
    * construction: every entity is active in its first week).
    */
  def weeklyRetention(
      events: DataFrame,
      entityCol: String,
      tsCol: String): DataFrame = {
    val week = date_trunc("week", col(tsCol))
    // one pass over events: cohort AND active-week set per entity.
    // Persisted because BOTH the matrix and the cohort sizes read it —
    // without the cache the second consumer re-runs the event exchange,
    // which is exactly the cost this operator exists to pay once
    // (ScaleTechniquesSpec pins the exchange count; Verify clears the
    // cache between catalog queries, the documented scoped-persist
    // pattern here).
    val perEntity = events.groupBy(col(entityCol)).agg(
      date_trunc("week", min(col(tsCol))).as("cohort_week"),
      collect_set(week).as("weeks"))
      .persist()
    // perEntity has exactly one row per entity, so count(*) = cohort size
    val sizes = perEntity.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("cohort_size"))
    val matrix = perEntity
      .select(col("cohort_week"), explode(col("weeks")).as("activity_week"))
      .withColumn("week_offset",
        (datediff(to_date(col("activity_week")), to_date(col("cohort_week")))
          / 7).cast("long"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_active"))
    matrix.join(broadcast(sizes), "cohort_week")
      .select(
        col("cohort_week"), col("week_offset"), col("n_active"),
        col("cohort_size"),
        round(col("n_active").cast("double") / col("cohort_size"), 6)
          .as("retention"))
  }

  /** Rolling active entities ("WAU"): for every observed day, the exact
    * count of distinct entities active within the trailing `windowDays`
    * days.
    *
    * Exact distinct over a SLIDING window has no window-function form
    * (`countDistinct` is not a frame aggregate), so the scalable shape
    * is contribution explosion: each distinct (day, entity) row fans
    * out to the `windowDays` target days it contributes to — a map-only
    * ×windowDays expansion of the ALREADY-DEDUPED (day, entity) frame,
    * not of the raw events — and one distinct-count aggregate per
    * target day. Output is restricted to days that actually occur (no
    * fabricated leading/trailing spine).
    */
  def rollingActiveUsers(
      events: DataFrame,
      entityCol: String,
      tsCol: String,
      windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, "windowDays must be >= 1")
    val dayEnt = events
      .select(to_date(col(tsCol)).as("d"), col(entityCol).as("ent"))
      .distinct()
    val contributions = dayEnt
      .select(explode(expr(s"sequence(0, ${windowDays - 1})")).as("i"),
        col("d"), col("ent"))
      .select(date_add(col("d"), col("i")).as("day"), col("ent"))
    val spine = dayEnt.select(col("d").as("day")).distinct()
    contributions.join(spine, "day")
      .groupBy("day")
      .agg(countDistinct(col("ent")).as("active"))
  }
}
