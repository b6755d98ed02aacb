package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.CycleDetection

/** Cycle-detection edge cases per SURVEY §7.4 / `daily_aggregator.py:32-67`. */
class CycleDetectionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(ms: Long) = new Timestamp(1729036800000L + ms) // 2024-10-16T00:00Z

  private def events(rows: (Long, String, String)*) =
    rows.toSeq.map { case (ms, m, e) => (ts(ms), m, e) }
      .toDF("event_timestamp", "machine_id", "event_name")

  test("events before the first Cycle_Start keep cycle_seq = 0") {
    val df = events(
      (0L, "M1", "AS_Check"), (10L, "M1", "Pick_Check"),
      (20L, "M1", "Cycle_Start"), (30L, "M1", "Cycle_End"))
    val (withSeq, _) = CycleDetection.detect(df)
    val seqs = withSeq.orderBy("event_timestamp")
      .select("cycle_seq").as[Long].collect().toSeq
    assert(seqs == Seq(0L, 0L, 1L, 1L))
  }

  test("pre-first-start rows get NULL cycle_time downstream (no cycle 0 row)") {
    val df = events(
      (0L, "M1", "AS_Check"),
      (20L, "M1", "Cycle_Start"), (30L, "M1", "Cycle_End"))
    val (_, cycles) = CycleDetection.detect(df)
    assert(cycles.filter($"cycle_seq" === 0).count() == 0)
  }

  test("missing trailing Cycle_End collapses boundaries to the Start row: duration 0.0") {
    val df = events(
      (0L, "M1", "Cycle_Start"), (600L, "M1", "Cycle_End"),
      (1000L, "M1", "Cycle_Start"), (1100L, "M1", "AS_Check"))
    val (_, cycles) = CycleDetection.detect(df)
    val byCycle = cycles.orderBy("cycle_seq")
      .select("cycle_time_seconds").as[Option[Float]].collect().toSeq
    // epoch-seconds double diff carries ~1e-7 representation noise (the
    // reference's exact semantics; rounded to 3dp only at the sink)
    assert(byCycle.map(_.isDefined) == Seq(true, true))
    assert(math.abs(byCycle(0).get - 0.6f) < 1e-4)
    assert(byCycle(1).get == 0.0f)
  }

  test("cycle counters are independent per machine") {
    val df = events(
      (0L, "M1", "Cycle_Start"), (600L, "M1", "Cycle_End"),
      (0L, "M2", "Cycle_Start"), (500L, "M2", "Cycle_End"),
      (1000L, "M2", "Cycle_Start"), (1500L, "M2", "Cycle_End"))
    val (_, cycles) = CycleDetection.detect(df)
    val counts = cycles.groupBy("machine_id").count()
      .as[(String, Long)].collect().toMap
    assert(counts == Map("M1" -> 1L, "M2" -> 2L))
  }

  test("same-timestamp non-start ties get the same cycle_seq regardless of order") {
    val df = events(
      (0L, "M1", "Cycle_Start"),
      (100L, "M1", "Pick_Check"), (100L, "M1", "Pick_Check"),
      (200L, "M1", "Cycle_End"))
    val (withSeq, _) = CycleDetection.detect(df)
    val tied = withSeq.filter($"event_name" === "Pick_Check")
      .select("cycle_seq").as[Long].collect().toSeq
    assert(tied == Seq(1L, 1L))
  }

  test("scalable two-phase prefix sum matches the single-window form") {
    Fxt.ensure(spark)
    val clean = spark.read.parquet(graft.fixtures.Fixtures.cleanParquet)
    val single = CycleDetection.sessionizeByMarker(
      clean, Seq("machine_id"),
      Seq(col("event_timestamp"), col("parameter_name")),
      col("event_name") === "Cycle_Start")
    val scalable = CycleDetection.sessionizeByMarkerScalable(
      clean, Seq("machine_id"),
      Seq(col("event_timestamp"), col("parameter_name")),
      col("event_name") === "Cycle_Start",
      bucketCol = floor(unix_micros(col("event_timestamp")) / lit(600L * 1000000)))
    // compare as multisets of full rows
    assert(single.exceptAll(scalable).count() == 0)
    assert(scalable.exceptAll(single).count() == 0)
    assert(single.count() == clean.count())
  }

  test("detect(scalable = true) ≡ detect(scalable = false), events and cycle times") {
    // The round-9 default switch rides on this: detect() adds a
    // partition-dependent tie-breaker uid BEFORE sessionizing, so the pin
    // must hold at the detect() level too — the uid orders only
    // same-timestamp non-marker rows, whose cycle_seq is tie-independent,
    // and a marker can never change buckets (bucket is a pure function of
    // its timestamp). Both outputs compared as multisets of full rows.
    Fxt.ensure(spark)
    val clean = spark.read.parquet(graft.fixtures.Fixtures.cleanParquet)
    val (evScalable, ctScalable) = CycleDetection.detect(clean, scalable = true)
    val (evSingle, ctSingle) = CycleDetection.detect(clean, scalable = false)
    assert(evSingle.exceptAll(evScalable).count() == 0)
    assert(evScalable.exceptAll(evSingle).count() == 0)
    assert(ctSingle.exceptAll(ctScalable).count() == 0)
    assert(ctScalable.exceptAll(ctSingle).count() == 0)
    assert(evScalable.count() == clean.count())
  }
}

/** Fixture bootstrap shared by suites. */
object Fxt {
  def ensure(spark: org.apache.spark.sql.SparkSession): Unit =
    graft.fixtures.Fixtures.ensure(spark)
}
