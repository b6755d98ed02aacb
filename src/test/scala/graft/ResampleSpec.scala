package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{CycleDetection, Resample}

/** Gap sessionization and resample+ffill semantics on hand-built data. */
class ResampleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("sessionizeByGap: new session at first event and after gaps > timeout") {
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00")),
      (1L, 2L, ts("2024-01-01 10:10:00")), // 10 min: same session
      (1L, 3L, ts("2024-01-01 11:00:00")), // 50 min: new session
      (2L, 4L, ts("2024-01-01 10:00:00")))
      .toDF("user_id", "event_id", "t")
    val got = CycleDetection.sessionizeByGap(ev, Seq("user_id"), "t",
      gapSeconds = 1800L, orderTiebreak = Seq(col("event_id").asc))
      .select("event_id", "session_seq").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
  }

  test("sessionizeByGap: gap exactly equal to the timeout does NOT break the session") {
    val ev = Seq((1L, 1L, ts("2024-01-01 10:00:00")), (1L, 2L, ts("2024-01-01 10:30:00")))
      .toDF("user_id", "event_id", "t")
    val got = CycleDetection.sessionizeByGap(ev, Seq("user_id"), "t", gapSeconds = 1800L)
      .select("session_seq").as[Long].collect().toSet
    assert(got == Set(1L))
  }

  test("resampleFfill densifies the grid, zero-counts gaps, carries values forward") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:15:00"), 2.0),
      (1L, ts("2024-01-01 10:45:00"), 3.0),
      // 11:00 missing entirely
      (1L, ts("2024-01-01 12:05:00"), 7.0))
      .toDF("user_id", "t", "value")
    val got = Resample.resampleFfill(ev, Seq("user_id"), "t",
      aggs = Seq("rev" -> round(sum("value"), 2)))
      .select("bucket", "n_rows", "is_gap", "rev", "rev_ffill")
      .as[(Timestamp, Long, Int, Option[Double], Double)].collect()
      .map(r => r._1.toString -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got.size == 3) // 10:00, 11:00, 12:00 — dense
    assert(got("2024-01-01 10:00:00.0") == ((2L, 0, Some(5.0), 5.0)))
    assert(got("2024-01-01 11:00:00.0") == ((0L, 1, None, 5.0))) // gap, ffilled
    assert(got("2024-01-01 12:00:00.0") == ((1L, 0, Some(7.0), 7.0)))
  }
}
