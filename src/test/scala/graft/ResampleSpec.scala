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

  /** Driver-side reference: pandas adjust=True EWMA over the last
    * `window` non-null observations.
    */
  private def refEwma(xs: Seq[Double], decay: Double, window: Int): Seq[Double] =
    xs.indices.map { t =>
      val tail = xs.slice(math.max(0, t - window + 1), t + 1).reverse
      val num = tail.zipWithIndex.map { case (x, j) => x * math.pow(decay, j) }.sum
      val den = tail.indices.map(j => math.pow(decay, j)).sum
      num / den
    }

  test("ewma: matches the closed-form adjust=True kernel, per key, in order") {
    val xs = Seq(10.0, 0.0, 6.0, 2.0, 8.0, 4.0)
    val rows = xs.zipWithIndex.map { case (x, i) =>
      (1L, i.toLong, ts(f"2024-01-01 10:0$i:00"), x) } ++
      Seq((2L, 99L, ts("2024-01-01 10:00:00"), 42.0)) // other key untouched
    val got = Resample.ewma(rows.toDF("user_id", "event_id", "t", "value"),
      keys = Seq("user_id"), orderCols = Seq("t", "event_id"),
      valueCol = "value", decay = 0.5, window = 50)
      .select("user_id", "event_id", "ewma")
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val exp = refEwma(xs, 0.5, 50)
    xs.indices.foreach { i =>
      assert(math.abs(got((1L, i.toLong)) - exp(i)) < 1e-12,
        s"row $i: ${got((1L, i.toLong))} vs ${exp(i)}")
    }
    // first observation is itself; a single-row key is itself
    assert(got((1L, 0L)) == 10.0 && got((2L, 99L)) == 42.0)
  }

  test("ewma: window truncation drops old observations; nulls are skipped") {
    // window=2: ewma_t = (x_t + 0.5 x_{t-1}) / 1.5 — x_{t-2} must not leak
    val rows = Seq(
      (1L, 0L, ts("2024-01-01 10:00:00"), Some(100.0)),
      (1L, 1L, ts("2024-01-01 10:01:00"), Some(3.0)),
      (1L, 2L, ts("2024-01-01 10:02:00"), Some(6.0)),
      (1L, 3L, ts("2024-01-01 10:03:00"), None), // skipped, not zero
      (1L, 4L, ts("2024-01-01 10:04:00"), Some(9.0)))
      .toDF("user_id", "event_id", "t", "value")
    val got = Resample.ewma(rows, keys = Seq("user_id"),
      orderCols = Seq("t", "event_id"), valueCol = "value",
      decay = 0.5, window = 2)
      .select("event_id", "ewma").as[(Long, Double)].collect().toMap
    assert(math.abs(got(2L) - (6.0 + 0.5 * 3.0) / 1.5) < 1e-12, "100 must not leak")
    // null row: frame is {6.0, null} -> list [6.0] -> ewma = 6.0
    assert(got(3L) == 6.0)
    // after the null: frame {null, 9.0} -> [9.0] -> 9.0
    assert(got(4L) == 9.0)
  }
}
