package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.Rules
import graft.pipeline.DailyAggregatorMain

/** CLI argument/env validation parity (`daily_aggregator.py:292-301`). */
class CliSpec extends AnyFunSuite {

  test("filename validation: no path separators, .csv suffix required") {
    assert(DailyAggregatorMain.validateFilename("day.csv").isRight)
    assert(DailyAggregatorMain.validateFilename("../day.csv").isLeft)
    assert(DailyAggregatorMain.validateFilename("dir/day.csv").isLeft)
    assert(DailyAggregatorMain.validateFilename("""dir\day.csv""").isLeft)
    assert(DailyAggregatorMain.validateFilename("day.txt").isLeft)
  }

  test("required env reported by name when missing") {
    val r = DailyAggregatorMain.requiredEnv(
      Map("DB_HOST" -> "h"), Seq("DB_HOST", "DB_NAME", "DB_USER", "DB_PASS"))
    assert(r == Left("missing required environment: DB_NAME, DB_USER, DB_PASS"))
    assert(DailyAggregatorMain.requiredEnv(
      Map("A" -> "1"), Seq("A")).isRight)
  }

  test("shipped config/rules.json parses to the six reference rules") {
    assert(Rules.loadFileOrEmpty("/root/repo/config/rules.json").toSet ==
      Rules.referenceDefaults.toSet)
  }
}
