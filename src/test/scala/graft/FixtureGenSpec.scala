package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.fixtures.{FixtureGen, Fixtures}

/** The seeded generator must be deterministic and in sync with the
  * committed fixture files (the oracle SQL reads those by absolute path).
  */
class FixtureGenSpec extends AnyFunSuite {

  private def gen() = {
    val start = java.time.Instant.parse("2024-10-16T22:00:00Z").toEpochMilli
    FixtureGen.generate(
      Seq("DieBonder_01", "DieBonder_02"), start, start + 4L * 3600 * 1000,
      idleGapMs = (5000, 15000), errorRate = 0.02, seed = 42L)
  }

  test("generation is deterministic for a fixed seed") {
    val (a, b) = (gen(), gen())
    assert(a.csvLines == b.csvLines)
    assert(a.clean == b.clean)
  }

  test("committed raw CSV matches regeneration byte-for-byte") {
    val committed = scala.io.Source.fromFile(Fixtures.rawCsv, "UTF-8")
      .getLines().toSeq
    assert(committed == gen().csvLines)
  }

  test("raw CSV = clean rows + header + planted garbage") {
    val g = gen()
    // 2 garbage lines per machine (bad timestamp, empty machine_id) + header
    assert(g.csvLines.size == g.clean.size + 1 + 4)
    assert(g.csvLines.count(_.startsWith("not-a-timestamp")) == 2)
  }

  test("same-ms tie pairs exist (Pick_Check and Place_Check double rows)") {
    val g = gen()
    val tied = g.clean.groupBy(e => (e.machine_id, e.event_timestamp))
      .filter(_._2.size > 1)
    assert(tied.nonEmpty)
    assert(tied.values.forall(_.forall(e =>
      e.event_name == "Pick_Check" || e.event_name == "Place_Check")))
  }
}
