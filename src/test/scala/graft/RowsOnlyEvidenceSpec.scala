package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Catalog
import graft.tools.RowsOnlyEvidence

/** Keeps `ROWSONLY_EVIDENCE.json` honest: the registry must cover exactly
  * the catalog queries that have no DuckDB oracle, every named pinning
  * assertion must exist verbatim in the named suite's source (a renamed
  * test breaks this, not silently orphans the evidence), that test must
  * actually call `record(query)`, and every trust chain must terminate at
  * an oracle-checked query. With these pins, `CORRECTNESS_r{N}.json` +
  * `ROWSONLY_EVIDENCE.json` together account for the whole catalog.
  */
class RowsOnlyEvidenceSpec extends AnyFunSuite {

  private def suiteSource(suite: String): String = {
    val simple = suite.stripPrefix("graft.")
    val f = new java.io.File(s"src/test/scala/graft/$simple.scala")
    assert(f.exists(), s"registry names suite $suite but $f does not exist")
    val src = scala.io.Source.fromFile(f, "UTF-8")
    try src.mkString finally src.close()
  }

  test("registry covers exactly the catalog's no-oracle queries") {
    val noOracle = Catalog.all.filter(_.oracle.isEmpty).map(_.name).toSet
    val registered = RowsOnlyEvidence.registry.map(_.query).toSet
    assert(registered == noOracle,
      s"registry drift — missing: ${(noOracle -- registered).toSeq.sorted}, " +
        s"stale: ${(registered -- noOracle).toSeq.sorted}")
    assert(RowsOnlyEvidence.registry.size == registered.size,
      "duplicate registry entries")
  }

  test("every pinning assertion exists in its suite and records its query") {
    RowsOnlyEvidence.registry.foreach { e =>
      val src = suiteSource(e.suite)
      assert(src.contains("test(\"" + e.assertion + "\")"),
        s"${e.suite} no longer declares test(\"${e.assertion}\") — " +
          s"update RowsOnlyEvidence.registry for ${e.query}")
      assert(src.contains("RowsOnlyEvidence.record(\"" + e.query + "\")"),
        s"${e.suite} never records ${e.query} — the evidence file would " +
          "report not-run even when the pin passes")
    }
  }

  test("every trust chain terminates at an oracle-checked catalog query") {
    val byName = Catalog.all.map(q => q.name -> q).toMap
    val registered = RowsOnlyEvidence.registry.map(_.query).toSet
    RowsOnlyEvidence.registry.foreach { e =>
      e.chainsTo.foreach { c =>
        assert(byName.contains(c), s"${e.query} chains to unknown query $c")
      }
      e.chainsTo.lastOption.foreach { last =>
        assert(byName(last).oracle.isDefined,
          s"${e.query}'s chain ends at $last, which is not oracle-checked")
      }
      // intermediate links must themselves be evidence-registered
      e.chainsTo.dropRight(1).foreach { mid =>
        assert(registered.contains(mid) || byName(mid).oracle.isDefined,
          s"${e.query} chains through $mid, which is neither oracle-checked " +
            "nor evidence-registered")
      }
      if (e.chainsTo.isEmpty)
        assert(e.invariant.startsWith("closed-form"),
          s"${e.query} has no chain target — its invariant must declare a " +
            "closed-form in-spec oracle")
    }
  }
}
