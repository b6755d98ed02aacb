package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver's smoke check: entry() on sf0.001 must return rows. */
class EntrySpec extends AnyFunSuite {
  test("entry flagship query returns rows on sf0.001") {
    val df = SparkEntry.entry(TestSpark.spark)
    assert(df.count() > 0)
    assert(df.columns.toSeq ==
      Seq("l_returnflag", "l_linestatus", "sum_qty", "sum_base_price", "count_order"))
  }

  test("every catalog query name is unique and every oracle key has a query") {
    val names = graft.queries.Catalog.all.map(_.name)
    assert(names.distinct.size == names.size, "duplicate query names")
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.queries.size == names.size)
  }
}
