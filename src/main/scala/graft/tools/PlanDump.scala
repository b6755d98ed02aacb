package graft.tools

import graft.SparkEntry

/** Prints `explain("formatted")` for named catalog queries — the tool
  * behind PLANS.md's raw captures. Runs on [[graft.Verify.rawDriverSession]]
  * so the dumped plans are exactly what Verify executes.
  *
  * Usage: `runMain graft.tools.PlanDump <sfDir> <queryName> [more...]`
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val qs = SparkEntry.queries
    if (args.length < 2) {
      System.err.println("usage: PlanDump <sfDir> <queryName> [more...]")
      System.err.println(s"known queries: ${qs.keys.toSeq.sorted.mkString(", ")}")
      sys.exit(2)
    }
    val sfDir = args.head
    val names = args.tail.toSeq
    val unknown = names.filterNot(qs.contains)
    if (unknown.nonEmpty) {
      System.err.println(s"unknown queries: ${unknown.mkString(", ")}")
      System.err.println(s"known queries: ${qs.keys.toSeq.sorted.mkString(", ")}")
      sys.exit(2)
    }
    val spark = graft.Verify.rawDriverSession("4")
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n===== $n =====")
      qs(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
