package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Prints `explain("formatted")` for named catalog queries — the tool
  * behind PLANS.md's raw captures.
  *
  * Usage: `runMain graft.tools.PlanDump <sfDir> <queryName> [more...]`
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = SparkEntry.queries
    names.foreach { n =>
      println(s"\n===== $n =====")
      qs(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
