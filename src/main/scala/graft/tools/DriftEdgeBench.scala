package graft.tools

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.Quality

/** Measures the drift monitors' documented continuous-column caveat:
  * exact quantile edges (cumulative window over the DISTINCT value
  * domain — collapses to one task when every value is distinct) vs the
  * sketch path (`approxQuantileEdges`, one mergeable GK pass). The
  * events value column is made artificially CONTINUOUS
  * (`value + event_id·1e-9` → every row its own distinct value), so the
  * exact path's window sees the full row count — the worst case the
  * scaladoc warns about — while the gridded original (bounded distinct
  * domain) is measured alongside as the shape the exact path is FOR.
  *
  * Prints one JSON line; findings go to PLANS.md.
  *
  * Usage: SPARK_GRAFT_SF_DIR=… runMain graft.tools.DriftEdgeBench [trials]
  */
object DriftEdgeBench {
  import BenchUtil.{fmt3, median, time}

  def main(args: Array[String]): Unit = {
    val trials = if (args.nonEmpty) args(0).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Verify.rawDriverSession(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")

    val mult = sys.env.getOrElse("SPARK_GRAFT_EDGE_MULT", "100").toLong
    val ev = Tables.events(spark, sfDir)
    val gridded = ev.select(col("value")).persist()
    // every replica gets its own sub-nano offset: rows × mult DISTINCT
    // values, all flowing through the exact path's one-task window
    val continuous = ev
      .crossJoin(spark.range(mult).select(col("id").as("__rep")))
      .select((col("value") +
        (col("event_id") * mult + col("__rep")) * lit(1e-12)).as("value"))
      .persist()
    val nRows = continuous.count()
    gridded.count()
    val nDistinctGrid = gridded.distinct().count()

    def bench(name: String, body: => Seq[Double]): (String, Double) = {
      val ts = (1 to trials).map(_ => time { body: Unit })
      name -> median(ts)
    }
    val results = Seq(
      bench("exact_gridded", Quality.quantileEdges(gridded, "value", 10)),
      bench("exact_continuous", Quality.quantileEdges(continuous, "value", 10)),
      bench("approx_gridded", Quality.approxQuantileEdges(gridded, "value", 10)),
      bench("approx_continuous",
        Quality.approxQuantileEdges(continuous, "value", 10)))

    // rank displacement of the sketch edges vs exact, on the continuous
    // column — the accuracy half of the tradeoff
    val exactE = Quality.quantileEdges(continuous, "value", 10)
    val approxE = Quality.approxQuantileEdges(continuous, "value", 10)
    val maxRankErr = exactE.zip(approxE).map { case (e, a) =>
      math.abs(continuous.filter(col("value") <= a).count() -
        continuous.filter(col("value") <= e).count())
    }.max

    println(
      s"""{"metric":"drift_edge_paths","rows":$nRows,""" +
        s""""distinct_gridded":$nDistinctGrid,"distinct_continuous":$nRows,""" +
        results.map { case (k, v) => s""""$k":${fmt3(v)}""" }.mkString(",") +
        s""","max_rank_err_continuous":$maxRankErr,"sf":"$sfDir"}""")
    spark.stop()
  }
}
