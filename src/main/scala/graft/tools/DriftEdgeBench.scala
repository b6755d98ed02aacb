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

    // measured, not asserted: very large SPARK_GRAFT_EDGE_MULT offsets
    // can reach the value grid's 0.01 spacing and collide
    val nDistinctCont = continuous.distinct().count()

    // ReferenceShapeBench methodology: one DISCARDED warm-up of every
    // path, then the timed trials INTERLEAVE round-robin so neither
    // path systematically benefits from running later in a warm JVM.
    val paths: Seq[(String, () => Seq[Double])] = Seq(
      ("exact_gridded", () => Quality.quantileEdges(gridded, "value", 10)),
      ("exact_continuous", () => Quality.quantileEdges(continuous, "value", 10)),
      ("approx_gridded", () => Quality.approxQuantileEdges(gridded, "value", 10)),
      ("approx_continuous",
        () => Quality.approxQuantileEdges(continuous, "value", 10)))
    paths.foreach { case (_, body) => body(): Unit } // warm-up, discarded
    val timed = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    (1 to trials).foreach { _ =>
      paths.foreach { case (name, body) =>
        timed(name) = timed(name) :+ time { body(): Unit }
      }
    }
    val results = paths.map { case (name, _) => name -> median(timed(name)) }

    // rank displacement of the sketch edges vs exact, on the continuous
    // column — the accuracy half of the tradeoff. Edges reused from one
    // fresh run each; all 2·(bins-1) rank lookups ride ONE aggregate.
    val exactE = Quality.quantileEdges(continuous, "value", 10)
    val approxE = Quality.approxQuantileEdges(continuous, "value", 10)
    val rankAggs = (exactE ++ approxE).zipWithIndex.map { case (e, i) =>
      sum(when(col("value") <= e, 1L).otherwise(0L)).as(s"r$i")
    }
    val rk = continuous.agg(rankAggs.head, rankAggs.tail: _*).head()
    val maxRankErr = exactE.indices.map(i =>
      math.abs(rk.getLong(i) - rk.getLong(i + exactE.size))).max

    println(
      s"""{"metric":"drift_edge_paths","rows":$nRows,""" +
        s""""distinct_gridded":$nDistinctGrid,"distinct_continuous":$nDistinctCont,""" +
        results.map { case (k, v) => s""""$k":${fmt3(v)}""" }.mkString(",") +
        s""","max_rank_err_continuous":$maxRankErr,"sf":"$sfDir"}""")
    spark.stop()
  }
}
