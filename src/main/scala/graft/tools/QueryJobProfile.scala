package graft.tools

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** Optimization-round instrument: attribute one catalog query's wall time
  * to its individual Spark JOBS — count, per-job duration, task count and
  * the call site that launched it — so "this query is slow" becomes
  * "these three jobs are the cost" before anything is changed (guide §1:
  * measure first). Usage:
  *
  *   sbt "runMain graft.tools.QueryJobProfile ext_ingest_loop ext_semdedup"
  *
  * Each named query runs once untimed (JIT/IO warm-up), then once under a
  * job listener; per-job rows print largest-first. The gap between the
  * summed job time and the query wall time is driver-side work (planning,
  * collect post-processing, file listing).
  */
object QueryJobProfile {

  private final case class JobRow(
      jobId: Int, started: Long, var ended: Long = -1L,
      site: String = "", tasks: Int = 0, stages: Int = 0)

  def main(args: Array[String]): Unit = {
    val spark = BenchUtil.scaleSession()
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val jobs = new ConcurrentHashMap[Int, JobRow]()
    val stages = java.util.concurrent.ConcurrentHashMap.newKeySet[(Long, Int, String)]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short")))
          .filter(_.nonEmpty)
          .orElse(js.stageInfos.lastOption.map(_.name.takeWhile(_ != '\n')))
          .getOrElse("")
        jobs.put(js.jobId, JobRow(js.jobId, js.time, site = site,
          tasks = js.stageInfos.map(_.numTasks).sum,
          stages = js.stageInfos.size))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val r = jobs.get(je.jobId)
        if (r != null) r.ended = je.time
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = (for {a <- si.completionTime; b <- si.submissionTime}
          yield a - b).getOrElse(-1L)
        stages.add((dur, si.numTasks, si.name.takeWhile(_ != '\n')))
        ()
      }
    }
    args.foreach { name =>
      graft.queries.Catalog.all.find(_.name == name) match {
        case None => System.err.println(s"[profile] no such query: $name")
        case Some(q) =>
          BenchUtil.force(q.run(spark, dir)) // warm-up, untimed
          spark.sharedState.cacheManager.clearCache()
          jobs.clear()
          stages.clear()
          spark.sparkContext.addSparkListener(listener)
          val wall = BenchUtil.time(BenchUtil.force(q.run(spark, dir)))
          // listener delivery is async; give the bus a moment to drain
          Thread.sleep(300)
          spark.sparkContext.removeSparkListener(listener)
          spark.sharedState.cacheManager.clearCache()
          import scala.jdk.CollectionConverters._
          val rows = jobs.values.asScala.toSeq.sortBy(r => -(r.ended - r.started))
          val summed = rows.filter(_.ended > 0).map(r => r.ended - r.started).sum
          println(f"%n[profile] $name wall=${wall}%.3f s jobs=${rows.size} " +
            f"job_sum=${summed / 1000.0}%.3f s driver_gap=${wall - summed / 1000.0}%.3f s")
          rows.take(15).foreach { r =>
            val d = if (r.ended > 0) (r.ended - r.started) / 1000.0 else -1.0
            println(f"[profile]   ${d}%7.3f s  tasks=${r.tasks}%4d stages=${r.stages}%2d  ${r.site}")
          }
          import scala.jdk.CollectionConverters._
          val st = stages.asScala.toSeq.sortBy(-_._1)
          println(f"[profile]  -- stages: n=${st.size} task_total=${st.map(_._2).sum} --")
          st.take(30).foreach { case (d, n, nm) =>
            println(f"[profile]   stage ${d / 1000.0}%7.3f s tasks=$n%4d  $nm")
          }
      }
    }
    spark.stop()
  }
}
