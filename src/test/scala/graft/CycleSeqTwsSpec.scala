package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.fixtures.{FixtureGen, Fixtures}
import graft.streaming.{CycleSeqTws, CycleTimesTws, StreamingPipeline}

/** transformWithState cycle counter (streaming/CycleSeqTws): the v2
  * arbitrary-state API under the RocksDB provider produces EXACTLY the
  * v1 `withCycleSeq` output on the same multi-micro-batch replay — the
  * two APIs are interchangeable forms of the same operator.
  */
class CycleSeqTwsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Fixture split into two time-ordered files => cycle state must cross
    * a micro-batch boundary (same construction as StreamingSpec). */
  private lazy val streamDir: String = {
    Fixtures.ensure(spark)
    val lines = scala.io.Source.fromFile(Fixtures.rawCsv, "UTF-8").getLines().toSeq
    val (header, rows) = (lines.head, lines.tail)
    val dir = Files.createTempDirectory("graft_tws_stream").toString
    val mid = java.time.Instant.parse("2024-10-17T00:00:00Z").toEpochMilli
    def tsOf(l: String): Long =
      try java.time.Instant.parse(l.takeWhile(_ != ',')).toEpochMilli
      catch { case _: Exception => 0L }
    val (early, late) = rows.partition(tsOf(_) < mid)
    FixtureGen.writeCsv(s"$dir/day1_part1.csv", header +: early)
    FixtureGen.writeCsv(s"$dir/day2_part2.csv", header +: late)
    val base = System.currentTimeMillis()
    new java.io.File(s"$dir/day1_part1.csv").setLastModified(base): Unit
    new java.io.File(s"$dir/day2_part2.csv").setLastModified(base + 60000L): Unit
    dir
  }

  test("transformWithState cycle_seq equals the v1 API across micro-batches") {
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(providerKey)
    // transformWithState REQUIRES RocksDB; scope the provider to this
    // query and restore, so the suite's other streaming tests keep
    // measuring the provider they document
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val clean = StreamingPipeline.cleanse(
        StreamingPipeline.readCsvStream(spark, streamDir, maxFilesPerTrigger = 1))
      val q = CycleSeqTws.withCycleSeq(clean).toDF()
        .writeStream.format("memory").queryName("tws_seq_out")
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      assert(q.recentProgress.count(_.numInputRows > 0) >= 2,
        "state must have crossed a micro-batch boundary")
    } finally prior match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }

    // v1 twin on the same replay, default provider
    val clean1 = StreamingPipeline.cleanse(
      StreamingPipeline.readCsvStream(spark, streamDir, maxFilesPerTrigger = 1))
    val q1 = StreamingPipeline.withCycleSeq(clean1).toDF()
      .writeStream.format("memory").queryName("v1_seq_out")
      .outputMode("append").start()
    try q1.processAllAvailable() finally q1.stop()

    val tws = spark.table("tws_seq_out")
    val v1 = spark.table("v1_seq_out")
    assert(tws.count() == v1.count() && tws.count() > 0)
    assert(v1.exceptAll(tws).count() == 0 && tws.exceptAll(v1).count() == 0,
      "v2 transformWithState output must equal the v1 flatMapGroupsWithState output")
  }

  test("v2 reorder-buffered cycleTimes equals v1 under out-of-order delivery") {
    // cycles arrive out of event-time order ACROSS micro-batches (newer
    // file first) — the case the reorder buffer exists for; a sentinel
    // machine far in the future pushes the watermark so held events
    // release via the timer path as well as the fresh-input path
    def cyc(hhmm: String): Seq[String] = {
      val base = s"2024-10-16T$hhmm"
      Seq(
        s"$base:00.000Z,M1,Cycle_Start,,",
        s"$base:00.100Z,M1,Pick_Check,PP_Force,80.0",
        s"$base:00.500Z,M1,Cycle_End,,")
    }
    val header = "timestamp,machine_id,event_name,parameter_name,value"
    val sentinel = "2024-10-20T00:00:00.000Z,M_FLUSH,Cycle_Start,,"
    val dir = Files.createTempDirectory("graft_tws_reorder").toString
    val base = System.currentTimeMillis()
    Seq(
      header +: cyc("00:10"),
      header +: cyc("00:00"),
      (header +: cyc("00:20")) :+ sentinel
    ).zipWithIndex.foreach { case (lines, i) =>
      FixtureGen.writeCsv(s"$dir/f$i.csv", lines)
      new java.io.File(s"$dir/f$i.csv").setLastModified(base + i * 2000L): Unit
    }

    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val clean = StreamingPipeline.cleanse(
        StreamingPipeline.readCsvStream(spark, dir, maxFilesPerTrigger = 1))
      val q = CycleTimesTws.cycleTimesOrdered(clean, "1 hour").toDF()
        .writeStream.format("memory").queryName("tws_ct_out")
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    } finally prior match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }

    val clean1 = StreamingPipeline.cleanse(
      StreamingPipeline.readCsvStream(spark, dir, maxFilesPerTrigger = 1))
    val q1 = StreamingPipeline.cycleTimesOrdered(clean1, "1 hour").toDF()
      .writeStream.format("memory").queryName("v1_ct_out")
      .outputMode("append").start()
    try q1.processAllAvailable() finally q1.stop()

    val tws = spark.table("tws_ct_out").filter(col("machine_id") === "M1")
    val v1 = spark.table("v1_ct_out").filter(col("machine_id") === "M1")
    // all three out-of-order cycles must close, in the right order
    assert(tws.count() == 3, s"expected 3 closed cycles, got ${tws.count()}")
    assert(v1.exceptAll(tws).count() == 0 && tws.exceptAll(v1).count() == 0,
      "v2 ListState+timer reorder buffer must equal the v1 " +
        "flatMapGroupsWithState reorder buffer on the same replay")
  }
}
