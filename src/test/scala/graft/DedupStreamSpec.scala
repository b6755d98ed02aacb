package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.DedupStream

/** Streaming exact dedup (streaming/DedupStream): first-arrival-wins
  * within the watermark horizon, state evicted beyond it, stream ≡
  * batch twin when every duplicate pair lies inside the horizon, and
  * the documented re-admission beyond it.
  */
class DedupStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = "ts TIMESTAMP, doc_id LONG, text STRING"

  /** Four files: f0 has originals, f1 repeats two of them (within the
    * horizon) plus one new doc, f2 advances the watermark past the
    * originals' expiry (state evicted), f3 repeats an f0 text after the
    * eviction — re-admitted. (Eviction is driven by the WATERMARK, which
    * only advances at the end of a batch — a duplicate must arrive a
    * batch AFTER the advancer to see the evicted state.)
    */
  private lazy val streamDir: String = {
    val dir = Files.createTempDirectory("graft_dedup_stream").toString
    def write(name: String, rows: Seq[(String, Long, String)], mtime: Long): Unit = {
      val f = new java.io.File(dir, name)
      val w = new java.io.PrintWriter(f, "UTF-8")
      try rows.foreach { case (ts, id, t) => w.println(s"$ts,$id,$t") }
      finally w.close()
      f.setLastModified(mtime): Unit
    }
    val base = System.currentTimeMillis()
    write("f0.csv", Seq(
      ("2024-10-16 10:00:00", 1L, "alpha"),
      ("2024-10-16 10:01:00", 2L, "beta"),
      ("2024-10-16 10:02:00", 3L, "gamma")), base)
    write("f1.csv", Seq(
      ("2024-10-16 10:10:00", 4L, "alpha"),   // dup within horizon -> dropped
      ("2024-10-16 10:11:00", 5L, "beta"),    // dup within horizon -> dropped
      ("2024-10-16 10:12:00", 6L, "delta")),  // new
      base + 60000)
    write("f2.csv", Seq(
      ("2024-10-16 12:00:00", 7L, "epsilon")), // watermark -> 11:30 > expiry
      base + 120000)
    // eviction at the end of batch N uses the watermark computed at its
    // START (one batch of lag), so a second advancer batch must pass
    // before the evicted key is really gone from the store
    write("f3.csv", Seq(
      ("2024-10-16 12:30:00", 8L, "zeta")),
      base + 180000)
    write("f4.csv", Seq(
      ("2024-10-16 14:00:00", 9L, "alpha")),  // state evicted -> readmitted
      base + 240000)
    dir
  }

  test("first arrival wins within the horizon; state evicts beyond it") {
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).csv(streamDir)
    val out = DedupStream.dedupExact(stream, "ts", "text",
      watermarkDelay = "30 minutes")
    val q = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val kept = spark.table("dedup_out").select("doc_id").as[Long].collect().toSet
    // originals + new docs survive; in-horizon dups 4/5 drop; alpha's
    // state was evicted after the watermark advanced past its expiry, so
    // the far-future alpha (9) is a NEW doc to the bounded-state stage —
    // the documented re-admission the nightly batch dedup backstops
    assert(kept == Set(1L, 2L, 3L, 6L, 7L, 8L, 9L))
    assert(q.recentProgress.count(_.numInputRows > 0) >= 5,
      "dedup state must have crossed micro-batch boundaries")
  }

  test("stream equals the batch twin when all duplicates lie in the horizon") {
    // only f0+f1 (every dup pair is 10 minutes apart, horizon 30m)
    val dir = Files.createTempDirectory("graft_dedup_stream_b").toString
    val base = System.currentTimeMillis()
    Seq("f0.csv", "f1.csv").zipWithIndex.foreach { case (f, i) =>
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$streamDir/$f"),
        java.nio.file.Paths.get(s"$dir/$f"))
      // copy does not carry the source's pinned mtime: re-pin strictly
      // increasing stamps or the file source may replay f1 before f0
      // (the StreamingSpec tie-break rule)
      new java.io.File(s"$dir/$f").setLastModified(base + i * 60000L): Unit
    }
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).csv(dir)
    val out = DedupStream.dedupExact(stream, "ts", "text", "30 minutes")
    val q = out.writeStream.format("memory").queryName("dedup_b_out")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("dedup_b_out")
      .select("doc_id").as[Long].collect().toSet
    val batch = DedupStream.dedupExactBatch(
        spark.read.schema(schema).csv(dir), "ts", "text", tieCol = "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(streamed == batch)
    assert(streamed == Set(1L, 2L, 3L, 6L))
  }

  test("batch twin: deterministic first-arrival under timestamp ties") {
    val df = Seq(
      ("2024-10-16 10:00:00", 9L, "x"),
      ("2024-10-16 10:00:00", 8L, "x"),   // same ts -> lower doc_id wins
      ("2024-10-16 10:00:01", 7L, "x")
    ).toDF("ts", "doc_id", "text")
      .withColumn("ts", col("ts").cast("timestamp"))
    val kept = DedupStream.dedupExactBatch(df, "ts", "text", "doc_id")
      .select("doc_id").as[Long].collect().toList
    assert(kept == List(8L))
  }
}
