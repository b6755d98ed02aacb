package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.SessionStream

/** Native session_window gap sessionization (streaming/SessionStream):
  * sessions merge across micro-batch boundaries in the state store,
  * append emits each session exactly once after the watermark closes it,
  * stream ≡ batch twin on the finalized keys, and the exactly-at-gap
  * boundary (touching windows merge — same sessions as the w4
  * lag+cumsum composition).
  */
class SessionStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = "ts TIMESTAMP, user_id LONG, event_id LONG"

  /** Three data files + one watermark advancer. User 10's first session
    * SPANS f0/f1 (10:00–10:24 with every gap < 30 min) — the two halves
    * arrive in different micro-batches and must merge in state. f2 then
    * reopens user 10 past the gap and adds user 20. f3's far-future
    * event advances the watermark so every earlier session finalizes.
    */
  private lazy val streamDir: String = {
    val dir = Files.createTempDirectory("graft_session_stream").toString
    def write(name: String, rows: Seq[(String, Long, Long)], mtime: Long): Unit = {
      val f = new java.io.File(dir, name)
      val w = new java.io.PrintWriter(f, "UTF-8")
      try rows.foreach { case (ts, uid, eid) => w.println(s"$ts,$uid,$eid") }
      finally w.close()
      f.setLastModified(mtime): Unit
    }
    val base = System.currentTimeMillis()
    write("f0.csv", Seq(
      ("2024-10-16 10:00:00", 10L, 1L),
      ("2024-10-16 10:12:00", 10L, 2L)), base)
    write("f1.csv", Seq(
      ("2024-10-16 10:24:00", 10L, 3L),   // 12 min after e2: merges into the open session
      ("2024-10-16 10:54:00", 10L, 4L)),  // EXACTLY 30 min after e3: touching windows merge
      base + 60000)
    write("f2.csv", Seq(
      ("2024-10-16 12:00:00", 10L, 5L),   // past gap: third session
      ("2024-10-16 12:05:00", 20L, 6L)),  // second key, concurrent state
      base + 120000)
    write("f3.csv", Seq(
      ("2024-10-17 12:00:00", 99L, 7L)),  // advancer: watermark passes every close above
      base + 180000)
    dir
  }

  test("sessions merge across micro-batches; append emits each once; exactly-at-gap merges") {
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).csv(streamDir)
    val out = SessionStream.gapSessions(stream, "user_id", "ts",
      gap = "30 minutes", watermarkDelay = "10 minutes")
    val q = out.writeStream.format("memory").queryName("session_out")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("session_out")
      .select(col("user_id"), date_format(col("s_ts"), "HH:mm").as("s"),
        date_format(col("e_ts"), "HH:mm").as("e"), col("n_events"),
        col("duration_us"))
      .as[(Long, String, String, Long, Long)].collect().toSet

    // user 10: the 10:00 session spans f0/f1 — state-merged across the
    // batch boundary — AND absorbs e4 at 10:54, which sits EXACTLY 30
    // min after e3 (touching windows merge: coalesce on
    // start <= currentEnd, the same sessions as w4's strict-> test);
    // e5 at 12:00 (66 min later) opens the second. user 99's own session
    // is still open (nothing advanced the watermark past it) and must
    // NOT have been emitted.
    assert(got == Set(
      (10L, "10:00", "10:54", 4L, 54L * 60 * 1000000),
      (10L, "12:00", "12:00", 1L, 0L),
      (20L, "12:05", "12:05", 1L, 0L)))
    assert(q.recentProgress.count(_.numInputRows > 0) >= 4,
      "session state must have crossed micro-batch boundaries")
  }

  test("stream equals the batch twin on finalized keys") {
    // run AFTER the streaming test so the memory table exists
    spark.table("session_out").count()
    val rows = spark.read.schema(schema).csv(streamDir)
    val batch = SessionStream.gapSessionsBatch(rows, "user_id", "ts",
      gap = "30 minutes")
      .filter(col("user_id") =!= 99L) // the advancer's session never closed in the stream
    val stream = spark.table("session_out")
      .select("user_id", "s_ts", "e_ts", "n_events", "duration_us")
    assert(stream.exceptAll(batch).isEmpty && batch.exceptAll(stream).isEmpty,
      "append-mode finalized sessions must equal the batch session_window output")
  }

  test("batch twin equals the w8 catalog expression on the events table") {
    // the catalog query and the streaming twin share the operator; this
    // pins that SessionStream.gapSessionsBatch IS w8_session_window's
    // aggregation (column naming aside), so the DuckDB oracle behind w8
    // transitively checks the streaming operator's session arithmetic
    val sf = "/root/testdata/sf0.001"
    val ev = graft.core.Tables.events(spark, sf)
    val tsFmt = "yyyy-MM-dd HH:mm:ss.SSSSSS" // Fmt.tsSpark (private[queries])
    val twin = SessionStream.gapSessionsBatch(ev, "user_id", "ts", "30 minutes")
      .select(col("user_id"),
        date_format(col("s_ts"), tsFmt).as("session_start"),
        date_format(col("e_ts"), tsFmt).as("session_end"),
        col("n_events"), col("duration_us"))
    val w8 = graft.queries.Catalog.all.find(_.name == "w8_session_window").get
      .run(spark, sf)
    assert(twin.exceptAll(w8).isEmpty && w8.exceptAll(twin).isEmpty,
      "gapSessionsBatch must be the w8_session_window aggregation")
  }
}
