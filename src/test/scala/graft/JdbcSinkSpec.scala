package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.fixtures.Fixtures
import graft.io.JdbcSinks
import graft.model.Rules
import graft.pipeline.DailyAggregatorJob

/** JDBC sinks against embedded Derby: append, true upsert (idempotent
  * re-runs), and the dashboard JDBC read path (S5).
  */
class JdbcSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"

  private def withConn[A](f: java.sql.Connection => A): A = {
    val c = java.sql.DriverManager.getConnection(url)
    try f(c) finally c.close()
  }

  private lazy val summary = {
    Fixtures.ensure(spark)
    val out = DailyAggregatorJob.run(spark, Fixtures.rawCsv, Rules.referenceDefaults)
    out.hourlySummary.cache()
  }

  private def createTable(name: String): Unit = withConn { c =>
    val st = c.createStatement()
    try st.execute(
      s"""CREATE TABLE $name (
         |  summary_date DATE NOT NULL,
         |  hour_of_day INT NOT NULL,
         |  machine_id VARCHAR(50) NOT NULL,
         |  avg_pick_force DOUBLE, max_pick_force FLOAT, min_pick_force FLOAT,
         |  avg_place_force DOUBLE, max_place_force FLOAT, min_place_force FLOAT,
         |  as_vacuum_error_count BIGINT, pp_vacuum_error_count BIGINT,
         |  as_release_error_count BIGINT, pp_release_error_count BIGINT,
         |  pick_force_error_count BIGINT, place_force_error_count BIGINT,
         |  cycle_count BIGINT,
         |  min_cycle_time_seconds FLOAT, max_cycle_time_seconds FLOAT,
         |  avg_cycle_time_seconds DOUBLE,
         |  PRIMARY KEY (summary_date, hour_of_day, machine_id))""".stripMargin)
    finally st.close()
  }

  test("append sink writes all rows; re-append violates the PK (reference behavior)") {
    createTable("summary_append")
    JdbcSinks.append(summary, url, "summary_append")
    assert(JdbcSinks.read(spark, url, "summary_append").count() == summary.count())
    // the reference swallows exactly this failure and skips the write
    intercept[Exception] { JdbcSinks.append(summary, url, "summary_append") }
    assert(JdbcSinks.read(spark, url, "summary_append").count() == summary.count())
  }

  test("upsert is idempotent and updates changed rows in place") {
    createTable("summary_upsert")
    val keys = Seq("summary_date", "hour_of_day", "machine_id")
    JdbcSinks.upsert(summary, url, "summary_upsert", keys, JdbcSinks.UpdateInsertUpsert)
    val n = summary.count()
    assert(JdbcSinks.read(spark, url, "summary_upsert").count() == n)
    // re-run: same rows, no growth, no exception
    JdbcSinks.upsert(summary, url, "summary_upsert", keys, JdbcSinks.UpdateInsertUpsert)
    assert(JdbcSinks.read(spark, url, "summary_upsert").count() == n)
    // changed metric wins on conflict
    val bumped = summary.withColumn("cycle_count", col("cycle_count") + 1000L)
    JdbcSinks.upsert(bumped, url, "summary_upsert", keys, JdbcSinks.UpdateInsertUpsert)
    val total = JdbcSinks.read(spark, url, "summary_upsert")
      .agg(sum("cycle_count")).as[Long].collect().head
    val want = summary.agg(sum("cycle_count")).as[Long].collect().head + 1000L * n
    assert(total == want)
  }

  test("dashboard reads over JDBC: distinct dates DESC and one day's load (S5/A7/O1/P13)") {
    createTable("summary_dash")
    JdbcSinks.upsert(summary, url, "summary_dash",
      Seq("summary_date", "hour_of_day", "machine_id"), JdbcSinks.UpdateInsertUpsert)
    val t = JdbcSinks.read(spark, url, "summary_dash")
    val dates = t.select("summary_date").distinct()
      .orderBy(desc("summary_date"))
      .select(date_format(col("summary_date"), "yyyy-MM-dd")).as[String].collect().toSeq
    assert(dates == Seq("2024-10-17", "2024-10-16"))
    val day = t
      .filter(date_format(col("summary_date"), "yyyy-MM-dd") === "2024-10-16" &&
        col("machine_id").isin("DieBonder_01"))
      .orderBy(asc("hour_of_day"))
      .select("hour_of_day").as[Int].collect().toSeq
    assert(day == Seq(22, 23))
  }

  test("dialect routing by URL: postgres gets ON CONFLICT, everything else the portable pair; miswires refuse") {
    assert(JdbcSinks.dialectFor("jdbc:postgresql://db-host/analytics") == JdbcSinks.PostgresUpsert)
    assert(JdbcSinks.dialectFor(url) == JdbcSinks.UpdateInsertUpsert) // Derby
    assert(JdbcSinks.dialectFor("jdbc:h2:mem:x") == JdbcSinks.UpdateInsertUpsert)
    // the upsert entrypoint refuses Postgres merge SQL on a non-Postgres
    // target BEFORE any connection is opened — the miswire StreamingMain
    // could previously have shipped (hardcoded PostgresUpsert) now fails
    // loudly instead of as a server-side syntax error mid-stream
    val ex = intercept[IllegalArgumentException] {
      JdbcSinks.upsert(summary, url, "summary_wrong_dialect",
        Seq("summary_date", "hour_of_day", "machine_id"), JdbcSinks.PostgresUpsert)
    }
    assert(ex.getMessage.contains("non-Postgres"))
  }

  test("postgres dialect renders ON CONFLICT DO UPDATE with EXCLUDED refs") {
    val sql = JdbcSinks.PostgresUpsert.sql("t", Seq("a", "b", "c"), Seq("a"))
    assert(sql.contains("ON CONFLICT (a) DO UPDATE SET b = EXCLUDED.b, c = EXCLUDED.c"))
    assert(sql.contains("INSERT INTO t (a, b, c)"))
  }

  // The Postgres path has no server in this harness, so its statement is
  // pinned byte-for-byte against a recorded golden. Bind order for this
  // dialect is the INSERT column list itself (schema field order): the
  // executor binds `?` 1..n in schema order, which is exactly the order
  // the column list renders in.
  test("postgres upsert SQL matches the recorded golden (summary-table shape)") {
    val sql = JdbcSinks.PostgresUpsert.sql("hourly_summary",
      Seq("summary_date", "hour_of_day", "machine_id",
        "cycle_count", "avg_cycle_time_seconds"),
      Seq("summary_date", "hour_of_day", "machine_id"))
    val golden =
      """INSERT INTO hourly_summary (summary_date, hour_of_day, machine_id, cycle_count, avg_cycle_time_seconds)
        |VALUES (?, ?, ?, ?, ?)
        |ON CONFLICT (summary_date, hour_of_day, machine_id) DO UPDATE SET cycle_count = EXCLUDED.cycle_count, avg_cycle_time_seconds = EXCLUDED.avg_cycle_time_seconds""".stripMargin
    assert(sql == golden)
    assert(sql.count(_ == '?') == 5)
  }

  test("update-insert upsert SQL pair matches the recorded goldens (bind: non-keys then keys)") {
    val (upd, ins) = JdbcSinks.UpdateInsertUpsert.sqlPair("hourly_summary",
      Seq("summary_date", "hour_of_day", "machine_id", "cycle_count"),
      Seq("summary_date", "hour_of_day", "machine_id"))
    assert(upd == "UPDATE hourly_summary SET cycle_count = ? " +
      "WHERE summary_date = ? AND hour_of_day = ? AND machine_id = ?")
    assert(ins == "INSERT INTO hourly_summary " +
      "(summary_date, hour_of_day, machine_id, cycle_count) VALUES (?, ?, ?, ?)")
  }
}
