package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.io.JdbcSinks
import graft.pipeline.DashboardMain

/** The headless dashboard data layer (`dashboard.py:26-66` shapes):
  * query semantics on an in-memory frame, and — PG_URL-guarded like
  * [[PostgresIntegrationSpec]] — the live S5 read path including
  * predicate pushdown into the JDBC scan.
  */
class DashboardSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def summaryFrame = Seq(
    (java.sql.Date.valueOf("2024-10-17"), 1, "DieBonder_02", 11L),
    (java.sql.Date.valueOf("2024-10-17"), 0, "DieBonder_01", 10L),
    (java.sql.Date.valueOf("2024-10-16"), 5, "DieBonder_01", 9L),
    (java.sql.Date.valueOf("2024-10-17"), 2, "DieBonder_03", 12L),
    (java.sql.Date.valueOf("2024-10-18"), 7, "DieBonder_01", 8L)
  ).toDF("summary_date", "hour_of_day", "machine_id", "cycle_count")

  test("availableDates: distinct dates, newest first (dashboard Q1)") {
    val got = DashboardMain.availableDates(summaryFrame)
      .as[java.sql.Date].collect().toSeq.map(_.toString)
    assert(got == Seq("2024-10-18", "2024-10-17", "2024-10-16"))
  }

  test("dayLoad: date filter, optional machine multiselect, hour-ordered (dashboard Q2)") {
    val all = DashboardMain.dayLoad(summaryFrame, "2024-10-17")
      .select("hour_of_day", "machine_id").as[(Int, String)].collect().toSeq
    assert(all == Seq((0, "DieBonder_01"), (1, "DieBonder_02"), (2, "DieBonder_03")))
    val picked = DashboardMain.dayLoad(summaryFrame, "2024-10-17",
        machines = Seq("DieBonder_01", "DieBonder_03"))
      .select("hour_of_day", "machine_id").as[(Int, String)].collect().toSeq
    assert(picked == Seq((0, "DieBonder_01"), (2, "DieBonder_03")))
  }

  test("dashboard queries run against live PostgreSQL with filters pushed into the scan") {
    val pgUrl = sys.env.get("PG_URL")
    assume(pgUrl.isDefined, "PG_URL not set — live-Postgres dashboard test skipped")
    val url = pgUrl.get
    val table = "graft_pg_dashboard_spec"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute(s"DROP TABLE IF EXISTS $table")
      st.execute(
        s"""CREATE TABLE $table (
           |  summary_date DATE NOT NULL, hour_of_day INT NOT NULL,
           |  machine_id VARCHAR(50) NOT NULL, cycle_count BIGINT,
           |  PRIMARY KEY (summary_date, hour_of_day, machine_id))""".stripMargin)
      st.close()
    } finally conn.close()
    JdbcSinks.upsert(summaryFrame, url, table,
      Seq("summary_date", "hour_of_day", "machine_id"), JdbcSinks.dialectFor(url))

    val live = JdbcSinks.read(spark, url, table)
    val dates = DashboardMain.availableDates(live)
      .as[java.sql.Date].collect().toSeq.map(_.toString)
    assert(dates == Seq("2024-10-18", "2024-10-17", "2024-10-16"))

    val day = DashboardMain.dayLoad(live, "2024-10-17", Seq("DieBonder_01", "DieBonder_03"))
    assert(day.select("hour_of_day", "machine_id").as[(Int, String)]
      .collect().toSeq == Seq((0, "DieBonder_01"), (2, "DieBonder_03")))
    // The date equality and machine isin must reach the database: at any
    // real table size only the selected day crosses the wire.
    val plan = day.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("summary_date"),
      s"expected JDBC pushdown in plan:\n$plan")

    val c2 = java.sql.DriverManager.getConnection(url)
    try c2.createStatement().execute(s"DROP TABLE $table") finally c2.close()
  }
}
